"""Deterministic sampling for training-mix construction.

`DataFrame.sample` draws from a per-partition RNG: membership changes
with partitioning, retries and resumes — unusable for a reproducible
training mix.  Here membership is a PURE FUNCTION of (id, seed): a
60-bit uniform is derived from md5(seed ':' id), so

  * re-runs, resumes and re-partitions keep the exact same sample;
  * nested rates compose (a 1% sample is a subset of a 10% sample with
    the same seed — the uniform does not change);
  * the same rule runs bit-identically in any engine with md5 (the
    DuckDB oracle checks membership, not just counts);
  * the filter is a pure projection the scan absorbs — no shuffle, no
    RNG state, trivially parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 60)


def sample_uniform(id_col: Column, seed: int = 0) -> Column:
    """Deterministic U[0,1) from (seed, id): first 60 bits of md5."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("double")
            / F.lit(_DENOM))


def deterministic_sample(docs: DataFrame, fraction: float, seed: int = 0,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff its (seed, id) uniform < fraction."""
    return docs.where(sample_uniform(F.col(id_col), seed) < fraction)


def stratified_sample(docs: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0, seed: int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-stratum rates (the training-mix weighting step): keep a row
    iff uniform(seed, id) < fractions[stratum].  Strata not listed get
    ``default_fraction``.  One CASE expression — the rate table is
    dictionary-sized by definition, so it lives in the plan, not in a
    join."""
    rate = None
    for key, frac in sorted(fractions.items()):
        cond = F.col(strata_col).eqNullSafe(F.lit(key))
        rate = (F.when(cond, F.lit(float(frac))) if rate is None
                else rate.when(cond, F.lit(float(frac))))
    rate = (rate.otherwise(F.lit(float(default_fraction)))
            if rate is not None else F.lit(float(default_fraction)))
    return docs.where(sample_uniform(F.col(id_col), seed) < rate)


def cap_per_key(docs: DataFrame, key_col: str, cap: int,
                order_col: str = "doc_id",
                n_salt: int = 16) -> DataFrame:
    """Frequency capping: keep at most `cap` documents per key (host,
    domain, source feed), deterministically the `cap` smallest by
    `order_col` — the per-domain quota every web-corpus recipe applies
    so one mega-site cannot dominate the training mix.

    Two-phase top-k so a hot key cannot pin a single task: phase one
    ranks within (key, salt-of-order) sub-windows and keeps `cap` per
    sub-window — a mega-host's rows split across `n_salt` tasks — so
    phase two's definitive per-key window sees at most n_salt * cap
    rows per key regardless of the key's true frequency.  Result is
    identical to the naive single window (the global cap-smallest
    survive both phases by transitivity of the per-subgroup rank).
    """
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salt))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(
        F.col(order_col).asc())
    pre = (docs.withColumn("__rn1", F.row_number().over(w1))
           .where(F.col("__rn1") <= cap).drop("__rn1"))
    w2 = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (pre.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= cap).drop("__rn"))
