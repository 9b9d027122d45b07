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
