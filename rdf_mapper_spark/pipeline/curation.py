"""End-to-end corpus curation: the training-data preparation stage
composed from the individual operators, in the order a real pipeline
runs them.

    quality filter  ->  PII scrub  ->  exact dedup  ->  stratified sample

Order is load-bearing and each step strictly shrinks the data:

  * quality first — it is a pure projection the scan absorbs, so junk
    never reaches the (regex-heavy) scrub or any shuffle;
  * scrub before dedup — two documents differing only in their PII
    (mirror pages with different contact emails) ARE duplicates, so
    dedup must key on the CLEANED text;
  * dedup before sampling — otherwise the mix rates are distorted by
    duplication (a 1000x-duplicated page would be sampled 1000 times);
  * sampling last — membership is a pure (seed, id) function
    (ops/sampling.py), so the mix is reproducible no matter how the
    earlier stages were partitioned or resumed.

Plan shape: one scan-absorbed projection chain (quality + scrub), ONE
shuffle (the dedup groupBy on the content hash), one more projection
(sample filter).  At 100 TB this is a single map-reduce pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_mapper_spark.ops.sampling import sample_uniform
from rdf_mapper_spark.ops.text import quality_reasons, redact_pii


def curate_corpus(docs: DataFrame, fractions: dict[str, float],
                  default_fraction: float = 0.0, seed: int = 0,
                  text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang",
                  pairs_fn=None) -> DataFrame:
    """-> (doc_id, lang, clean_text) — the curated training corpus.

    Dedup survivor is the MIN id per cleaned-text hash (deterministic,
    resume-stable); the survivor — not an arbitrary member — is what the
    sample rate then applies to.

    ``pairs_fn``, when given, inserts a NEAR-dup stage between exact
    dedup and sampling: it receives the exact-deduped frame
    (id, lang, clean_text) and must return (id_a, id_b) near-dup pairs —
    e.g. ``lambda d: minhash_lsh_pairs(d, text_col="clean_text")`` or a
    simhash/winnow variant.  Pairs are closed into connected components
    and the survivor is again the MIN id per component (the same rule as
    the exact stage, so the composition stays deterministic); dropped
    ids are removed with a left-anti join whose build side is bounded by
    the near-dup rate, not the corpus (AQE broadcasts it when small).
    The exact-deduped frame is localCheckpointed (eager) because the
    pair operator and the final output both consume it — lineage-
    truncating, and the blocks free themselves when the frame is
    garbage-collected, unlike a persist that would accumulate in the
    cache manager across calls; at production scale the checkpointing
    stage (pipeline/checkpoint.py) replaces it with a durable write."""
    from pyspark.sql import Window

    kept = docs.where(
        quality_reasons(F.col(text_col), lang_col=F.col(lang_col)) == "")
    scrubbed = kept.select(
        F.col(id_col), F.col(lang_col),
        redact_pii(F.col(text_col)).alias("clean_text"),
    )
    # survivor via row_number over the content-hash window: ONE exchange
    # keyed by the fp, no join-back (a groupBy-min + semi-join costs a
    # second corpus-wide shuffle for identical semantics)
    w = Window.partitionBy(F.md5("clean_text")).orderBy(
        F.col(id_col).asc())
    deduped = (scrubbed.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
    if pairs_fn is not None:
        from rdf_mapper_spark.pipeline.canonicalize import (
            connected_components,
        )

        # respread before materializing: AQE coalesces the dedup-window
        # exchange by BYTES, but the near-dup stage's per-row cost
        # (shingle chains, minhash signatures) is orders of magnitude
        # above a byte-proportional estimate — a bytes-tiny survivor set
        # would otherwise funnel the whole signature computation through
        # 1-4 tasks
        dp = deduped.sparkSession.sparkContext.defaultParallelism
        deduped = deduped.repartition(dp).localCheckpoint(eager=True)
        pairs = pairs_fn(deduped)
        edges = pairs.select(F.col("id_a").alias("src"),
                             F.col("id_b").alias("dst"))
        comp = connected_components(edges)
        # comp = min id of each component (canonicalize's label rule), so
        # "node != comp" is exactly the non-survivor set
        drops = comp.where(F.col("node") != F.col("comp")).select(
            F.col("node").alias(id_col))
        deduped = deduped.join(drops, id_col, "left_anti")
    rate = None
    for key, frac in sorted(fractions.items()):
        cond = F.col(lang_col).eqNullSafe(F.lit(key))
        rate = (F.when(cond, F.lit(float(frac))) if rate is None
                else rate.when(cond, F.lit(float(frac))))
    rate = (rate.otherwise(F.lit(float(default_fraction)))
            if rate is not None else F.lit(float(default_fraction)))
    return deduped.where(sample_uniform(F.col(id_col), seed) < rate)
