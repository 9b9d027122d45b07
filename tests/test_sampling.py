"""Deterministic sampling (ops/sampling.py): membership is a pure
function of (seed, id) — the properties DataFrame.sample cannot give."""

from pyspark.sql import functions as F

from rdf_mapper_spark.ops.sampling import (
    deterministic_sample,
    stratified_sample,
)


def _docs(spark, n=2000, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("fr"), F.lit("de"),
                             F.lit("es")),
                     (F.col("id") % 4 + 1).cast("int")).alias("lang"),
    )


def test_partition_invariance_and_determinism(spark):
    d = _docs(spark, parts=4)
    a = {r.doc_id for r in deterministic_sample(d, 0.3, seed=1).collect()}
    b = {r.doc_id for r in
         deterministic_sample(d.repartition(13), 0.3, seed=1).collect()}
    assert a == b and a  # same membership under any partitioning


def test_nested_rates_compose(spark):
    d = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(d, 0.05, seed=2).collect()}
    big = {r.doc_id for r in deterministic_sample(d, 0.25, seed=2).collect()}
    assert small <= big  # a 5% sample is a subset of the 25% sample


def test_rates_approximately_honored(spark):
    d = _docs(spark, n=4000)
    got = deterministic_sample(d, 0.2, seed=3).count()
    assert abs(got / 4000 - 0.2) < 0.03


def test_stratified_rates_per_stratum(spark):
    d = _docs(spark, n=4000)
    out = (stratified_sample(d, "lang", {"en": 0.9, "fr": 0.1},
                             default_fraction=0.0, seed=4)
           .groupBy("lang").count().collect())
    counts = {r.lang: r["count"] for r in out}
    assert abs(counts["en"] / 1000 - 0.9) < 0.06
    assert abs(counts.get("fr", 0) / 1000 - 0.1) < 0.06
    assert "de" not in counts and "es" not in counts  # default 0.0


def test_sample_is_scan_absorbed(spark):
    d = _docs(spark)
    plan = (deterministic_sample(d, 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_curate_corpus_scrub_before_dedup(spark):
    """Mirror pages differing only in contact email must dedup to ONE
    survivor (min id) — only possible because the scrub runs first."""
    from rdf_mapper_spark.pipeline.curation import curate_corpus

    body = ("the curious researchers examined the ancient library and the "
            "students gathered around the wooden tables to discuss the "
            "findings of the expedition in the quiet evening")
    rows = [
        (1, "en", body + " contact a@x.io"),
        (2, "en", body + " contact b@y.org"),   # mirror of 1 modulo email
        (3, "en", body + " extra unique closing words for doc three here"),
        (4, "en", "too short junk"),            # fails quality
    ]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = curate_corpus(d, {"en": 1.0}, seed=7)
    got = {r.doc_id: r.clean_text for r in out.collect()}
    assert set(got) == {1, 3}            # 2 deduped into 1, 4 dropped
    assert "<EMAIL>" in got[1] and "a@x.io" not in got[1]


def test_curate_corpus_neardup_stage(spark):
    """pairs_fn= inserts near-dup clustering between exact dedup and
    sampling: variant docs (same body, one differing token) survive exact
    dedup as distinct texts but collapse to the min-id survivor of their
    component; unrelated docs are untouched."""
    from rdf_mapper_spark.ops.dedup import minhash_lsh_pairs
    from rdf_mapper_spark.pipeline.curation import curate_corpus

    body = ("the curious researchers examined the ancient library and the "
            "students gathered around the wooden tables to discuss the "
            "findings of the expedition in the quiet evening")
    other = ("a completely different report about municipal water systems "
             "and the seasonal maintenance of pumping stations across the "
             "northern districts during the early spring inspections")
    rows = [
        (1, "en", body + " variant one"),
        (2, "en", body + " variant two"),      # near-dup of 1
        (3, "en", body + " variant three"),    # near-dup of 1 and 2
        (5, "en", other),
        (6, "en", other),                      # EXACT dup of 5
    ]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = curate_corpus(
        d, {"en": 1.0}, seed=7,
        pairs_fn=lambda dd: minhash_lsh_pairs(
            dd, num_hashes=16, bands=4, n=2,
            text_col="clean_text", verify_threshold=0.5))
    got = sorted(r.doc_id for r in out.collect())
    # exact stage: 6 -> 5; near-dup stage: {1,2,3} -> 1
    assert got == [1, 5]
    # without the stage, the variants all survive
    base = sorted(r.doc_id for r in curate_corpus(d, {"en": 1.0}, seed=7)
                  .collect())
    assert base == [1, 2, 3, 5]
