"""Skew handling: salted dedup equals plain dedup on a hot-key quad set."""

from pyspark.sql import functions as F

from rdf_mapper_spark.quads import dedup_quads, quad_schema


def test_salted_dedup_equivalence_under_skew(spark):
    # one quad repeated 50k times (hot subject/predicate) + a uniform tail
    hot = spark.range(50_000).select(
        F.lit(None).cast("string").alias("g"),
        F.lit("iri").alias("sk"),
        F.lit("http://x/hot").alias("s"),
        F.lit("http://x/p").alias("p"),
        F.lit("literal").alias("ok"),
        F.lit("same").alias("o"),
        F.lit(None).cast("string").alias("odt"),
        F.lit(None).cast("string").alias("olg"),
    )
    tail = spark.range(1_000).select(
        F.lit(None).cast("string").alias("g"),
        F.lit("iri").alias("sk"),
        F.concat(F.lit("http://x/s"), F.col("id")).alias("s"),
        F.lit("http://x/p").alias("p"),
        F.lit("literal").alias("ok"),
        F.col("id").cast("string").alias("o"),
        F.lit(None).cast("string").alias("odt"),
        F.lit(None).cast("string").alias("olg"),
    )
    quads = hot.unionByName(tail).repartition(8)
    plain = dedup_quads(quads, salt=0)
    salted = dedup_quads(quads, salt=16)
    assert plain.count() == 1001
    assert salted.count() == 1001
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))
