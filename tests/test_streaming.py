"""Structured-Streaming ingest: the compiled mapping per micro-batch."""

from pyspark.sql import functions as F

from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.streaming import stream_mapping


def test_stream_mapping_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "quads")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    ).write.parquet(src)

    spec = MappingSpec({
        "globals": {"$datasetBase": "http://example.org/kg"},
        "resources": [{
            "name": "doc",
            "properties": {
                "@id": "<http://example.org/kg/data/doc/{doc_id}>",
                "<{$datasetBase}/def/text>": "{text}",
            },
        }],
    }, auto_declare=False)

    stream_df = spark.readStream.schema("doc_id long, text string").parquet(src)
    query = stream_mapping(spec, stream_df, out, ckpt)
    query.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert got.where(F.col("p") == "http://example.org/kg/def/text").count() == 20
