"""Structured-Streaming ingest: the compiled mapping per micro-batch."""

from pyspark.sql import functions as F

from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.streaming import stateful_quad_dedup, stream_mapping


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


def test_stateful_quad_dedup_across_restarts(spark, tmp_path):
    """The applyInPandasWithState dedup suppresses duplicates across
    micro-batches AND across query restarts (state store persistence)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "g string, sk string, s string, p string, ok string, " \
             "o string, odt string, olg string"

    def quad_row(i):
        return (None, "iri", f"http://x/{i}", "http://x/p", "literal",
                f"v{i}", None, None)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stateful_quad_dedup(stream)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    batch1 = [quad_row(i) for i in range(5)] + [quad_row(0), quad_row(1)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append") \
        .parquet(src)
    run_once()
    assert spark.read.parquet(out).count() == 5  # intra-batch dups absorbed

    # second file: 3 replays + 2 new quads; restart restores state
    batch2 = [quad_row(0), quad_row(2), quad_row(4), quad_row(7), quad_row(8)]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append") \
        .parquet(src)
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == 7  # 5 + only the 2 genuinely new quads
    assert result.select("s").distinct().count() == 7


def test_stream_kg_pipeline_matches_batch(spark, tmp_path):
    """Streaming ingest of the full KG flow: two micro-batches of pages must
    produce (after compaction-dedup) the same quad set as one batch run."""
    from pyspark.sql import functions as F

    from rdf_mapper_spark.pipeline.datagen import make_alias_dict, make_pages
    from rdf_mapper_spark.pipeline.run import run_pipeline
    from rdf_mapper_spark.quads import dedup_quads
    from rdf_mapper_spark.streaming import stream_kg_pipeline

    pages_dir = str(tmp_path / "pages")
    make_pages(spark, 200, n_entities=30).repartition(2).write.parquet(
        pages_dir
    )
    aliases = make_alias_dict(spark, 30)

    out = str(tmp_path / "quads")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(spark.read.parquet(pages_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    q = stream_kg_pipeline(stream, aliases, out, ck)
    q.awaitTermination(300)

    streamed = dedup_quads(spark.read.parquet(out))
    batch = run_pipeline(spark, spark.read.parquet(pages_dir), aliases,
                         workdir=None, materialize=False)
    assert streamed.count() == batch["triples"]
    # replay the whole stream into the same sink: dedup absorbs everything
    q2 = stream_kg_pipeline(
        spark.readStream.schema(spark.read.parquet(pages_dir).schema)
        .parquet(pages_dir),
        aliases, out, str(tmp_path / "ck2"),
    )
    q2.awaitTermination(300)
    assert dedup_quads(spark.read.parquet(out)).count() == batch["triples"]
