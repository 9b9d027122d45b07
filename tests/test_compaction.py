"""Quad-store compaction: streamed appends (replays + small files) ->
canonical deduped graph-partitioned store."""

from rdf_mapper_spark.pipeline.compaction import compact_quads
from rdf_mapper_spark.quads import QUAD_FIELDS


def _quadset(df):
    return {tuple(r) for r in df.select(*QUAD_FIELDS).collect()}


def test_compaction_dedups_and_shrinks_files(spark, tmp_path):
    from rdf_mapper_spark.pipeline.datagen import make_alias_dict, make_pages
    from rdf_mapper_spark.pipeline.run import run_pipeline
    from rdf_mapper_spark.streaming import stream_kg_pipeline

    pages_dir = str(tmp_path / "pages")
    make_pages(spark, 150, n_entities=20).repartition(2).write.parquet(
        pages_dir)
    aliases = make_alias_dict(spark, 20)
    schema = spark.read.parquet(pages_dir).schema

    out = str(tmp_path / "stream_out")
    # two full runs (second = replay) in 2-file micro-batches: duplicates
    # AND small-file buildup
    for i in range(2):
        q = stream_kg_pipeline(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(pages_dir),
            aliases, out, str(tmp_path / f"ck{i}"),
        )
        q.awaitTermination(300)

    compacted = str(tmp_path / "compacted")
    m = compact_quads(spark, out, compacted, files_per_graph=1)
    assert m["quads_out"] < m["quads_in"]          # replay dups removed
    assert m["files_out"] < m["files_in"]          # small files merged
    batch = run_pipeline(spark, spark.read.parquet(pages_dir), aliases,
                         workdir=str(tmp_path / "w"), materialize=True)
    want = spark.read.parquet(str(tmp_path / "w") + "/graph_tables")
    assert m["quads_out"] == batch["triples"]
    assert _quadset(spark.read.parquet(compacted)) == _quadset(want)
