"""Incremental ingest: the compiled mapping applied per micro-batch.

The reference is a single-pass batch program ("TODO streaming version",
template_processor.py:22); Spark gets the streaming version for free: the
same compiled plan runs inside `foreachBatch`, appending quads to the
(graph-partitioned) sink. Because every IRI-minting path is deterministic
(hash/content-keyed; `now` pinned per run; `<uuid>` excluded), replaying a
micro-batch after failure is idempotent under quad dedup — exactly-once
semantics at the table level without transactional sinks.

Late data / watermarking do not apply to the mapping itself (row-local), but
`aggregate_quads_windowed` shows the canonical watermarked rollup for
downstream quad statistics.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.quads import dedup_quads
from rdf_mapper_spark.spec import MappingSpec


def stream_mapping(
    spec: MappingSpec,
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    file_name: str = "stream",
    trigger_available_now: bool = True,
    alias_map: dict[str, str] | None = None,
) -> StreamingQuery:
    """readStream -> compiled mapping per micro-batch -> append parquet quads.

    Intra-batch duplicates are absorbed per batch; global set semantics are
    restored by a periodic compaction (dedup_quads over the sink) or by an
    Iceberg MERGE in production.
    """
    engine = MapperEngine(spec, alias_map=alias_map)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        quads = engine.apply(batch_df, file_name=f"{file_name}-{batch_id}")
        quads.write.mode("append").parquet(out_path)

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_kg_pipeline(
    pages_stream: DataFrame,
    aliases: DataFrame,
    out_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """The full KG-construction flow as incremental ingest: each micro-batch
    of pages runs extract -> link -> natural-key triple emission ->
    canonical rewrite, appending to the quad sink.

    Canonicalization evidence (the sameAs alias table) is batch-side and
    broadcast, so the per-batch rewrite is identical to the batch
    pipeline's; page/link determinism (content-keyed IRIs) makes replays
    idempotent under downstream dedup/compaction. Connected components run
    on the dictionary, not the stream — per-batch output needs no global
    state."""
    from rdf_mapper_spark.pipeline.canonicalize import (
        canonical_mapping,
        rewrite_canonical,
        sameas_edges_from_aliases,
    )
    from rdf_mapper_spark.pipeline.extract import with_extracted_text
    from rdf_mapper_spark.pipeline.linking import link_entities
    from rdf_mapper_spark.pipeline.run import build_quads_split
    from rdf_mapper_spark.quads import union_quads

    mapping = canonical_mapping(sameas_edges_from_aliases(aliases))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = with_extracted_text(batch_df).select(
            "url", "warc_ts", F.col("extracted_text").alias("text"), "lang"
        ).persist()
        extracted.count()  # concurrent branches must hit a full cache
        links = link_entities(extracted, aliases)
        page_q, dyn_q = build_quads_split(extracted, links)
        out = union_quads(
            [page_q, dedup_quads(rewrite_canonical(dyn_q, mapping))]
        )
        out.write.mode("append").parquet(out_path)
        extracted.unpersist()

    writer = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_quad_dedup(quad_stream: DataFrame) -> DataFrame:
    """Cross-micro-batch RDF set semantics as a custom stateful operator.

    `applyInPandasWithState` keyed on the quad fingerprint keeps one boolean
    per distinct quad in the state store: the first occurrence is emitted,
    replays and later duplicates are suppressed — exactly-once quad
    emission across batches AND restarts (state is checkpointed).

    At scale the state store is RocksDB-backed and the key is a 128-bit
    fingerprint, so state size tracks distinct quads, not stream volume.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from rdf_mapper_spark.quads import QUAD_FIELDS

    fp = F.md5(F.concat_ws("\x1f", *[
        F.coalesce(F.col(c), F.lit("\x00")) for c in QUAD_FIELDS
    ]))
    keyed = quad_stream.withColumn("__fp", fp).groupBy("__fp")

    out_schema = ("g string, sk string, s string, p string, ok string, "
                  "o string, odt string, olg string")

    def emit_first(key, pdf_iter, state: GroupState):
        if state.exists:
            return iter(())
        state.update((True,))
        for pdf in pdf_iter:
            if len(pdf):
                yield pdf.iloc[:1][list(QUAD_FIELDS)]
                return

    return keyed.applyInPandasWithState(
        emit_first,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def aggregate_quads_windowed(
    quad_stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window quad counts per predicate — the standard
    late-data-tolerant streaming aggregation shape."""
    return (
        quad_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("p"))
        .agg(F.count(F.lit(1)).alias("n_quads"))
    )
