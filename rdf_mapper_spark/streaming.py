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
