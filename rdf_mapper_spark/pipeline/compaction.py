"""Quad-store compaction: the maintenance job behind the streaming sink.

`stream_kg_pipeline` / `stream_mapping` append per micro-batch, so the
store accumulates (a) small files — one-or-more per batch per partition —
and (b) duplicate quads from replays (idempotence is guaranteed by
deterministic IRIs + downstream dedup, not by the append itself).
Compaction rewrites the store as the canonical form the batch pipeline
produces: salted set-dedup, graph-partitioned layout, bounded file count.

On Iceberg this maps to `rewrite_data_files` + the MERGE sink's set
semantics; here the parquet form keeps the same contract testable.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapper_spark.quads import QUAD_FIELDS, dedup_quads
from rdf_mapper_spark.sinks import write_graph_tables


def compact_quads(spark: SparkSession, in_path: str, out_path: str,
                  salt: int = 0,
                  files_per_graph: Optional[int] = None) -> dict:
    """Rewrite an appended quad store deduped + graph-partitioned.

    ``files_per_graph`` coalesces each graph's output (repartition by g
    plus intra-key spread) — at crawl scale pick it from target file size
    (e.g. total_bytes / graphs / 512 MB); None leaves AQE's coalescing in
    charge. Returns before/after file and quad counts so operators can
    alert on compaction ratio.
    """
    quads = spark.read.parquet(in_path)
    files_in = len(quads.inputFiles())
    quads_in = quads.count()
    out: DataFrame = dedup_quads(quads, salt=salt)
    if files_per_graph is not None:
        # spread each graph across ~files_per_graph tasks: repartition on
        # (g, content-hash bucket) — plain repartition(n, "g") would put a
        # whole graph in ONE task, capping files per graph at 1 and
        # serializing the biggest graph's write
        spread = F.pmod(
            F.xxhash64(*[F.coalesce(F.col(c), F.lit("\x00"))
                         for c in QUAD_FIELDS]),
            F.lit(files_per_graph),
        )
        out = (out.withColumn("__spread", spread)
               .repartition("g", "__spread").drop("__spread"))
    write_graph_tables(out, out_path)
    result = spark.read.parquet(out_path)
    return {
        "files_in": files_in,
        "files_out": len(result.inputFiles()),
        "quads_in": quads_in,
        "quads_out": result.count(),
    }
