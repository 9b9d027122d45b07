"""Incremental KG maintenance: set-semantics deltas between snapshot quad
sets, feeding the SPARQL update/delete sinks.

The reference's update path re-emits the *whole* graph per run and relies on
`DROP GRAPH` + re-insert in the generated SPARQL script
(`/root/reference/src/rdf_mapper/lib/template_processor.py:72-97` routes every
quad through per-graph buckets; the script writer drops and rebuilds).  At
10^12-document scale a full rebuild per crawl snapshot is not viable: a new
Common-Crawl snapshot changes a small fraction of pages, so the engine must
compute `adds = new − old` and `deletes = old − new` and ship only the delta.

`quad_delta` does that in ONE shuffle: tag each side, union, groupBy the full
quad key with two boolean max-flags (map-side partial aggregation applies, so
each side's duplicates collapse before the exchange), keep rows present on
exactly one side.  This beats two `EXCEPT` passes (two shuffles + two scans
of each input) and is skew-safe under AQE because the key is the whole quad —
a hot (s,p) pair still fans out across buckets by object.

At rest, pairing this with an Iceberg table sorted/bucketed on (g, s, p)
makes the delta a co-located sort-merge diff with no exchange at all; the
`IcebergMergeSink` (sinks interface) turns the delta into MERGE statements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_mapper_spark.quads import QUAD_FIELDS


def quad_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """-> (op: 'add'|'delete', g, sk, s, p, ok, o, odt, olg).

    Set semantics on both sides (duplicates within a snapshot are
    collapsed by the groupBy itself — no separate distinct pass needed).
    """
    tagged = (
        old.select(*QUAD_FIELDS).withColumn("__src", F.lit(1))
        .unionByName(new.select(*QUAD_FIELDS).withColumn("__src", F.lit(2)))
    )
    agg = tagged.groupBy(*QUAD_FIELDS).agg(
        F.max(F.col("__src") == 1).alias("__in_old"),
        F.max(F.col("__src") == 2).alias("__in_new"),
    )
    return agg.where(F.col("__in_old") != F.col("__in_new")).select(
        F.when(F.col("__in_new"), F.lit("add"))
        .otherwise(F.lit("delete")).alias("op"),
        *QUAD_FIELDS,
    )


def apply_delta(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Materialize `base + delta` (for tests / parquet checkpoints without a
    MERGE-capable table format).  Adds are unioned in; deletes are removed
    via a single left-anti join on the full quad key."""
    dels = delta.where(F.col("op") == "delete").select(
        *[F.col(f).alias(f"__d_{f}") for f in QUAD_FIELDS]
    )
    adds = delta.where(F.col("op") == "add").select(*QUAD_FIELDS)
    base = base.select(*QUAD_FIELDS)
    # null-safe equality on every field: g/odt/olg are NULL for default
    # graph / plain literals, and NULL = NULL is NULL under plain EqualTo —
    # a name-list anti join would silently never delete those quads
    cond = None
    for f in QUAD_FIELDS:
        c = base[f].eqNullSafe(F.col(f"__d_{f}"))
        cond = c if cond is None else (cond & c)
    kept = base.join(dels, on=cond, how="left_anti")
    return kept.unionByName(adds)
