"""Entity canonicalization: connected components + canonical rewriting.

The reference deduplicates entities only via its exact-match reconciliation
cache (template_state.py:71-78); the north rule generalizes that to
connected-components-style clustering over sameAs evidence (IRIs sharing an
alias, near-duplicate keys, ...) with explicit skew handling.

`connected_components` is iterative min-label propagation with pointer
jumping (doubling), O(log d) rounds of shuffles, per-round checkpointing to
cut lineage — the standard scalable formulation (cf. the large-star/
small-star family). Labels are the node strings themselves, so the canonical
representative is the lexicographic minimum and no surrogate-id collision
handling is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 15,
                         checkpoint: bool = True,
                         driver_threshold: int = 100_000) -> DataFrame:
    """edges(src,dst) -> (node, component=min reachable node string).

    Hybrid execution: an edge set under ``driver_threshold`` is collected
    and solved with union-find on the driver (zero shuffle rounds — the
    common case for alias/sameAs evidence, whose size tracks the entity
    dictionary, not the corpus). Larger graphs run the distributed loop:
    min-label propagation + one pointer-jumping join per round, O(log d)
    rounds, per-round checkpointing to cut lineage.

    The default threshold is deliberately conservative (100k edge rows ≈
    a few MB on the driver): callers passing corpus-derived edge sets fall
    straight onto the distributed path instead of OOM-ing the driver; raise
    it explicitly when the evidence is known to be dictionary-sized.
    """
    spark = edges.sparkSession
    if driver_threshold > 0:
        # materialize BEFORE the limit-collect probe: executeTake runs
        # the plan over 1, then 4, 16, ... partitions until the limit is
        # satisfied, and an under-threshold edge set never satisfies it —
        # an expensive edges plan (e.g. a cosine/minhash candidate join)
        # was being re-executed 4-5x per call.  One eager checkpoint
        # computes it once; the probe jobs then scan stored partitions.
        # The distributed path below reuses the same materialization for
        # its src/dst double-scan.
        edges = edges.localCheckpoint(eager=True)
        sample = edges.limit(driver_threshold + 1).collect()
        if len(sample) <= driver_threshold:
            return _driver_union_find(spark, sample,
                                      edges.schema["src"].dataType)
    bidir = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = bidir.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("comp", F.col("node"))
    if checkpoint:
        bidir = bidir.localCheckpoint()
        labels = labels.localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, bidir["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "comp")
            .groupBy("node").agg(F.min("comp").alias("ncomp"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer jumping: comp <- comp's comp
        l2 = updated.select(F.col("node").alias("pnode"),
                            F.col("comp").alias("pcomp"))
        jumped = (
            updated.join(l2, updated["comp"] == l2["pnode"], "left")
            .select(
                "node",
                F.coalesce(F.col("pcomp"), F.col("comp")).alias("comp"),
            )
        )
        if checkpoint:
            jumped = jumped.localCheckpoint()
        changed = (
            jumped.alias("a").join(labels.alias("b"), "node")
            .where(F.col("a.comp") != F.col("b.comp")).limit(1).count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def _driver_union_find(spark, edge_rows, node_type=None) -> DataFrame:
    """Union-find on the driver; node/comp keep the EDGE COLUMN TYPE so
    min semantics match the distributed path (numeric min for numeric ids,
    lexicographic for strings)."""
    from pyspark.sql.types import StringType, StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    nt = node_type or StringType()
    schema = StructType([StructField("node", nt), StructField("comp", nt)])
    # JVM literal/Arrow relation: the mapping is broadcast by every
    # consumer (rewrite joins, dedup anti-joins) and a python-parallelized
    # frame pays a Python worker round-trip per partition per scan
    from rdf_mapper_spark.localrel import local_df

    return local_df(spark, rows, schema)


def sameas_edges_from_aliases(aliases: DataFrame) -> DataFrame:
    """IRIs sharing a surface form are sameAs candidates -> edges."""
    a = aliases.select("alias", F.col("entity_iri").alias("src"))
    b = aliases.select("alias", F.col("entity_iri").alias("dst"))
    return (
        a.join(b, "alias")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def canonical_mapping(edges: DataFrame, max_iter: int = 15) -> DataFrame:
    """-> (iri, canonical) for non-trivial clusters only (iri != canonical)."""
    comp = connected_components(edges, max_iter=max_iter)
    return comp.where(F.col("node") != F.col("comp")).select(
        F.col("node").alias("iri"), F.col("comp").alias("canonical")
    )


def rewrite_canonical(quads: DataFrame, mapping: DataFrame,
                      broadcast_mapping: bool = True) -> DataFrame:
    """Rewrite subject/object IRIs to their canonical representatives.

    The mapping is usually small relative to the quad set (only non-trivial
    clusters) -> broadcast both joins; with a huge mapping pass
    broadcast_mapping=False and AQE skew-join splits hot canonical IRIs.
    """
    m = mapping
    if broadcast_mapping:
        m = F.broadcast(mapping)
    ms = m.select(F.col("iri").alias("__si"), F.col("canonical").alias("__sc"))
    mo = m.select(F.col("iri").alias("__oi"), F.col("canonical").alias("__oc"))
    out = (
        quads.join(ms, quads["s"] == ms["__si"], "left")
        .withColumn("s", F.coalesce(F.col("__sc"), F.col("s")))
        .drop("__si", "__sc")
    )
    out = (
        out.join(mo, (out["o"] == mo["__oi"]) & (out["ok"] == "iri"), "left")
        .withColumn("o", F.coalesce(F.col("__oc"), F.col("o")))
        .drop("__oi", "__oc")
    )
    return out
