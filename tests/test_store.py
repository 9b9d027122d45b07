"""Predicate-partitioned stored quad tables: round-trip + pruning."""

from pyspark.sql import functions as F

from rdf_mapper_spark.store import (
    read_quad_store,
    scan_files_for,
    write_quad_store,
)

QUAD_SCHEMA = ("g string, sk string, s string, p string, ok string, "
               "o string, odt string, olg string")


def _quads(spark):
    rows = []
    for i in range(40):
        rows.append((None, "iri", f"http://x/s{i}",
                     "http://x/def/type", "iri", "http://x/Doc",
                     None, None))
        rows.append(("http://g/1" if i % 2 else None, "iri",
                     f"http://x/s{i}", "http://x/def/name", "literal",
                     f"name{i}", None, None))
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def test_round_trip_preserves_quad_set_and_null_graph(spark, tmp_path):
    q = _quads(spark)
    path = str(tmp_path / "store")
    write_quad_store(q, path)
    back = read_quad_store(spark, path)
    orig = {tuple(r) for r in q.select(*sorted(q.columns)).collect()}
    got = {tuple(r) for r in back.select(*sorted(back.columns)).collect()}
    assert got == orig  # NULL g round-trips through the sentinel


def test_predicate_filter_prunes_partitions(spark, tmp_path):
    q = _quads(spark)
    path = str(tmp_path / "store")
    write_quad_store(q, path, files_per_partition=2)
    total = (scan_files_for(spark, path, "http://x/def/type")
             + scan_files_for(spark, path, "http://x/def/name"))
    # each predicate's scan touches ONLY its own directory's files
    pruned = scan_files_for(spark, path, "http://x/def/type")
    assert pruned <= 2
    assert total <= 4


def test_bgp_over_store_prunes_and_matches(spark, tmp_path):
    from rdf_mapper_spark.query import bgp_query

    q = _quads(spark)
    path = str(tmp_path / "store")
    write_quad_store(q, path)
    stored = read_quad_store(spark, path)
    out = bgp_query(stored, [
        ("?s", "http://x/def/type", "http://x/Doc"),
        ("?s", "http://x/def/name", "?n"),
    ]).collect()
    # default-graph only: odd i names live in http://g/1
    assert len(out) == 20
    assert all(r.n.startswith("name") for r in out)


def test_analyze_store_catalog_round_trip(spark, tmp_path):
    """ANALYZE sidecar: written once at store-maintenance time, read
    back as the cost-based planner's VoID catalog; missing sidecar ->
    None (heuristic fallback)."""
    from rdf_mapper_spark.query import bgp_query, order_patterns
    from rdf_mapper_spark.store import analyze_store, read_stats

    q = _quads(spark)
    path = str(tmp_path / "store")
    write_quad_store(q, path)
    assert read_stats(spark, path) is None      # never analyzed
    analyze_store(spark, path)
    cat = read_stats(spark, path)
    # 40 type triples (40 subjects, 1 object), 40 name triples
    assert cat["http://x/def/type"] == (40, 40, 1)
    assert cat["http://x/def/name"] == (40, 40, 40)

    # the catalog drives ordering: the name pattern (selective object)
    # goes before the type pattern (1 object -> no selectivity)
    pats = [("?s", "http://x/def/type", "http://x/Doc"),
            ("?s", "http://x/def/name", "name2")]
    assert order_patterns(pats, cat)[0][1] == "http://x/def/name"

    # and results are identical with/without the catalog
    stored = read_quad_store(spark, path)
    with_stats = {r.s for r in bgp_query(stored, pats, stats=cat)
                  .collect()}
    without = {r.s for r in bgp_query(stored, pats).collect()}
    assert with_stats == without == {"http://x/s2"}
