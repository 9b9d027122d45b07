"""QuadSink writer interface: parquet impl round-trip + Iceberg
MERGE-per-graph statement generation (text-level — no Iceberg runtime in
the sandbox).  Reference semantics: DROP GRAPH + INSERT for replaced
graphs, set-append for preserved @graphAdd graphs
(template_processor.py:72-97)."""

from rdf_mapper_spark.quads import quads_from_rows
from rdf_mapper_spark.sinks import IcebergMergeSink, ParquetGraphSink


def _quads(spark):
    return quads_from_rows(spark, [
        ("http://g/base", "iri", "http://s/1", "http://p/a", "literal",
         "x", None, None),
        ("http://g/add", "iri", "http://s/2", "http://p/a", "literal",
         "y", None, None),
        (None, "iri", "http://s/3", "http://p/a", "literal", "z",
         None, None),
    ])


def test_parquet_sink_round_trip(spark, tmp_path):
    q = _quads(spark)
    sink = ParquetGraphSink(str(tmp_path / "quads"))
    sink.write(q)
    back = spark.read.parquet(str(tmp_path / "quads"))
    assert back.count() == 3
    assert {r.g for r in back.select("g").collect()} == {
        "http://g/base", "http://g/add", None}


def test_iceberg_merge_statements(spark):
    q = _quads(spark)
    sink = IcebergMergeSink("cat.db.quads",
                            preserved_graphs={"http://g/add"})
    stmts = sink.statements(q)
    # one DELETE per non-preserved graph (default graph INCLUDED — a run
    # replaces every non-preserved graph it outputs), one MERGE per graph
    deletes = [s for s in stmts if s.startswith("DELETE")]
    merges = [s for s in stmts if s.startswith("MERGE")]
    assert len(merges) == 3
    assert deletes == [
        "DELETE FROM cat.db.quads WHERE t.g <=> NULL",
        "DELETE FROM cat.db.quads WHERE t.g <=> 'http://g/base'",
    ]
    # preserved graph: MERGE only (set-append), never dropped
    assert not any("'http://g/add'" in s for s in deletes)
    # preserving the default graph is opt-in via None in preserved_graphs
    stmts_pres = IcebergMergeSink(
        "cat.db.quads", preserved_graphs={"http://g/add", None}
    ).statements(q)
    assert [s for s in stmts_pres if s.startswith("DELETE")] == [
        "DELETE FROM cat.db.quads WHERE t.g <=> 'http://g/base'"
    ]
    add_merge = next(s for s in merges if "'http://g/add'" in s)
    assert "WHEN NOT MATCHED THEN INSERT *" in add_merge
    # full quad identity in the ON clause -> idempotent set semantics
    for c in ("t.sk <=> s.sk", "t.o <=> s.o", "t.odt <=> s.odt",
              "t.olg <=> s.olg"):
        assert c in add_merge
    # default graph handled with null-safe equality
    null_merge = next(s for s in merges if "g <=> NULL" in s)
    assert "WHERE g <=> NULL" in null_merge
    # statement order: replaced graph's DELETE precedes its MERGE
    base_del = stmts.index(deletes[0])
    base_merge = stmts.index(
        next(s for s in merges if "'http://g/base'" in s))
    assert base_del < base_merge


def test_iceberg_merge_quotes_graph_iris(spark):
    q = quads_from_rows(spark, [
        ("http://g/o'brien", "iri", "http://s/1", "http://p/a",
         "literal", "x", None, None),
    ])
    stmts = IcebergMergeSink("t").statements(q)
    assert any("'http://g/o''brien'" in s for s in stmts)


def test_iceberg_delta_merge_statements(spark):
    """Delta -> one MERGE per graph with matched-delete / unmatched-insert
    arms; graph pinned in ON for partition pruning."""
    from rdf_mapper_spark.pipeline.incremental import quad_delta
    from rdf_mapper_spark.quads import quads_from_rows

    def _q(g, s, o):
        return (g, "iri", s, "http://ex.com/p", "literal", o, None, None)

    old = quads_from_rows(spark, [_q(None, "s1", "v1"), _q("g1", "s2", "v2")])
    new = quads_from_rows(spark, [_q(None, "s1", "v1b"), _q("g1", "s3", "v3")])
    stmts = IcebergMergeSink("cat.db.quads").statements_for_delta(
        quad_delta(old, new))
    assert len(stmts) == 2  # one per graph (default + g1)
    for s in stmts:
        assert "WHEN MATCHED AND s.op = 'delete' THEN DELETE" in s
        assert "WHEN NOT MATCHED AND s.op = 'add' THEN INSERT" in s
        assert "MERGE INTO cat.db.quads" in s
    assert any("t.g <=> NULL" in s for s in stmts)
    assert any("t.g <=> 'g1'" in s for s in stmts)
    # op must not leak into the inserted columns
    assert all("INSERT (g, sk, s, p, ok, o, odt, olg)" in s for s in stmts)
