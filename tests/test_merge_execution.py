"""EXECUTED Iceberg-MERGE semantics (merge_apply.py): the generated
statements applied to an in-memory quad store must reproduce the
QuadSink contract — replace non-preserved graphs (default graph
included), set-append preserved graphs, and delta-MERGE old -> new.
Previously the statements were text-asserted only."""

from pyspark.sql import functions as F

from rdf_mapper_spark.merge_apply import apply_merge_statements
from rdf_mapper_spark.quads import quads_from_rows
from rdf_mapper_spark.sinks import IcebergMergeSink


def _q(g, s, o):
    return (g, "iri", s, "http://p/a", "literal", o, None, None)


def _set(df):
    return {tuple(r) for r in df.collect()}


def test_full_run_replaces_and_appends(spark):
    store = quads_from_rows(spark, [
        _q(None, "http://s/stale-default", "old"),
        _q("http://g/base", "http://s/stale-base", "old"),
        _q("http://g/add", "http://s/kept", "keep"),
        _q("http://g/untouched", "http://s/u", "u"),
    ])
    out = quads_from_rows(spark, [
        _q(None, "http://s/1", "x"),
        _q("http://g/base", "http://s/2", "y"),
        _q("http://g/add", "http://s/3", "z"),
        _q("http://g/add", "http://s/kept", "keep"),  # replayed quad
    ])
    sink = IcebergMergeSink("t", preserved_graphs={"http://g/add"})
    got = apply_merge_statements(sink.statements(out), store, out)
    expect = quads_from_rows(spark, [
        # default + base graphs REPLACED (stale rows gone)
        _q(None, "http://s/1", "x"),
        _q("http://g/base", "http://s/2", "y"),
        # preserved graph: set union (no duplicate of the replayed quad)
        _q("http://g/add", "http://s/kept", "keep"),
        _q("http://g/add", "http://s/3", "z"),
        # graphs the run did not output are untouched
        _q("http://g/untouched", "http://s/u", "u"),
    ])
    assert _set(got) == _set(expect)


def test_full_run_is_idempotent(spark):
    store = quads_from_rows(spark, [_q("http://g/x", "http://s/old", "o")])
    out = quads_from_rows(spark, [
        _q(None, "http://s/1", "x"), _q("http://g/x", "http://s/1", "y"),
    ])
    sink = IcebergMergeSink("t")
    once = apply_merge_statements(sink.statements(out), store, out)
    twice = apply_merge_statements(sink.statements(out), once, out)
    assert _set(once) == _set(twice) == _set(out)


def test_delta_merge_reaches_new_snapshot(spark):
    """old store + statements_for_delta(quad_delta(old, new)) == new —
    including a changed quad (same s/p, new o: one delete + one add in
    the same graph committing in ONE statement)."""
    from rdf_mapper_spark.pipeline.incremental import quad_delta

    old = quads_from_rows(spark, [
        _q(None, "http://s/1", "v1"),
        _q(None, "http://s/keep", "k"),
        _q("http://g/1", "http://s/2", "v2"),
    ])
    new = quads_from_rows(spark, [
        _q(None, "http://s/1", "v1b"),       # changed o
        _q(None, "http://s/keep", "k"),      # unchanged
        _q("http://g/1", "http://s/3", "v3"),  # s/2 dropped, s/3 added
    ])
    delta = quad_delta(old, new)
    stmts = IcebergMergeSink("t").statements_for_delta(delta)
    got = apply_merge_statements(stmts, old, delta)
    assert _set(got) == _set(new)
    # replaying the same delta is a no-op (adds match, deletes don't)
    again = apply_merge_statements(stmts, got, delta)
    assert _set(again) == _set(new)


def test_delta_merge_null_graph_and_quotes(spark):
    from rdf_mapper_spark.pipeline.incremental import quad_delta

    old = quads_from_rows(spark, [_q("http://g/o'brien", "http://s/1", "a")])
    new = quads_from_rows(spark, [_q("http://g/o'brien", "http://s/1", "b"),
                                  _q(None, "http://s/2", "c")])
    delta = quad_delta(old, new)
    stmts = IcebergMergeSink("t").statements_for_delta(delta)
    got = apply_merge_statements(stmts, old, delta)
    assert _set(got) == _set(new)
