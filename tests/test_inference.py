"""RDFS materialization + sameAs smushing: differential vs a brute-force
Python fixpoint evaluator, plan shape, and the distributed-closure
escape hatch."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from rdf_mapper_spark.inference import (
    DOMAIN,
    OWL_SAMEAS,
    RANGE,
    RDF_TYPE,
    SUBCLASS,
    SUBPROP,
    _distributed_closure,
    _driver_closure,
    rdfs_materialize,
    sameas_resolve,
)

COLS = "g string, sk string, s string, p string, ok string, o string, " \
       "odt string, olg string"


def _quads(spark, triples):
    """triples: (s, p, o, ok) -> quad rows in the default graph."""
    rows = [(None, "iri", s, p, ok, o, None, None)
            for s, p, o, ok in triples]
    return spark.createDataFrame(rows, COLS)


def _brute_rdfs(triples):
    """Naive fixpoint over (s, p, o, ok) tuples — the oracle."""
    facts = set(triples)
    while True:
        new = set()
        sp = {(s, o) for s, p, o, _ in facts if p == SUBPROP}
        sc = {(s, o) for s, p, o, _ in facts if p == SUBCLASS}
        dom = {(s, o) for s, p, o, _ in facts if p == DOMAIN}
        rng = {(s, o) for s, p, o, _ in facts if p == RANGE}
        for a, b in sp:          # rdfs5: subPropertyOf transitivity
            for c, d in sp:
                if b == c and a != d:
                    new.add((a, SUBPROP, d, "iri"))
        for a, b in sc:          # rdfs11: subClassOf transitivity
            for c, d in sc:
                if b == c and a != d:
                    new.add((a, SUBCLASS, d, "iri"))
        for s, p, o, ok in facts:
            for sub, sup in sp:
                if p == sub:
                    new.add((s, sup, o, ok))
            for dp, dc in dom:
                if p == dp:
                    new.add((s, RDF_TYPE, dc, "iri"))
            for rp, rc in rng:
                if p == rp and ok == "iri":
                    new.add((o, RDF_TYPE, rc, "iri"))
            if p == RDF_TYPE:
                for sub, sup in sc:
                    if o == sub:
                        new.add((s, RDF_TYPE, sup, "iri"))
        if new <= facts:
            return facts
        facts |= new


TBOX = [
    ("C0", SUBCLASS, "C1", "iri"),
    ("C1", SUBCLASS, "C2", "iri"),
    ("C2", SUBCLASS, "C3", "iri"),
    ("pS", SUBPROP, "pM", "iri"),
    ("pM", SUBPROP, "pG", "iri"),
    ("pS", DOMAIN, "C0", "iri"),
    ("pM", RANGE, "C2", "iri"),
]
ABOX = [
    ("a", RDF_TYPE, "C0", "iri"),
    ("b", RDF_TYPE, "C2", "iri"),
    ("a", "pS", "b", "iri"),
    ("b", "pM", "lit", "literal"),     # literal object: no range typing
    ("c", "pG", "d", "iri"),           # top property: nothing fires
]


def test_rdfs_matches_brute_force(spark):
    out = rdfs_materialize(_quads(spark, TBOX + ABOX))
    got = {(r["s"], r["p"], r["o"], r["ok"]) for r in out.collect()}
    want = _brute_rdfs(set(TBOX + ABOX))
    assert got == want
    # spot-check the stratification actually chained: domain of pS types
    # a as C0, then subClassOf closure lifts it to C3
    assert ("a", RDF_TYPE, "C3", "iri") in got
    # subPropertyOf closure is transitive: pS -> pG in one pass
    assert ("a", "pG", "b", "iri") in got
    # range skips literals
    assert ("lit", RDF_TYPE, "C2", "iri") not in got


def test_rdfs_inferred_only_and_idempotent(spark):
    full = rdfs_materialize(_quads(spark, TBOX + ABOX))
    inf = rdfs_materialize(_quads(spark, TBOX + ABOX),
                           include_asserted=False)
    got_full = {tuple(r) for r in full.collect()}
    got_inf = {tuple(r) for r in inf.collect()}
    assert got_inf <= got_full
    # materializing the materialization adds nothing (fixpoint reached)
    again = rdfs_materialize(full)
    assert {tuple(r) for r in again.collect()} == got_full


def test_rdfs_plan_small_tbox_joinless(spark):
    # dictionary-sized rule tables compile to literal-map explodes: the
    # ABox is never joined at all, let alone shuffled
    out = rdfs_materialize(_quads(spark, TBOX + ABOX))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_rdfs_plan_large_tbox_broadcasts(spark, monkeypatch):
    # past _INLINE_RULE_MAX the rules fall back to broadcast joins —
    # never a shuffle of the ABox
    import rdf_mapper_spark.inference as inf_mod

    monkeypatch.setattr(inf_mod, "_INLINE_RULE_MAX", 0)
    out = rdfs_materialize(_quads(spark, TBOX + ABOX))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_rdfs_inline_matches_broadcast(spark, monkeypatch):
    # both rule compilations produce the identical entailed set
    import rdf_mapper_spark.inference as inf_mod

    inline = {tuple(r) for r in
              rdfs_materialize(_quads(spark, TBOX + ABOX)).collect()}
    monkeypatch.setattr(inf_mod, "_INLINE_RULE_MAX", 0)
    joined = {tuple(r) for r in
              rdfs_materialize(_quads(spark, TBOX + ABOX)).collect()}
    assert inline == joined


def test_driver_closure_cycle_safe():
    # cycles terminate and exclude reflexive pairs
    got = _driver_closure([("A", "B"), ("B", "C"), ("C", "A")])
    assert ("A", "A") not in got
    assert ("A", "C") in got and ("C", "B") in got


def test_distributed_closure_matches_driver(spark):
    pairs = [(f"N{i}", f"N{i + 1}") for i in range(6)] + [("X", "N3")]
    edges = spark.createDataFrame(pairs, "sub string, sup string")
    got = {(r["sub"], r["sup"])
           for r in _distributed_closure(edges).collect()}
    want = set(_driver_closure(pairs)) | set(pairs)
    assert got == want


def test_sameas_resolve(spark):
    triples = [
        ("B", OWL_SAMEAS, "A", "iri"),
        ("C", OWL_SAMEAS, "B", "iri"),      # chain: C -> B -> A
        ("C", "name", "carol", "literal"),
        ("B", "age", "7", "literal"),
        ("Z", "knows", "C", "iri"),
        ("Z", "label", "A", "literal"),     # literal 'A' must NOT rewrite
        ("Q", "name", "solo", "literal"),   # untouched entity
    ]
    out = sameas_resolve(_quads(spark, triples))
    got = {(r["s"], r["p"], r["o"]) for r in out.collect()}
    assert got == {
        ("A", "name", "carol"),
        ("A", "age", "7"),
        ("Z", "knows", "A"),
        ("Z", "label", "A"),
        ("Q", "name", "solo"),
    }
    # no sameAs links survive
    assert not any(p == OWL_SAMEAS for _, p, _ in got)


def test_sameas_keep_links_and_plan(spark):
    triples = [
        ("B", OWL_SAMEAS, "A", "iri"),
        ("B", "name", "bee", "literal"),
    ]
    out = sameas_resolve(_quads(spark, triples), drop_links=False)
    got = {(r["s"], r["p"], r["o"]) for r in out.collect()}
    # the link itself is canonicalized: A sameAs A
    assert ("A", OWL_SAMEAS, "A") in got
    assert ("A", "name", "bee") in got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_distributed_closure_raises_on_non_convergence(spark):
    # a 5-link chain cannot close in one doubling round
    from rdf_mapper_spark.inference import _distributed_closure

    edges = spark.createDataFrame(
        [(f"c{i}", f"c{i+1}") for i in range(5)], "sub string, sup string")
    with pytest.raises(RuntimeError, match="did not converge"):
        _distributed_closure(edges, max_iter=1)
    out = _distributed_closure(edges, max_iter=5)
    assert out.count() == 5 + 4 + 3 + 2 + 1
