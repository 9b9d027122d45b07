"""BGP query compiler over quad tables."""

import pytest
from pyspark.sql import functions as F

from rdf_mapper_spark.query import bgp_query

QUAD_SCHEMA = ("g string, sk string, s string, p string, ok string, "
               "o string, odt string, olg string")


def _quads(spark, triples, g=None):
    rows = [(g, "iri", s, p, "literal", o, None, None)
            for s, p, o in triples]
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def test_bgp_star_join_and_constants(spark):
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "lang", "en"), ("d1", "src", "a"),
        ("d2", "type", "Doc"), ("d2", "lang", "fr"), ("d2", "src", "b"),
        ("d3", "type", "Img"), ("d3", "lang", "en"), ("d3", "src", "c"),
    ])
    out = bgp_query(q, [("?d", "type", "Doc"),
                        ("?d", "lang", "en"),
                        ("?d", "src", "?s")]).collect()
    assert [(r.d, r.s) for r in out] == [("d1", "a")]


def test_bgp_predicate_variable_and_spo(spark):
    q = _quads(spark, [("x", "p1", "1"), ("x", "p2", "2")])
    out = {(r.p, r.o) for r in
           bgp_query(q, [("x", "?p", "?o")]).collect()}
    assert out == {("p1", "1"), ("p2", "2")}
    # fully unconstrained pattern binds everything
    assert bgp_query(q, [("?s", "?p", "?o")]).count() == 2


def test_bgp_repeated_variable_in_one_pattern(spark):
    q = _quads(spark, [("a", "sameAs", "a"), ("a", "sameAs", "b")])
    out = bgp_query(q, [("?x", "sameAs", "?x")]).collect()
    assert [r.x for r in out] == ["a"]


def test_bgp_chain_join_across_positions(spark):
    # ?a knows ?b / ?b knows ?c  -> path of length 2
    q = _quads(spark, [("a", "knows", "b"), ("b", "knows", "c"),
                       ("c", "knows", "d")])
    out = {(r.a, r.b, r.c) for r in
           bgp_query(q, [("?a", "knows", "?b"),
                         ("?b", "knows", "?c")]).collect()}
    assert out == {("a", "b", "c"), ("b", "c", "d")}


def test_bgp_graph_routing_and_distinct(spark):
    default = _quads(spark, [("s", "p", "o")])
    named = _quads(spark, [("s", "p", "o2")], g="http://g/1")
    q = default.unionByName(named)
    assert [r.o for r in bgp_query(q, [("s", "p", "?o")]).collect()] == ["o"]
    assert [r.o for r in bgp_query(q, [("s", "p", "?o")],
                                   graph="http://g/1").collect()] == ["o2"]
    # duplicate solutions collapse under distinct (set semantics)
    dup = _quads(spark, [("s", "p", "o"), ("s", "q", "o")])
    assert bgp_query(dup, [("s", "?any", "?o")],
                     select=["?o"]).count() == 1


def test_bgp_disjoint_patterns_cross_product(spark):
    q = _quads(spark, [("a", "p", "1"), ("b", "r", "2")])
    out = bgp_query(q, [("?x", "p", "?v"), ("?y", "r", "?w")]).collect()
    assert len(out) == 1 and out[0].x == "a" and out[0].y == "b"


def test_bgp_empty_patterns_rejected(spark):
    q = _quads(spark, [("a", "p", "1")])
    with pytest.raises(ValueError):
        bgp_query(q, [])


def test_bgp_star_plan_no_cartesian_no_python(spark):
    q = _quads(spark, [(f"d{i}", p, f"v{i}") for i in range(20)
                       for p in ("type", "src")])
    plan = (bgp_query(q, [("?d", "type", "?t"), ("?d", "src", "?s")])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_path_query_min_hops_and_cycle_termination(spark):
    from rdf_mapper_spark.query import path_query

    # chain a->b->c->d plus a shortcut a->c and a 2-cycle x<->y
    q = _quads(spark, [
        ("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d"),
        ("a", "next", "c"),
        ("x", "next", "y"), ("y", "next", "x"),
    ])
    got = {(r.src, r.dst): r.hops
           for r in path_query(q, "next", max_hops=3).collect()}
    assert got[("a", "b")] == 1
    assert got[("a", "c")] == 1          # shortcut wins over 2-hop path
    assert got[("a", "d")] == 2          # via the shortcut
    assert got[("b", "d")] == 2
    # cycle: reachable both ways, self-reachability at hop 2, no blowup
    assert got[("x", "y")] == 1 and got[("y", "x")] == 1
    assert got[("x", "x")] == 2 and got[("y", "y")] == 2
    # 6 edges + 4 new 2-hop pairs (ad, bd, xx, yy); hop 3 adds nothing
    assert len(got) == 10


def test_path_query_other_predicates_ignored(spark):
    from rdf_mapper_spark.query import path_query

    q = _quads(spark, [("a", "next", "b"), ("b", "other", "c")])
    got = {(r.src, r.dst) for r in
           path_query(q, "next", max_hops=2).collect()}
    assert got == {("a", "b")}


def test_entity_table_min_collapse_and_missing(spark):
    from rdf_mapper_spark.query import entity_table

    q = _quads(spark, [
        ("e1", "name", "zeta"), ("e1", "name", "alpha"),  # multi-valued
        ("e1", "age", "30"),
        ("e2", "name", "solo"),                            # no age
    ])
    out = {r.s: r for r in entity_table(
        q, {"name": "name", "age": "age"}).collect()}
    assert out["e1"].name == "alpha" and out["e1"].age == "30"
    assert out["e2"].name == "solo" and out["e2"].age is None


def test_predicate_stats_counts(spark):
    from rdf_mapper_spark.query import predicate_stats

    q = _quads(spark, [
        ("a", "p", "1"), ("b", "p", "1"), ("a", "p", "2"),
        ("a", "q", "x"),
    ])
    out = {r.p: r for r in predicate_stats(q).collect()}
    assert (out["p"].n_triples, out["p"].n_subjects,
            out["p"].n_objects) == (3, 2, 2)
    assert (out["q"].n_triples, out["q"].n_subjects,
            out["q"].n_objects) == (1, 1, 1)


def test_entity_table_plan_single_agg_no_join(spark):
    from rdf_mapper_spark.query import entity_table

    q = _quads(spark, [(f"e{i}", p, f"v{i}") for i in range(10)
                       for p in ("a", "b")])
    plan = (entity_table(q, {"a": "a", "b": "b"})
            ._jdf.queryExecution().executedPlan().toString())
    # conditional aggregation: 2 exchanges (partial+final), no join
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan and "EvalPython" not in plan


def test_bgp_differential_vs_python_evaluator(spark):
    """Differential check: bgp_query on a small random-ish graph must
    equal a brute-force Python evaluator over every pattern shape the
    compiler handles (constants in any position, shared vars, chains,
    cross products)."""
    import itertools

    triples = [(f"s{i % 5}", f"p{i % 3}", f"o{i % 4}") for i in range(30)]
    triples += [("s0", "p9", "s1"), ("s1", "p9", "s2")]
    q = _quads(spark, sorted(set(triples)))
    tset = sorted(set(triples))

    def brute(patterns):
        sols = [dict()]
        for pat in sorted(patterns,
                          key=lambda p: sum(t.startswith("?") for t in p)):
            new = []
            for binding in sols:
                for t in tset:
                    b = dict(binding)
                    ok = True
                    for term, val in zip(pat, t):
                        if term.startswith("?"):
                            name = term[1:]
                            if name in b and b[name] != val:
                                ok = False
                                break
                            b[name] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        new.append(b)
            sols = new
        names = sorted({t[1:] for pat in patterns
                        for t in pat if t.startswith("?")})
        return {tuple(b[n] for n in names) for b in sols}, names

    cases = [
        [("?x", "p0", "?y")],
        [("?x", "?p", "?y")],
        [("?x", "p0", "?y"), ("?x", "p1", "?z")],
        [("?x", "p9", "?y"), ("?y", "p9", "?z")],
        [("s0", "?p", "?o")],
        [("?x", "p0", "o0"), ("?x", "p2", "?v")],
        [("?a", "p0", "?b"), ("?c", "p9", "?d")],   # disjoint
        [("?x", "p9", "?x")],                        # repeated var
    ]
    for patterns in cases:
        want, names = brute(patterns)
        got = {tuple(getattr(r, n) for n in names)
               for r in bgp_query(q, patterns).collect()}
        assert got == want, (patterns, got ^ want)


def test_bgp_graph_variable(spark):
    """GRAPH ?g semantics: named graphs only, graph IRI binds and joins
    across patterns."""
    g1 = _quads(spark, [("s1", "p", "a"), ("s1", "q", "b")], g="http://g/1")
    g2 = _quads(spark, [("s2", "p", "c")], g="http://g/2")
    dflt = _quads(spark, [("s3", "p", "d")])  # default graph: excluded
    q = g1.unionByName(g2).unionByName(dflt)

    out = {(r.g, r.s, r.o) for r in
           bgp_query(q, [("?s", "p", "?o")], graph="?g").collect()}
    assert out == {("http://g/1", "s1", "a"), ("http://g/2", "s2", "c")}

    # the graph variable JOINS across patterns: both patterns must hold
    # within the SAME named graph
    both = {(r.g, r.s) for r in
            bgp_query(q, [("?s", "p", "?o"), ("?s", "q", "?v")],
                      graph="?g").collect()}
    assert both == {("http://g/1", "s1")}


def test_bgp_optional_left_join(spark):
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "flag", "big"),
        ("d2", "type", "Doc"),
        ("d3", "type", "Img"), ("d3", "flag", "big"),
    ])
    out = {(r.d, r.f) for r in
           bgp_query(q, [("?d", "type", "Doc")],
                     optional_patterns=[[("?d", "flag", "?f")]]).collect()}
    assert out == {("d1", "big"), ("d2", None)}


def test_bgp_optional_multi_pattern_group(spark):
    # the whole group matches or binds null as a unit (SPARQL semantics)
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "a", "1"), ("d1", "b", "2"),
        ("d2", "type", "Doc"), ("d2", "a", "1"),   # b missing: group fails
    ])
    out = {(r.d, r.x, r.y) for r in
           bgp_query(q, [("?d", "type", "Doc")],
                     optional_patterns=[[("?d", "a", "?x"),
                                        ("?d", "b", "?y")]]).collect()}
    assert out == {("d1", "1", "2"), ("d2", None, None)}


def test_bgp_optional_disjoint_rejected(spark):
    q = _quads(spark, [("d1", "type", "Doc")])
    with pytest.raises(ValueError):
        bgp_query(q, [("?d", "type", "Doc")],
                  optional_patterns=[[("?z", "other", "?w")]])


def test_bgp_filters(spark):
    q = _quads(spark, [
        ("d1", "n", "5"), ("d2", "n", "15"), ("d3", "n", "25"),
    ])
    out = {r.d for r in
           bgp_query(q, [("?d", "n", "?n")],
                     filters=["CAST(n AS INT) > 10", "d <> 'd3'"])
           .collect()}
    assert out == {"d2"}


def test_bgp_filter_on_optional_binding(spark):
    # FILTER over an OPTIONAL var: NULL binding -> condition NULL -> row
    # dropped (SPARQL error semantics for the bare comparison)
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "flag", "big"),
        ("d2", "type", "Doc"),
    ])
    out = {r.d for r in
           bgp_query(q, [("?d", "type", "Doc")],
                     optional_patterns=[[("?d", "flag", "?f")]],
                     filters=["f = 'big'"]).collect()}
    assert out == {"d1"}
    # COALESCE-guarded filter keeps the unbound row (SPARQL BOUND idiom)
    kept = {r.d for r in
            bgp_query(q, [("?d", "type", "Doc")],
                      optional_patterns=[[("?d", "flag", "?f")]],
                      filters=["f IS NULL OR f = 'big'"]).collect()}
    assert kept == {"d1", "d2"}


def test_bgp_union(spark):
    from rdf_mapper_spark.query import bgp_union
    q = _quads(spark, [
        ("d1", "title", "t1"), ("d2", "label", "t2"), ("d3", "title", "t1"),
    ])
    a = bgp_query(q, [("?d", "title", "?name")])
    b = bgp_query(q, [("?d", "label", "?name"), ("?d", "extra", "?e")])
    out = {(r.d, r.name, r.e) for r in bgp_union(a, b).collect()}
    # branch b is empty (no 'extra' triples); branch a fills e with NULL
    assert out == {("d1", "t1", None), ("d3", "t1", None)}
    c = bgp_query(q, [("?d", "label", "?name")])
    out2 = {(r.d, r.name) for r in bgp_union(a, c).collect()}
    assert out2 == {("d1", "t1"), ("d3", "t1"), ("d2", "t2")}


def test_bgp_minus(spark):
    from rdf_mapper_spark.query import bgp_minus
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d2", "type", "Doc"), ("d3", "type", "Doc"),
        ("d2", "banned", "yes"),
    ])
    keep = bgp_minus(bgp_query(q, [("?d", "type", "Doc")]),
                     bgp_query(q, [("?d", "banned", "yes")]))
    assert {r.d for r in keep.collect()} == {"d1", "d3"}
    # no shared vars: nothing removed (SPARQL MINUS definition)
    untouched = bgp_minus(bgp_query(q, [("?d", "type", "Doc")]),
                          bgp_query(q, [("?x", "banned", "yes")]))
    assert untouched.count() == 3


def test_construct_rewrite(spark):
    from rdf_mapper_spark.query import construct
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "src", "a"),
        ("d2", "type", "Doc"),
    ])
    out = construct(
        q,
        [("?d", "type", "Doc")],
        [("?d", "ex:kind", "ex:Page"),          # constant IRI object
         ("?d", "ex:origin", "?s")],            # var object (optional-fed)
        optional_patterns=[[("?d", "src", "?s")]],
    )
    rows = {(r.s, r.p, r.o, r.ok) for r in out.collect()}
    # unbound ?s for d2 skips the origin triple, not the kind triple
    assert rows == {
        ("d1", "ex:kind", "ex:Page", "iri"),
        ("d2", "ex:kind", "ex:Page", "iri"),
        ("d1", "ex:origin", "a", "literal"),
    }
    # output is quad-schema: feeds sinks / stores unchanged
    assert out.columns == ["g", "sk", "s", "p", "ok", "o", "odt", "olg"]


def test_construct_iri_shaped_variable_object(spark):
    from rdf_mapper_spark.query import construct
    q = _quads(spark, [("http://x/d1", "ref", "http://x/d2")])
    # object position holds an IRI string: re-detected as iri kind
    qq = q.withColumn("ok", F.lit("iri"))
    out = construct(qq, [("?a", "ref", "?b")],
                    [("?b", "ex:refBy", "?a")]).collect()
    assert [(r.s, r.o, r.ok) for r in out] == \
        [("http://x/d2", "http://x/d1", "iri")]


def test_ask(spark):
    from rdf_mapper_spark.query import ask
    q = _quads(spark, [("d1", "type", "Doc")])
    assert ask(q, [("?d", "type", "Doc")]) is True
    assert ask(q, [("?d", "type", "Nope")]) is False
    assert ask(q, [("?d", "type", "Doc")],
               filters=["d = 'd2'"]) is False


def test_describe_list_and_df(spark):
    from rdf_mapper_spark.query import describe
    rows = [
        (None, "iri", "d1", "type", "iri", "Doc", None, None),
        (None, "iri", "d1", "src", "literal", "a", None, None),
        (None, "iri", "x", "ref", "iri", "d1", None, None),   # inbound
        (None, "iri", "x", "lbl", "literal", "d1", None, None),  # literal
        (None, "iri", "d2", "type", "iri", "Doc", None, None),
    ]
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    got = {(r.s, r.p, r.o) for r in describe(q, ["d1"]).collect()}
    # subject quads + inbound IRI references; literal 'd1' excluded
    assert got == {("d1", "type", "Doc"), ("d1", "src", "a"),
                   ("x", "ref", "d1")}
    subs = spark.createDataFrame([("d1",)], "iri string")
    got_df = {(r.s, r.p, r.o) for r in describe(q, subs).collect()}
    assert got_df == got
    plan = describe(q, subs)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_update_where_delete_insert(spark):
    from rdf_mapper_spark.query import update_where
    rows = [
        (None, "iri", "d1", "lang", "literal", "fr", None, None),
        (None, "iri", "d1", "chars", "literal", "10", "xsd:int", None),
        (None, "iri", "d2", "lang", "literal", "en", None, None),
        (None, "iri", "d2", "chars", "literal", "20", "xsd:int", None),
    ]
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    out = update_where(
        q,
        [("?d", "lang", "fr"), ("?d", "chars", "?c")],
        delete_templates=[("?d", "chars", "?c")],
        insert_templates=[("?d", "redacted", "true")],
        materialize_solutions=False,
    )
    got = {(r.s, r.p, r.o) for r in out.collect()}
    # lexical delete removes the TYPED chars quad of the fr doc only;
    # en doc untouched; marker inserted
    assert got == {
        ("d1", "lang", "fr"), ("d1", "redacted", "true"),
        ("d2", "lang", "en"), ("d2", "chars", "20"),
    }


def test_update_where_idempotent_insert(spark):
    from rdf_mapper_spark.query import update_where
    rows = [(None, "iri", "d1", "lang", "literal", "fr", None, None)]
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    once = update_where(q, [("?d", "lang", "fr")],
                        insert_templates=[("?d", "seen", "y")],
                        materialize_solutions=False)
    twice = update_where(once, [("?d", "lang", "fr")],
                         insert_templates=[("?d", "seen", "y")],
                         materialize_solutions=False)
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


def test_update_where_requires_templates(spark):
    from rdf_mapper_spark.query import update_where
    q = _quads(spark, [("a", "p", "1")])
    with pytest.raises(ValueError):
        update_where(q, [("?s", "p", "?o")])


def test_path_composition(spark):
    from rdf_mapper_spark.query import (
        path_alt, path_closure, path_edges, path_inv, path_seq,
    )
    q = _quads(spark, [
        ("a", "p", "b"), ("b", "q", "c"), ("c", "p", "d"),
    ])
    p = path_edges(q, "p")
    qq = path_edges(q, "q")
    # sequence p/q
    assert {(r.src, r.dst) for r in path_seq(p, qq).collect()} == \
        {("a", "c")}
    # alternation p|q
    assert {(r.src, r.dst) for r in path_alt(p, qq).collect()} == \
        {("a", "b"), ("b", "c"), ("c", "d")}
    # inverse ^p
    assert {(r.src, r.dst) for r in path_inv(p).collect()} == \
        {("b", "a"), ("d", "c")}
    # closure over a COMPOSED path: (p|q){1,3} walks the whole chain
    closure = path_closure(path_alt(p, qq), 3, materialize=False)
    got = {(r.src, r.dst, r.hops) for r in closure.collect()}
    assert got == {
        ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
        ("a", "c", 2), ("b", "d", 2), ("a", "d", 3),
    }


def test_bgp_aggregate(spark):
    from rdf_mapper_spark.query import bgp_aggregate
    q = _quads(spark, [
        ("d1", "src", "a"), ("d2", "src", "a"), ("d3", "src", "b"),
        ("d1", "n", "5"), ("d2", "n", "7"), ("d3", "n", "9"),
    ])
    out = bgp_aggregate(
        q, [("?d", "src", "?s"), ("?d", "n", "?n")],
        group_vars=["?s"],
        aggs={"cnt": "count(*)", "mx": "max(CAST(n AS INT))"},
        having=["cnt >= 2"],
    ).collect()
    assert [(r.s, r.cnt, r.mx) for r in out] == [("a", 2, 7)]


def test_graph_management(spark):
    from rdf_mapper_spark.query import (
        add_graph, clear_graph, copy_graph, move_graph,
    )
    g1 = _quads(spark, [("s", "p", "1")], g="G1")
    g2 = _quads(spark, [("s", "p", "2")], g="G2")
    dflt = _quads(spark, [("s", "p", "0")])
    q = g1.unionByName(g2).unionByName(dflt)

    def snap(df):
        return {(r.g, r.s, r.p, r.o) for r in df.collect()}

    assert snap(add_graph(q, "G1", "G2")) == snap(q) | {("G2", "s", "p", "1")}
    # ADD is idempotent for already-present quads
    assert snap(add_graph(add_graph(q, "G1", "G2"), "G1", "G2")) == \
        snap(q) | {("G2", "s", "p", "1")}
    assert snap(copy_graph(q, "G1", "G2")) == \
        {("G1", "s", "p", "1"), ("G2", "s", "p", "1"), (None, "s", "p", "0")}
    assert snap(move_graph(q, "G1", "G2")) == \
        {("G2", "s", "p", "1"), (None, "s", "p", "0")}
    assert snap(clear_graph(q, "G2")) == \
        {("G1", "s", "p", "1"), (None, "s", "p", "0")}
    assert snap(clear_graph(q, None)) == \
        {("G1", "s", "p", "1"), ("G2", "s", "p", "2")}
    # ADD from the default graph
    assert snap(add_graph(q, None, "G1")) == snap(q) | {("G1", "s", "p", "0")}


def test_bgp_values_inline_data(spark):
    q = _quads(spark, [
        ("d1", "src", "a"), ("d2", "src", "b"), ("d3", "src", "c"),
    ])
    # shared var: VALUES restricts the solutions (multiset join)
    out = bgp_query(q, [("?d", "src", "?s")],
                    values={"?s": ["a", "c"]}).collect()
    assert {(r.d, r.s) for r in out} == {("d1", "a"), ("d3", "c")}
    # fresh var rides along row-wise; UNDEF (None) leaves it NULL
    out = bgp_query(q, [("?d", "src", "?s")],
                    values={"?s": ["a", "b"],
                            "?tier": ["gold", None]}).collect()
    assert {(r.d, r.s, r.tier) for r in out} == \
        {("d1", "a", "gold"), ("d2", "b", None)}
    # UNDEF on a shared var leaves that row unconstrained
    out = bgp_query(q, [("?d", "src", "?s")],
                    values={"?s": ["a", None],
                            "?tag": ["x", "y"]}).collect()
    assert {(r.d, r.s, r.tag) for r in out} == \
        {("d1", "a", "x"),
         ("d1", "a", "y"), ("d2", "b", "y"), ("d3", "c", "y")}
    # disjoint VALUES block: plain solution-multiset cross product
    assert bgp_query(q, [("?d", "src", "?s")],
                     values={"?k": ["1", "2"]}).count() == 6


def test_bgp_bind_expressions(spark):
    q = _quads(spark, [("d1", "n", "5"), ("d2", "n", "12")])
    out = bgp_query(
        q, [("?d", "n", "?n")],
        binds={"?n2": "CAST(n AS INT) * 2",
               "?big": "n2 > 20"},  # later bind sees earlier bind
        filters=["big"],
    ).collect()
    assert [(r.d, r.n2, r.big) for r in out] == [("d2", 24, True)]


def test_bgp_exists_not_exists(spark):
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d2", "type", "Doc"), ("d3", "type", "Doc"),
        ("d1", "flag", "spam"),
        ("d2", "rev", "r1"), ("d2", "rev", "r2"),  # multiple matches
    ])
    pats = [("?d", "type", "Doc")]
    # EXISTS restricts without widening (d2 has TWO rev quads -> still 1 row)
    out = bgp_query(q, pats, exists_groups=[[("?d", "rev", "?r")]],
                    distinct=False).collect()
    assert [r.d for r in out] == ["d2"]
    out = bgp_query(q, pats,
                    not_exists_groups=[[("?d", "flag", "spam")]]).collect()
    assert {r.d for r in out} == {"d2", "d3"}
    # conjunction of both filter kinds
    out = bgp_query(q, pats,
                    exists_groups=[[("?d", "rev", "?r")]],
                    not_exists_groups=[[("?d", "flag", "spam")]]).collect()
    assert {r.d for r in out} == {"d2"}
    with pytest.raises(ValueError):
        bgp_query(q, pats, exists_groups=[[("x", "y", "z")]]).collect()


def test_bgp_solution_modifiers(spark):
    q = _quads(spark, [(f"d{i}", "n", str(i)) for i in range(10)])
    out = bgp_query(q, [("?d", "n", "?n")],
                    order_by=["CAST(n AS INT) DESC"], limit=3).collect()
    assert [r.n for r in out] == ["9", "8", "7"]
    out = bgp_query(q, [("?d", "n", "?n")],
                    order_by=["CAST(n AS INT) ASC"],
                    limit=2, offset=4).collect()
    assert [r.n for r in out] == ["4", "5"]
    # ORDER BY + LIMIT compiles to the distributed top-k operator,
    # never a global single-partition sort
    plan = (bgp_query(q, [("?d", "n", "?n")],
                      order_by=["CAST(n AS INT) DESC"], limit=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_path_closure_fixpoint_and_zero(spark):
    from rdf_mapper_spark.query import path_query

    # chain a->b->c->d plus a 2-cycle x<->y: fixpoint must converge
    q = _quads(spark, [
        ("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d"),
        ("x", "next", "y"), ("y", "next", "x"),
    ])
    got = {(r.src, r.dst): r.hops
           for r in path_query(q, "next", max_hops=None).collect()}
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2, ("a", "d"): 3,
        ("x", "y"): 1, ("y", "x"): 1, ("x", "x"): 2, ("y", "y"): 2,
    }
    # pred* : zero-length self-paths, min-hop 0 beats the cycle length
    got = {(r.src, r.dst): r.hops
           for r in path_query(q, "next", max_hops=None,
                               include_zero=True).collect()}
    assert got[("x", "x")] == 0 and got[("y", "y")] == 0
    assert got[("a", "a")] == 0 and got[("d", "d")] == 0
    assert got[("a", "d")] == 3
    # a self-loop edge is subsumed by the zero-length path
    loop = _quads(spark, [("s", "next", "s")])
    got = {(r.src, r.dst): r.hops
           for r in path_query(loop, "next", max_hops=None,
                               include_zero=True).collect()}
    assert got == {("s", "s"): 0}

    from rdf_mapper_spark.query import path_closure, path_edges
    with pytest.raises(RuntimeError):
        # chain longer than max_iter cannot converge within the guard
        long = _quads(spark, [(f"n{i}", "next", f"n{i+1}")
                              for i in range(6)])
        path_closure(path_edges(long, "next"), None, max_iter=2)


def test_bgp_subquery_initial_solutions(spark):
    from rdf_mapper_spark.query import bgp_aggregate

    q = _quads(spark, [
        ("d1", "src", "a"), ("d2", "src", "a"), ("d3", "src", "b"),
        ("d1", "n", "5"), ("d2", "n", "7"), ("d3", "n", "9"),
    ])
    # sub-SELECT: sources with >= 2 docs; outer query lists their docs
    sub = bgp_aggregate(q, [("?d", "src", "?s")], group_vars=["?s"],
                        aggs={"n_docs": "count(*)"},
                        having=["n_docs >= 2"])
    out = bgp_query(q, [("?d", "src", "?s"), ("?d", "n", "?n")],
                    initial_solutions=sub).collect()
    assert {(r.d, r.s, r.n, r.n_docs) for r in out} == \
        {("d1", "a", "5", 2), ("d2", "a", "7", 2)}
    # var-disjoint subquery: legal cross-product join of multisets
    scalar = sub.agg(F.sum("n_docs").alias("total"))
    out = bgp_query(q, [("?d", "n", "?n")],
                    initial_solutions=scalar).collect()
    assert {(r.d, r.total) for r in out} == \
        {("d1", 2), ("d2", 2), ("d3", 2)}


# --- cost-based join ordering (VoID stats catalog) ---------------------

def test_order_patterns_connectivity_avoids_cross(spark):
    # var-count ordering alone would put the two 1-var patterns first
    # and cross-join them; connected-first never pays that
    from rdf_mapper_spark.query import order_patterns
    pats = [("?a", "p", "c1"), ("?b", "q", "c2"), ("?a", "r", "?b")]
    ordered = order_patterns(pats)
    assert ordered[0] == ("?a", "p", "c1")
    assert ordered[1] == ("?a", "r", "?b")      # connected, not ?b/q/c2
    assert ordered[2] == ("?b", "q", "c2")


def test_bgp_connected_order_plan_no_cartesian(spark):
    q = _quads(spark, [
        ("a", "p", "c1"), ("b", "q", "c2"), ("a", "r", "b"),
        ("x", "p", "c9"), ("b2", "q", "c2"),
    ])
    out = bgp_query(q, [("?a", "p", "c1"), ("?b", "q", "c2"),
                        ("?a", "r", "?b")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert [(r.a, r.b) for r in out.collect()] == [("a", "b")]


def test_estimate_pattern_cost_model():
    from rdf_mapper_spark.query import estimate_pattern
    stats = {"common": (1_000_000, 100_000, 50_000),
             "rare": (20, 20, 5)}
    # predicate-only binding: the raw triple count
    assert estimate_pattern(("?s", "common", "?o"), stats) == 1_000_000
    assert estimate_pattern(("?s", "rare", "?o"), stats) == 20
    # constant subject divides by distinct subjects
    assert estimate_pattern(("s1", "common", "?o"), stats) == 10.0
    # bound variable treated like a constant
    assert estimate_pattern(("?s", "common", "?o"), stats,
                            bound={"s"}) == 10.0
    # unknown predicate estimates empty (cheapest possible)
    assert estimate_pattern(("?s", "absent", "?o"), stats) == 0.0
    # unbound predicate variable: total triples over the catalog
    assert estimate_pattern(("?s", "?p", "?o"), stats) == 1_000_020


def test_order_patterns_stats_rare_first(spark):
    from rdf_mapper_spark.query import order_patterns
    stats = {"common": (1_000_000, 100_000, 50_000),
             "rare": (20, 20, 5)}
    pats = [("?d", "common", "?x"), ("?d", "rare", "?y")]
    ordered = order_patterns(pats, stats)
    assert ordered[0] == ("?d", "rare", "?y")
    # without stats the tie breaks on input order instead
    assert order_patterns(pats)[0] == ("?d", "common", "?x")


def test_bgp_query_stats_same_results(spark):
    from rdf_mapper_spark.query import stats_catalog
    q = _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "lang", "en"), ("d1", "src", "a"),
        ("d2", "type", "Doc"), ("d2", "lang", "fr"), ("d2", "src", "b"),
        ("d3", "type", "Img"), ("d3", "lang", "en"), ("d3", "src", "c"),
    ])
    cat = stats_catalog(q)
    assert cat["type"] == (3, 3, 2)
    pats = [("?d", "type", "Doc"), ("?d", "lang", "en"),
            ("?d", "src", "?s")]
    base = {(r.d, r.s) for r in bgp_query(q, pats).collect()}
    with_stats = {(r.d, r.s)
                  for r in bgp_query(q, pats, stats=cat).collect()}
    assert base == with_stats == {("d1", "a")}
