"""SPARQL text front-end (rdf_mapper_spark/sparql.py): parser +
evaluation, differential against the programmatic query API."""

import pytest
from pyspark.sql import functions as F

from rdf_mapper_spark.query import bgp_query
from rdf_mapper_spark.sparql import RDF_TYPE, sparql, sparql_update

QUAD_SCHEMA = ("g string, sk string, s string, p string, ok string, "
               "o string, odt string, olg string")


def _quads(spark, triples, g=None):
    rows = [(g, "iri", s, p, "literal", o, None, None)
            for s, p, o in triples]
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def _docs(spark):
    return _quads(spark, [
        ("d1", "type", "Doc"), ("d1", "lang", "en"), ("d1", "src", "a"),
        ("d1", "n", "10"),
        ("d2", "type", "Doc"), ("d2", "lang", "fr"), ("d2", "src", "b"),
        ("d2", "n", "25"),
        ("d3", "type", "Doc"), ("d3", "lang", "en"), ("d3", "src", "a"),
        ("d3", "n", "3"),
        ("d4", "type", "Img"), ("d4", "lang", "en"), ("d4", "src", "c"),
    ])


# --- SELECT core ---------------------------------------------------------

def test_select_star_join(spark):
    out = sparql(_docs(spark), """
        SELECT ?d ?src WHERE {
            ?d <type> "Doc" ; <lang> "en" ; <src> ?src .
        }""")
    assert {(r.d, r.src) for r in out.collect()} == \
        {("d1", "a"), ("d3", "a")}


def test_select_matches_programmatic(spark):
    q = _docs(spark)
    text = sparql(q, 'SELECT ?d WHERE { ?d <type> "Doc" . '
                     '?d <lang> "en" }')
    prog = bgp_query(q, [("?d", "type", "Doc"), ("?d", "lang", "en")],
                     select=["?d"])
    assert {r.d for r in text.collect()} == {r.d for r in prog.collect()}


def test_prefix_expansion_and_a_keyword(spark):
    q = _quads(spark, [
        ("d1", RDF_TYPE, "http://ex.org/def/Doc"),
        ("d1", "http://ex.org/def/src", "a"),
    ])
    out = sparql(q, """
        PREFIX ex: <http://ex.org/def/>
        SELECT ?d ?s WHERE { ?d a ex:Doc ; ex:src ?s }""")
    assert [(r.d, r.s) for r in out.collect()] == [("d1", "a")]


def test_filter_comparison_and_logical(spark):
    out = sparql(_docs(spark), """
        SELECT ?d WHERE {
            ?d <n> ?n . FILTER(?n > 5 && ?n <= 25)
        }""")
    assert {r.d for r in out.collect()} == {"d1", "d2"}


def test_filter_regex_and_strstarts(spark):
    q = _quads(spark, [("x", "v", "Hello"), ("y", "v", "world"),
                       ("z", "v", "help")])
    out = sparql(q, 'SELECT ?s WHERE { ?s <v> ?v . '
                    'FILTER(REGEX(?v, "^hel", "i")) }')
    assert {r.s for r in out.collect()} == {"x", "z"}
    out2 = sparql(q, 'SELECT ?s WHERE { ?s <v> ?v . '
                     'FILTER(STRSTARTS(?v, "wor")) }')
    assert {r.s for r in out2.collect()} == {"y"}


def test_optional_and_bound(spark):
    q = _quads(spark, [("d1", "type", "Doc"), ("d1", "tag", "t1"),
                       ("d2", "type", "Doc")])
    out = sparql(q, """
        SELECT ?d ?t WHERE {
            ?d <type> "Doc" . OPTIONAL { ?d <tag> ?t }
        }""")
    got = {(r.d, r.t) for r in out.collect()}
    assert got == {("d1", "t1"), ("d2", None)}
    unbound = sparql(q, """
        SELECT ?d WHERE {
            ?d <type> "Doc" . OPTIONAL { ?d <tag> ?t }
            FILTER(!BOUND(?t))
        }""")
    assert {r.d for r in unbound.collect()} == {"d2"}


def test_values_and_undef(spark):
    out = sparql(_docs(spark), """
        SELECT ?d ?src WHERE {
            ?d <src> ?src .
            VALUES ?src { "a" "c" }
        }""")
    assert {(r.d, r.src) for r in out.collect()} == \
        {("d1", "a"), ("d3", "a"), ("d4", "c")}
    multi = sparql(_docs(spark), """
        SELECT ?d ?src ?tier WHERE {
            ?d <src> ?src .
            VALUES (?src ?tier) { ("a" "gold") (UNDEF "any") }
        }""")
    rows = {(r.d, r.src, r.tier) for r in multi.collect()}
    assert ("d1", "a", "gold") in rows
    assert ("d2", "b", "any") in rows      # UNDEF row matches all


def test_bind_expression(spark):
    out = sparql(_docs(spark), """
        SELECT ?d ?big WHERE {
            ?d <n> ?n . BIND(IF(?n > 9, "yes", "no") AS ?big)
        }""")
    assert {(r.d, r.big) for r in out.collect()} == \
        {("d1", "yes"), ("d2", "yes"), ("d3", "no")}


def test_exists_not_exists(spark):
    q = _quads(spark, [("d1", "type", "Doc"), ("d1", "tag", "t"),
                       ("d2", "type", "Doc")])
    has = sparql(q, 'SELECT ?d WHERE { ?d <type> "Doc" . '
                    'FILTER EXISTS { ?d <tag> ?x } }')
    assert {r.d for r in has.collect()} == {"d1"}
    hasnt = sparql(q, 'SELECT ?d WHERE { ?d <type> "Doc" . '
                      'FILTER NOT EXISTS { ?d <tag> ?x } }')
    assert {r.d for r in hasnt.collect()} == {"d2"}


def test_union(spark):
    out = sparql(_docs(spark), """
        SELECT ?d WHERE {
            { ?d <lang> "fr" } UNION { ?d <src> "c" }
        }""")
    assert {r.d for r in out.collect()} == {"d2", "d4"}


def test_minus(spark):
    out = sparql(_docs(spark), """
        SELECT ?d WHERE {
            ?d <type> "Doc" .
            MINUS { ?d <lang> "fr" }
        }""")
    assert {r.d for r in out.collect()} == {"d1", "d3"}


def test_order_limit_offset(spark):
    out = sparql(_docs(spark), """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?d ?n WHERE { ?d <n> ?n }
        ORDER BY DESC(xsd:integer(?n)) LIMIT 2""")
    assert [(r.d, r.n) for r in out.collect()] == \
        [("d2", "25"), ("d1", "10")]
    off = sparql(_docs(spark), """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?d WHERE { ?d <n> ?n }
        ORDER BY DESC(xsd:integer(?n)) LIMIT 2 OFFSET 1""")
    assert [r.d for r in off.collect()] == ["d1", "d3"]


def test_distinct(spark):
    q = _quads(spark, [("d1", "src", "a"), ("d2", "src", "a")])
    dup = sparql(q, "SELECT ?s WHERE { ?x <src> ?s }")
    dis = sparql(q, "SELECT DISTINCT ?s WHERE { ?x <src> ?s }")
    assert dup.count() == 2 and dis.count() == 1


# --- aggregates ----------------------------------------------------------

def test_group_by_count_having(spark):
    out = sparql(_docs(spark), """
        SELECT ?src (COUNT(*) AS ?n) WHERE {
            ?d <type> "Doc" ; <src> ?src .
        } GROUP BY ?src HAVING(?n > 1)""")
    assert [(r.src, r.n) for r in out.collect()] == [("a", 2)]


def test_sum_avg_cast_double(spark):
    out = sparql(_docs(spark), """
        SELECT (SUM(?n) AS ?total) (AVG(?n) AS ?mean) WHERE {
            ?d <n> ?n
        }""").collect()[0]
    assert out.total == 38.0 and abs(out.mean - 38 / 3) < 1e-9


def test_count_distinct(spark):
    out = sparql(_docs(spark), """
        SELECT (COUNT(DISTINCT ?src) AS ?k) WHERE { ?d <src> ?src }
        """).collect()[0]
    assert out.k == 3


# --- other verbs ---------------------------------------------------------

def test_ask(spark):
    q = _docs(spark)
    assert sparql(q, 'ASK { ?d <lang> "fr" }') is True
    assert sparql(q, 'ASK { ?d <lang> "de" }') is False


def test_construct(spark):
    out = sparql(_docs(spark), """
        CONSTRUCT { ?d <hasSource> ?src } WHERE {
            ?d <type> "Doc" ; <src> ?src .
        }""")
    got = {(r.s, r.p, r.o) for r in out.collect()}
    assert got == {("d1", "hasSource", "a"), ("d2", "hasSource", "b"),
                   ("d3", "hasSource", "a")}


def test_describe_const_and_var(spark):
    q = _docs(spark)
    by_iri = sparql(q, "DESCRIBE <d1>")
    assert {r.p for r in by_iri.collect()} == {"type", "lang", "src", "n"}
    by_var = sparql(q, 'DESCRIBE ?d WHERE { ?d <lang> "fr" }')
    assert {r.s for r in by_var.collect()} == {"d2"}


def test_subselect(spark):
    out = sparql(_docs(spark), """
        SELECT ?d ?src WHERE {
            ?d <src> ?src .
            { SELECT ?src (COUNT(*) AS ?k) WHERE { ?x <src> ?src }
              GROUP BY ?src HAVING(?k > 1) }
        }""")
    assert {(r.d, r.src) for r in out.collect()} == \
        {("d1", "a"), ("d3", "a")}


def test_graph_clause(spark):
    rows = [(None, "iri", "d1", "p", "literal", "v1", None, None),
            ("g1", "iri", "d2", "p", "literal", "v2", None, None)]
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    out = sparql(q, "SELECT ?s WHERE { GRAPH <g1> { ?s <p> ?v } }")
    assert {r.s for r in out.collect()} == {"d2"}
    dflt = sparql(q, "SELECT ?s WHERE { ?s <p> ?v }")
    assert {r.s for r in dflt.collect()} == {"d1"}


# --- updates -------------------------------------------------------------

def test_update_insert_delete_data(spark):
    q = _quads(spark, [("a", "p", "1")])
    q2 = sparql_update(q, 'INSERT DATA { <b> <p> "2" }')
    assert {(r.s, r.o) for r in q2.collect()} == {("a", "1"), ("b", "2")}
    q3 = sparql_update(q2, 'DELETE DATA { <a> <p> "1" }')
    assert {(r.s, r.o) for r in q3.collect()} == {("b", "2")}


def test_update_delete_insert_where(spark):
    q = _quads(spark, [("d1", "status", "old"), ("d2", "status", "new")])
    q2 = sparql_update(q, """
        DELETE { ?d <status> "old" } INSERT { ?d <status> "archived" }
        WHERE { ?d <status> "old" }""")
    got = {(r.s, r.o) for r in q2.collect()}
    assert got == {("d1", "archived"), ("d2", "new")}


def test_update_delete_where_shorthand(spark):
    q = _quads(spark, [("d1", "tmp", "x"), ("d2", "keep", "y")])
    q2 = sparql_update(q, "DELETE WHERE { ?d <tmp> ?v }")
    assert {(r.s, r.p) for r in q2.collect()} == {("d2", "keep")}


def test_update_graph_management(spark):
    rows = [("g1", "iri", "a", "p", "literal", "1", None, None)]
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    q2 = sparql_update(q, "COPY GRAPH <g1> TO GRAPH <g2>")
    assert {r.g for r in q2.collect()} == {"g1", "g2"}
    q3 = sparql_update(q2, "CLEAR GRAPH <g1>")
    assert {r.g for r in q3.collect()} == {"g2"}


# --- parser errors -------------------------------------------------------

def test_undeclared_prefix_raises(spark):
    with pytest.raises(ValueError, match="undeclared prefix"):
        sparql(_docs(spark), "SELECT ?d WHERE { ?d ex:p ?v }")


def test_unsupported_verb_raises(spark):
    with pytest.raises(ValueError, match="unsupported"):
        sparql(_docs(spark), "LOAD <http://x>")


# --- property paths ------------------------------------------------------

def _cites(spark):
    return _quads(spark, [
        ("a", "cites", "b"), ("b", "cites", "c"), ("c", "cites", "d"),
        ("a", "refs", "x"), ("x", "cites", "y"),
    ])


def test_path_plus_closure(spark):
    out = sparql(_cites(spark), """
        SELECT ?t WHERE { <a> <cites>+ ?t }""")
    assert {r.t for r in out.collect()} == {"b", "c", "d"}


def test_path_star_includes_zero(spark):
    out = sparql(_cites(spark), """
        SELECT ?t WHERE { <a> <cites>* ?t }""")
    assert {r.t for r in out.collect()} == {"a", "b", "c", "d"}


def test_path_inverse(spark):
    out = sparql(_cites(spark), """
        SELECT ?s WHERE { <c> ^<cites> ?s }""")
    assert {r.s for r in out.collect()} == {"b"}


def test_path_sequence_and_alternation(spark):
    seq = sparql(_cites(spark), """
        SELECT ?t WHERE { <a> <refs>/<cites> ?t }""")
    assert {r.t for r in seq.collect()} == {"y"}
    alt = sparql(_cites(spark), """
        SELECT ?t WHERE { <a> (<refs>|<cites>) ?t }""")
    assert {r.t for r in alt.collect()} == {"b", "x"}


def test_path_composed_closure(spark):
    out = sparql(_cites(spark), """
        SELECT ?t WHERE { <a> (<refs>|<cites>)+ ?t }""")
    assert {r.t for r in out.collect()} == {"b", "c", "d", "x", "y"}


def test_path_joins_with_bgp(spark):
    q = _quads(spark, [
        ("a", "cites", "b"), ("b", "cites", "c"),
        ("a", "type", "Paper"), ("b", "type", "Paper"),
        ("c", "type", "Note"),
    ])
    out = sparql(q, """
        SELECT ?s ?t WHERE {
            ?s <cites>+ ?t .
            ?t <type> "Paper" .
        }""")
    assert {(r.s, r.t) for r in out.collect()} == {("a", "b")}


def test_path_both_constants_ask(spark):
    q = _cites(spark)
    assert sparql(q, "ASK { <a> <cites>+ <d> }") is True
    assert sparql(q, "ASK { <a> <cites>+ <x> }") is False


def test_path_marker_not_leaked(spark):
    out = sparql(_cites(spark), """
        SELECT ?s WHERE { ?s <cites> ?t . <a> <cites>+ <d> }""")
    assert out.columns == ["s"]
    # the existence marker gates the solutions: 0 rows when path absent
    gone = sparql(_cites(spark), """
        SELECT ?s WHERE { ?s <cites> ?t . <a> <cites>+ <nope> }""")
    assert gone.count() == 0


def test_path_rejected_in_construct_template(spark):
    with pytest.raises(ValueError, match="not allowed"):
        sparql(_cites(spark),
               "CONSTRUCT { ?s <p>+ ?t } WHERE { ?s <cites> ?t }")


# --- plan shape: the text layer adds nothing to the physical plan --------

def test_text_query_plan_stays_jvm_and_pruned(spark, tmp_path):
    """Parsing is driver-side only: a text-parsed star query over the
    predicate-partitioned store keeps static partition pruning and has
    zero Python in the executed plan — identical plan class to the
    programmatic bgp_query it compiles to."""
    from rdf_mapper_spark.store import read_quad_store, write_quad_store

    rows = []
    for i in range(40):
        rows.append((None, "iri", f"http://x/s{i}",
                     "http://x/def/type", "iri", "http://x/Doc",
                     None, None))
        rows.append((None, "iri", f"http://x/s{i}",
                     "http://x/def/name", "literal", f"n{i}",
                     None, None))
        rows.append((None, "iri", f"http://x/s{i}",
                     "http://x/def/junk", "literal", "z", None, None))
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    path = str(tmp_path / "store")
    write_quad_store(q, path)
    stored = read_quad_store(spark, path)

    out = sparql(stored, """
        PREFIX d: <http://x/def/>
        SELECT ?s ?n WHERE { ?s d:type <http://x/Doc> ; d:name ?n }""")
    assert out.count() == 40
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan         # zero executor Python
    assert "CartesianProduct" not in plan
    # both constant-predicate patterns prune: the junk partition is
    # never read (PartitionFilters carry the p=const predicates)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "junk" not in optimized.replace("PartitionFilters", "")
    prog = bgp_query(stored, [
        ("?s", "http://x/def/type", "http://x/Doc"),
        ("?s", "http://x/def/name", "?n")])
    assert {(r.s, r.n) for r in prog.collect()} == \
        {(r.s, r.n) for r in out.collect()}


def test_group_concat(spark):
    out = sparql(_docs(spark), """
        SELECT ?src (GROUP_CONCAT(?d; SEPARATOR=",") AS ?ds) WHERE {
            ?d <type> "Doc" ; <src> ?src .
        } GROUP BY ?src""")
    got = {(r.src, r.ds) for r in out.collect()}
    assert got == {("a", "d1,d3"), ("b", "d2")}


def test_graph_variable_binding(spark):
    rows = [("g1", "iri", "d1", "p", "literal", "v1", None, None),
            ("g2", "iri", "d2", "p", "literal", "v2", None, None),
            (None, "iri", "d3", "p", "literal", "v3", None, None)]
    q = spark.createDataFrame(rows, QUAD_SCHEMA)
    out = sparql(q, "SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?v } }")
    # GRAPH ?g: named graphs only, graph IRI bound to the variable
    assert {(r.g, r.s) for r in out.collect()} == \
        {("g1", "d1"), ("g2", "d2")}


def test_nested_group_merges(spark):
    out = sparql(_docs(spark), """
        SELECT ?d WHERE {
            { ?d <type> "Doc" . }
            ?d <lang> "en" .
        }""")
    assert {r.d for r in out.collect()} == {"d1", "d3"}


# --- round-6 correctness fixes (ADVICE items) ----------------------------

def test_move_default_keeps_named_graphs(spark):
    q = _quads(spark, [("s1", "p", "v1")]).unionByName(
        _quads(spark, [("s2", "p", "v2")], g="g1"))
    out = sparql_update(q, "MOVE DEFAULT TO <g2>")
    rows = {(r.g, r.s, r.o) for r in out.collect()}
    # default cleared, named graph g1 untouched, copy landed in g2
    assert rows == {("g1", "s2", "v2"), ("g2", "s1", "v1")}


def test_delete_data_scopes_to_default_graph(spark):
    q = _quads(spark, [("s1", "p", "v")]).unionByName(
        _quads(spark, [("s1", "p", "v")], g="g1"))
    out = sparql_update(q, 'DELETE DATA { <s1> <p> "v" }')
    rows = {(r.g, r.s) for r in out.collect()}
    assert rows == {("g1", "s1")}  # named-graph copy survives


def test_nested_group_with_bind_raises(spark):
    with pytest.raises(ValueError, match="nested group"):
        sparql(_docs(spark), """
            SELECT ?d ?x WHERE {
                ?d <type> "Doc" .
                { ?d <src> ?s . BIND(?s AS ?x) }
            }""")


def test_graph_mixed_with_siblings_raises(spark):
    with pytest.raises(ValueError, match="only element"):
        sparql(_docs(spark), """
            SELECT ?d WHERE {
                ?d <type> "Doc" .
                GRAPH <g1> { ?d <src> ?s }
            }""")


def test_two_graph_clauses_raise(spark):
    with pytest.raises(ValueError, match="only element|multiple GRAPH"):
        sparql(_docs(spark), """
            SELECT ?d WHERE {
                GRAPH <g1> { ?d <src> ?s }
                GRAPH <g2> { ?d <lang> ?l }
            }""")


def test_union_aggregate_keeps_multiset(spark):
    # d1 matches both branches: a set-union would count it once, the
    # SPARQL multiset union counts it per branch
    out = sparql(_docs(spark), """
        SELECT (COUNT(*) AS ?n) WHERE {
            { ?d <lang> "en" } UNION { ?d <src> "a" }
        } GROUP BY ?d""")
    counts = sorted(r.n for r in out.collect())
    assert counts == [1, 2, 2]  # d4: en only; d1, d3: both branches


def test_describe_is_dataset_wide_by_default(spark):
    # documented convention: DESCRIBE with no graph argument covers every
    # graph (resource lookup), unlike bgp_query(graph=None) = default only
    from rdf_mapper_spark.query import describe

    q = _quads(spark, [("s1", "p", "v1")]).unionByName(
        _quads(spark, [("s1", "q", "v2")], g="g1"))
    rows = {(r.g, r.p) for r in describe(q, ["s1"]).collect()}
    assert rows == {(None, "p"), ("g1", "q")}
    rows_g = {(r.g, r.p) for r in describe(q, ["s1"], graph="g1").collect()}
    assert rows_g == {("g1", "q")}
