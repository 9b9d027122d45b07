"""Property-based differential testing: random rows through the driver
evaluator (pyeval) and the Spark compiler must emit identical quad sets.

The two implementations share only the template parser and the scalar
function library — the evaluation strategies are completely different
(per-row interpretation vs compiled Column plans), so agreement on random
inputs is strong evidence for the compiler."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.pyeval import run_mapping
from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.turtle import canonical_quadset

from tests.conftest import quads_of_df, rows_to_df

_SPEC = {
    "globals": {"$datasetID": "diff"},
    "mappings": {"m": {"a": "<http://x/A>", "b": "B-label@en"}},
    "resources": [
        {
            "name": "R",
            "requires": {"id": None},
            "unless": {"skip": "yes"},
            "properties": {
                "@id": "<http://x/{id}>",
                "@type": "<skos:Concept>",
                "plain": "{val}",
                "lang": "{val}@en",
                "typed": "{num | asInt}",
                "slugged": "{val | trim | slug}",
                "split": "{val | splitComma}",
                "mapped": "{tag | map_by('m')}",
                "hashed": "<hash(id,val)>",
                "^<skos:member>": "<http://x/col/{id}>",
            },
        },
        {
            "name": "S",
            "guard": "'num' in locals() and num > 10",
            "properties": {
                "@id": "<http://x/s/{id}>",
                "big": "{num | expr('x*2')}",
            },
        },
    ],
}

_text = st.text(
    alphabet=string.ascii_letters + string.digits + " ,._%/",
    min_size=0, max_size=12,
)
_row = st.fixed_dictionaries({
    "id": st.one_of(st.none(), st.sampled_from(["1", "2", "x9"])),
    "val": st.one_of(st.none(), _text),
    "num": st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    "tag": st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    "skip": st.sampled_from(["yes", "no"]),
})

_spark_ref = {}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=4))
def test_differential_random_rows(spark, rows):
    _spark_ref["s"] = spark
    spec_a = MappingSpec(_SPEC, auto_declare=False)
    state = run_mapping(spec_a, [dict(r) for r in rows], filename="file")
    want = canonical_quadset(state.quads)

    spec_b = MappingSpec(_SPEC, auto_declare=False)
    engine = MapperEngine(spec_b)
    df = rows_to_df(spark, [dict(r) for r in rows])
    got = canonical_quadset(quads_of_df(engine.apply(df, file_name="file")))
    assert got == want, (
        f"\nrows={rows}\n extra={sorted(map(str, got - want))}\n"
        f" missing={sorted(map(str, want - got))}"
    )


_SPEC2 = {
    "globals": {"$datasetBase": "http://host.example/ds"},
    "resources": [
        {
            # round-2 semantics under differential fuzz: row-templated
            # @graph, unless-null over an ABSENT column (must keep rows),
            # python string truthiness for bare-name guards, and urljoin
            # resolution of dot-segment / path-absolute relative refs
            "name": "G",
            "@graph": "<http://g.example/{region}>",
            "unless": {"ghost": None},
            "guard": "name",
            "properties": {
                "@id": "<http://x/{id}>",
                "rel": "<../rel/{id}>",
                "abs": "</abs/{id}>",
                "p": "{name}",
            },
        },
    ],
}

_row2 = st.fixed_dictionaries({
    "id": st.sampled_from(["1", "2", "z"]),
    "region": st.sampled_from(["eu", "us"]),
    "name": st.one_of(st.none(), st.sampled_from(["", "john", "0", "x y"])),
})


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row2, min_size=1, max_size=4))
def test_differential_graphs_guards_urljoin(spark, rows):
    spec_a = MappingSpec(_SPEC2, auto_declare=False)
    state = run_mapping(spec_a, [dict(r) for r in rows], filename="file")
    want = canonical_quadset(state.quads)

    engine = MapperEngine(MappingSpec(_SPEC2, auto_declare=False))
    df = rows_to_df(spark, [dict(r) for r in rows])
    got = canonical_quadset(quads_of_df(engine.apply(df, file_name="file")))
    assert got == want, (
        f"\nrows={rows}\n extra={sorted(map(str, got - want))}\n"
        f" missing={sorted(map(str, want - got))}"
    )


_SPEC3 = {
    "globals": {"$datasetID": "d3"},
    "resources": [
        {
            "name": "N",
            "properties": {
                "@id": "<http://x/n/{id}>",
                # property-value LIST + nested inline resource + autoCV +
                # inverse prop under fuzz
                "multi": ["{a}", "{b}"],
                "nested": {
                    "name": "child",
                    "properties": {
                        "@id": "<parent>",
                        "cv": "{cat | autoCV('cats')}",
                    },
                },
                "^<skos:narrower>": "<http://x/root>",
                "toks": "{a | splitComma | trim}",
            },
        },
    ],
}

_row3 = st.fixed_dictionaries({
    "id": st.sampled_from(["1", "7"]),
    "a": st.one_of(st.none(), st.sampled_from(
        ["x", "p,q", " spaced ", "a,,b", ""])),
    "b": st.one_of(st.none(), st.sampled_from(["B", "c d"])),
    "cat": st.one_of(st.none(), st.sampled_from(["red", "blue", ""])),
})


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row3, min_size=1, max_size=3))
def test_differential_nested_autocv_lists(spark, rows):
    spec_a = MappingSpec(_SPEC3, auto_declare=False)
    state = run_mapping(spec_a, [dict(r) for r in rows], filename="file")
    want = canonical_quadset(state.quads)

    engine = MapperEngine(MappingSpec(_SPEC3, auto_declare=False))
    df = rows_to_df(spark, [dict(r) for r in rows])
    got = canonical_quadset(quads_of_df(engine.apply(df, file_name="file")))
    assert got == want, (
        f"\nrows={rows}\n extra={sorted(map(str, got - want))}\n"
        f" missing={sorted(map(str, want - got))}"
    )


_SPEC4 = {
    "globals": {"$datasetID": "d4"},
    "resources": [
        {
            "name": "L",
            "properties": {
                "@id": "<http://x/l/{id}>",
                # suffix re-parse semantics (#61/#62): lang tags (possibly
                # templated), datatype suffixes, empty-value drops
                "lt": "{val}@en",
                "dyn": "{val}@{lang}",
                "dt": "{val}^^<http://www.w3.org/2001/XMLSchema#token>",
                "plain": "pre-{val}-post",
                "up": "{val | toUpper | trim}",
            },
        },
    ],
}

_row4 = st.fixed_dictionaries({
    "id": st.sampled_from(["1", "2"]),
    "val": st.one_of(st.none(), st.sampled_from(
        ["x", "", "  pad  ", "a@fr", "n^^<http://t>", "multi word"])),
    "lang": st.one_of(st.none(), st.sampled_from(["en", "de", ""])),
})


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row4, min_size=1, max_size=3))
def test_differential_suffix_reparse(spark, rows):
    spec_a = MappingSpec(_SPEC4, auto_declare=False)
    state = run_mapping(spec_a, [dict(r) for r in rows], filename="file")
    want = canonical_quadset(state.quads)

    engine = MapperEngine(MappingSpec(_SPEC4, auto_declare=False))
    df = rows_to_df(spark, [dict(r) for r in rows])
    got = canonical_quadset(quads_of_df(engine.apply(df, file_name="file")))
    assert got == want, (
        f"\nrows={rows}\n extra={sorted(map(str, got - want))}\n"
        f" missing={sorted(map(str, want - got))}"
    )
