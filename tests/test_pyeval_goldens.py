"""Driver-evaluator parity vs the reference golden Turtle fixtures.

Validates (a) the golden Turtle/TriG parser and (b) pyeval, which then serves
as the differential oracle for the Spark compiler tests.
"""

import os

import pytest

from rdf_mapper_spark.pyeval import run_mapping
from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.turtle import canonical_quadset, parse_nquads, parse_turtle

from tests.golden_specs import GOLDEN_CASES, GRAPHS_ROWS, GRAPHS_SPEC

EXPECTED_DIR = "/root/reference/test/expected"


def load_golden(name: str):
    with open(os.path.join(EXPECTED_DIR, name), encoding="utf-8") as fh:
        text = fh.read()
    if name.endswith(".nq"):
        return parse_nquads(text)
    return parse_turtle(text)


def default_graph_only(quads):
    return [q for q in quads if q.g is None]


@pytest.mark.parametrize("case", sorted(GOLDEN_CASES))
def test_pyeval_matches_golden(case):
    spec_dict, auto_declare, rows, golden = GOLDEN_CASES[case]
    spec = MappingSpec(spec_dict, auto_declare=auto_declare)
    state = run_mapping(spec, rows, filename="file")
    got = canonical_quadset(default_graph_only(state.quads))
    want = canonical_quadset(default_graph_only(load_golden(golden)))
    assert got == want, (
        f"{case}: mismatch\n extra={sorted(map(str, got - want))}\n"
        f" missing={sorted(map(str, want - got))}"
    )


def test_pyeval_named_graphs():
    spec = MappingSpec(GRAPHS_SPEC, auto_declare=False)
    state = run_mapping(spec, GRAPHS_ROWS, filename="file")
    got = canonical_quadset(state.quads)
    want = canonical_quadset(load_golden("graphs.trig"))
    assert got == want
    assert state.preserved_graphs == {"http://example.com/current"}
