"""Spark engine vs the reference golden fixtures (the correctness gate).

Every scenario from the reference test-suite runs through the full
compile->DataFrame->quads path and must match the golden Turtle parsed as an
order-insensitive, bnode-isomorphic quad set (BASELINE: P/R >= 0.95; these
assert equality).
"""

import pytest

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.turtle import canonical_quadset

from tests.conftest import quads_of_df, rows_to_df
from tests.golden_specs import GOLDEN_CASES, GRAPHS_ROWS, GRAPHS_SPEC
from tests.test_pyeval_goldens import default_graph_only, load_golden


@pytest.mark.parametrize("case", sorted(GOLDEN_CASES))
def test_engine_matches_golden(spark, case):
    spec_dict, auto_declare, rows, golden = GOLDEN_CASES[case]
    spec = MappingSpec(spec_dict, auto_declare=auto_declare)
    df = rows_to_df(spark, rows)
    engine = MapperEngine(spec)
    quads = quads_of_df(engine.apply(df, file_name="file"))
    got = canonical_quadset(default_graph_only(quads))
    want = canonical_quadset(default_graph_only(load_golden(golden)))
    assert got == want, (
        f"{case}: mismatch\n extra={sorted(map(str, got - want))}\n"
        f" missing={sorted(map(str, want - got))}\n"
        f" warnings={engine.warnings}"
    )


def test_engine_named_graphs(spark):
    spec = MappingSpec(GRAPHS_SPEC, auto_declare=False)
    df = rows_to_df(spark, GRAPHS_ROWS)
    engine = MapperEngine(spec)
    quads = quads_of_df(engine.apply(df, file_name="file"))
    got = canonical_quadset(quads)
    want = canonical_quadset(load_golden("graphs.trig"))
    assert got == want
    assert engine.preserved_graphs == {"http://example.com/current"}
