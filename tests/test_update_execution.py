"""EXECUTE the generated SPARQL update/delete scripts against a seeded quad
store and compare the resulting quad sets to the reference goldens
graphs-update.trig / graphs-delete.trig — the reference does the same with
rdflib (test_graphs.py:62-99); here the repo's own Turtle parser + the
test-scale update interpreter (rdf_mapper_spark.update_apply) stand in."""

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.sinks import sparql_delete_script, sparql_update_script
from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.turtle import canonical_quadset, parse_turtle
from rdf_mapper_spark.update_apply import apply_update_script

from tests.conftest import quads_of_df, rows_to_df
from tests.golden_specs import GRAPHS_ROWS, GRAPHS_SPEC
from tests.test_pyeval_goldens import load_golden

# reference test_graphs.py:66-78 _init_test_dataset
_SEED = """
@prefix ex: <http://example.com/> .
ex:base { ex:should_go ex:p 42 . }
ex:current { ex:should_stay ex:p "foo" . }
"""

_NS = {"ex": "http://example.com/",
       "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
       "xsd": "http://www.w3.org/2001/XMLSchema#"}


def _scripts(spark):
    spec = MappingSpec(GRAPHS_SPEC, auto_declare=False)
    engine = MapperEngine(spec)
    q = engine.apply(rows_to_df(spark, GRAPHS_ROWS), file_name="file")
    update = sparql_update_script(q, engine.preserved_graphs, _NS)
    delete = sparql_delete_script(q, engine.preserved_graphs, _NS)
    return update, delete


def test_update_then_delete_executes_to_goldens(spark):
    update, delete = _scripts(spark)
    store = parse_turtle(_SEED)

    # UPDATE: base graph dropped+rewritten, current graph appended
    store = apply_update_script(update, store)
    assert canonical_quadset(store) == canonical_quadset(
        load_golden("graphs-update.trig")
    )

    # DELETE: non-preserved graph dropped, preserved graph's generated
    # quads removed — only the seeded should_stay triple survives
    store = apply_update_script(delete, store)
    assert canonical_quadset(store) == canonical_quadset(
        load_golden("graphs-delete.trig")
    )


def test_update_is_idempotent(spark):
    # set semantics: re-running the update script must not change the store
    update, _ = _scripts(spark)
    store = apply_update_script(update, parse_turtle(_SEED))
    again = apply_update_script(update, store)
    assert canonical_quadset(again) == canonical_quadset(store)
