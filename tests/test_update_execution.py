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


def test_row_templated_graphadd_preserved_in_executed_update(spark):
    """@graphAdd whose graph IRI is a per-row column: the preserved set is
    derived from the output's distinct g (resolve_preserved_graphs), so the
    executed update APPENDS to those graphs instead of dropping them."""
    spec = MappingSpec({
        "globals": {"$datasetBase": "http://example.com"},
        "resources": [{
            "name": "T",
            "@graphAdd": "<http://example.com/graph/{region}>",
            "properties": {
                "@id": "<http://example.com/{id}>",
                "p": "{v}",
            },
        }],
    }, auto_declare=False)
    engine = MapperEngine(spec)
    q = engine.apply(rows_to_df(spark, [
        {"id": "1", "region": "eu", "v": "a"},
        {"id": "2", "region": "us", "v": "b"},
    ]), file_name="file")
    preserved = engine.resolve_preserved_graphs()
    assert preserved == {"http://example.com/graph/eu",
                         "http://example.com/graph/us"}

    seed = """
@prefix ex: <http://example.com/> .
ex:graph\\/eu { ex:seeded ex:p "keep" . }
ex:other { ex:dropme ex:p "gone" . }
"""
    # seed graphs via explicit IRIs (prefix escaping of '/' is awkward)
    seed = seed.replace("ex:graph\\/eu", "<http://example.com/graph/eu>")
    store = parse_turtle(seed)
    update = sparql_update_script(q, preserved, _NS)
    store = apply_update_script(update, store)

    # hand-built expectation: eu graph = seeded triple + generated triple;
    # us graph = generated triple; non-preserved, non-output 'other' graph
    # is untouched by the update script (only OUTPUT graphs are dropped)
    expected = parse_turtle("""
@prefix ex: <http://example.com/> .
<http://example.com/graph/eu> {
  ex:seeded ex:p "keep" .
  <http://example.com/1> <http://example.com/def/p> "a" .
}
<http://example.com/graph/us> {
  <http://example.com/2> <http://example.com/def/p> "b" .
}
ex:other { ex:dropme ex:p "gone" . }
""")
    assert canonical_quadset(store) == canonical_quadset(expected)
