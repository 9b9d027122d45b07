"""SHACL-lite shape validation."""

from rdf_mapper_spark.validate import RDF_TYPE, validate_shapes

QUAD_SCHEMA = ("g string, sk string, s string, p string, ok string, "
               "o string, odt string, olg string")
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _q(spark, rows):
    return spark.createDataFrame(
        [(None, "iri", s, p, "literal", o, dt, None)
         for s, p, o, dt in rows], QUAD_SCHEMA)


def test_validate_all_constraint_kinds(spark):
    rows = [
        ("e1", RDF_TYPE, "C", None),
        ("e1", "name", "ok-name", None),
        ("e1", "age", "30", XSD_INT),
        ("e2", RDF_TYPE, "C", None),          # missing name -> minCount
        ("e2", "age", "abc", None),           # wrong datatype
        ("e2", "age", "40", XSD_INT),
        ("e2", "age", "50", XSD_INT),         # 3 ages -> maxCount 2
        ("e3", RDF_TYPE, "C", None),
        ("e3", "name", "BAD NAME!", None),    # pattern violation
        ("e3", "age", "7", XSD_INT),
        ("x9", "name", "untyped", None),      # not a focus node
    ]
    shapes = [{
        "name": "CShape", "target_class": "C",
        "properties": [
            {"path": "name", "min_count": 1, "pattern": "^[a-z-]+$"},
            {"path": "age", "max_count": 2, "datatype": XSD_INT},
        ],
    }]
    out = {(r.focus, r.path, r.kind): r.detail
           for r in validate_shapes(_q(spark, rows), shapes).collect()}
    assert out == {
        ("e2", "name", "minCount"): "0",
        ("e2", "age", "maxCount"): "3",
        ("e2", "age", "datatype"): "1",
        ("e3", "name", "pattern"): "1",
    }


def test_validate_conformant_graph_is_empty(spark):
    rows = [("e1", RDF_TYPE, "C", None), ("e1", "name", "fine", None)]
    shapes = [{"name": "S", "target_class": "C",
               "properties": [{"path": "name", "min_count": 1}]}]
    assert validate_shapes(_q(spark, rows), shapes).count() == 0


def test_validate_plan_no_python_no_cartesian(spark):
    rows = [(f"e{i}", RDF_TYPE, "C", None) for i in range(10)] + \
           [(f"e{i}", "name", f"n{i}", None) for i in range(10)]
    shapes = [{"name": "S", "target_class": "C",
               "properties": [{"path": "name", "min_count": 2}]}]
    plan = (validate_shapes(_q(spark, rows), shapes)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
