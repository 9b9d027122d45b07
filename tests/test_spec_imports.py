"""Spec imports: YAML merge precedence + python plugin registration
(reference mapper_spec.py:117-166)."""

import os
import textwrap

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.spec import load_spec

from tests.conftest import quads_of_df, rows_to_df


def test_yaml_and_python_imports(spark, tmp_path):
    (tmp_path / "common.yaml").write_text(textwrap.dedent("""
        globals:
          $datasetID: fromimport
          $extra: imported
        namespaces:
          com: http://common.example/
        mappings:
          colours: {red: "<http://common.example/Red>"}
        embedded:
          - name: kv
            pattern: "{k}-{v}"
    """))
    (tmp_path / "plugin.py").write_text(textwrap.dedent("""
        from pyspark.sql.types import (ArrayType, StringType, StructField,
                                       StructType)
        from rdf_mapper_spark.compiler.functions import register_udf

        def kv_parse(value):
            k, _, v = value.partition("=")
            return [{"k": k, "v": v}]

        register_udf("kv_parse", kv_parse, ArrayType(StructType([
            StructField("k", StringType()), StructField("v", StringType())])))
    """))
    (tmp_path / "main.yaml").write_text(textwrap.dedent("""
        globals:
          $datasetID: mainds
        imports:
          - common.yaml
          - plugin.py
        resources:
          - name: thing
            properties:
              "@id": "<com:{id}>"
              "colour": "{c | map_by('colours')}"
              "pair": "{raw | kv_parse | map_to('kv')}"
    """))
    spec = load_spec(str(tmp_path / "main.yaml"), auto_declare=False)
    # importing spec wins on colliding globals; imported-only keys survive
    assert spec.context["$datasetID"] == "mainds"
    assert spec.context["$extra"] == "imported"
    assert spec.namespaces["com"] == "http://common.example/"
    assert "colours" in spec.mappings
    assert "kv" in spec.embedded

    engine = MapperEngine(spec)
    df = rows_to_df(spark, [{"id": "7", "c": "red", "raw": "a=1"}])
    quads = quads_of_df(engine.apply(df))
    objs = {q.p.split("/")[-1]: q.o.value for q in quads}
    assert objs["colour"] == "http://common.example/Red"
    assert objs["pair"] == "a-1"
    subjects = {q.s.value for q in quads}
    assert "http://common.example/7" in subjects
