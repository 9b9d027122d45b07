"""Operator-surface tests beyond the goldens: to_entries, expr fast path +
fallback, plugin UDF transformers (T21), reconcile with alias map, sinks."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.sinks import (
    sparql_delete_script,
    sparql_update_script,
    turtle_string,
    write_nquads,
)
from rdf_mapper_spark.turtle import canonical_quadset, parse_nquads, parse_turtle

from tests.conftest import quads_of_df, rows_to_df


def _apply(spark, spec_dict, rows, auto_declare=False, **kw):
    spec = MappingSpec(spec_dict, auto_declare=auto_declare)
    engine = MapperEngine(spec, **kw)
    return engine, engine.apply(rows_to_df(spark, rows), file_name="file")


def _objs(quads, pred_suffix):
    return sorted(
        q.o.value for q in quads if q.p.endswith(pred_suffix)
    )


def test_to_entries_over_map(spark):
    schema = StructType([
        StructField("id", StringType()),
        StructField("attrs",
                    __import__("pyspark.sql.types", fromlist=["MapType"])
                    .MapType(StringType(), StringType())),
    ])
    df = spark.createDataFrame(
        [("1", {"color": "red", "size": "L", "$meta": "x"})], schema
    ).withColumn("$row", F.lit(1).cast("bigint"))
    spec = MappingSpec({
        "resources": [{
            "name": "item",
            "properties": {
                "@id": "<http://example.com/{id}>",
                "attr": "{attrs | to_entries | map_to('kv')}",
            },
        }],
        "embedded": [{
            "name": "kv",
            "pattern": "{$key}={$value}",
        }],
    }, auto_declare=False)
    engine = MapperEngine(spec)
    quads = quads_of_df(engine.apply(df, file_name="file"))
    vals = _objs(quads, "/def/attr")
    assert vals == ["color=red", "size=L"], vals  # $-keys excluded


def test_expr_fast_path_and_fallback(spark):
    rows = [{"id": "1", "v": 3, "s": "y"}]
    # fast path: numeric arithmetic -> typed integer literal
    _, q1 = _apply(spark, {
        "resources": [{"name": "T", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{v | expr('x*5 + 3')}",
        }}]}, rows)
    quads = quads_of_df(q1)
    assert _objs(quads, "/def/p") == ["18"]
    assert [q.o.datatype for q in quads if q.p.endswith("/def/p")] == [
        "http://www.w3.org/2001/XMLSchema#integer"
    ]
    # fallback path: python string semantics via vectorized eval UDF
    eng, q2 = _apply(spark, {
        "resources": [{"name": "T", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{s | expr('x if x == \"y\" else None')}",
        }}]}, rows)
    assert _objs(quads_of_df(q2), "/def/p") == ["y"]
    assert any("fallback" in w for w in eng.warnings)


def test_plugin_udf_transformer(spark):
    """User-registered parser -> array<struct> -> map_to (reference T21,
    the crop-parser pattern)."""
    from rdf_mapper_spark.compiler.functions import register_udf

    def pair_parse(value: str) -> list[dict]:
        out = []
        for part in value.split(";"):
            k, _, v = part.partition("=")
            out.append({"key": k, "val": v})
        return out

    register_udf(
        "pair_parse", pair_parse,
        ArrayType(StructType([
            StructField("key", StringType()), StructField("val", StringType())
        ])),
    )
    rows = [{"id": "1", "raw": "a=1;b=2"}]
    _, q = _apply(spark, {
        "resources": [{"name": "T", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{raw | pair_parse | map_to('kv')}",
        }}],
        "embedded": [{"name": "kv", "pattern": "{key}:{val}"}],
    }, rows)
    assert _objs(quads_of_df(q), "/def/p") == ["a:1", "b:2"]


def test_reconcile_with_alias_map_and_proxy(spark):
    rows = [{"id": "1", "org": "acme"}, {"id": "2", "org": "unknownco"}]
    spec = {
        "globals": {"$datasetID": "ds"},
        "resources": [{"name": "T", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{org | reconcile('orgname')}",
        }}],
    }
    _, q = _apply(spark, spec, rows,
                  alias_map={"acme": "http://kg.example.org/entity/acme"})
    objs = _objs(quads_of_df(q), "/def/p")
    assert objs[0].startswith("http://kg.example.org/entity/acme") or \
        objs[1].startswith("http://kg.example.org/entity/acme")
    # the proxy is rooted at the reconcile NAME arg, not the enclosing
    # resource (reference _create_resource with ResourceSpec(name=name))
    proxies = [o for o in objs if "/data/orgname/" in o]
    assert len(proxies) == 1  # deterministic proxy for the unmatched key


def test_nquads_roundtrip(spark, tmp_path):
    rows = [{"id": "1", "label": "A label with \"quotes\"\nand newline"}]
    _, q = _apply(spark, {
        "resources": [{"name": "T", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{label}@en",
        }}]}, rows)
    out = str(tmp_path / "nq")
    write_nquads(q, out)
    import glob

    text = "".join(open(f).read() for f in glob.glob(f"{out}/part-*"))
    parsed = parse_nquads(text)
    assert canonical_quadset(parsed) == canonical_quadset(quads_of_df(q))


def test_turtle_string_parses_back(spark):
    rows = [{"id": "1", "label": "hello"}]
    _, q = _apply(spark, {
        "resources": [{"name": "T", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{label}",
        }}]}, rows)
    ttl = turtle_string(q, {"def": "https://epimorphics.com/datasets/None/def/"})
    assert canonical_quadset(parse_turtle(ttl)) == \
        canonical_quadset(quads_of_df(q))


def test_update_delete_scripts(spark):
    from tests.golden_specs import GRAPHS_ROWS, GRAPHS_SPEC

    spec = MappingSpec(GRAPHS_SPEC, auto_declare=False)
    engine = MapperEngine(spec)
    q = engine.apply(rows_to_df(spark, GRAPHS_ROWS), file_name="file")
    up = sparql_update_script(q, engine.preserved_graphs,
                              {"ex": "http://example.com/"})
    # non-preserved graph is dropped then inserted; preserved only inserted
    assert "DROP SILENT GRAPH <http://example.com/base> ;" in up
    assert "DROP SILENT GRAPH <http://example.com/current>" not in up
    assert up.count("INSERT DATA {") == 2
    de = sparql_delete_script(q, engine.preserved_graphs,
                              {"ex": "http://example.com/"})
    assert "DROP SILENT GRAPH <http://example.com/base> ;" in de
    assert "DELETE DATA {" in de
    assert "GRAPH <http://example.com/current> {" in de
