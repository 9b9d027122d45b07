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


def test_to_entries_over_struct(spark):
    # JSON objects arrive as StructType (spark.read.json shape) —
    # reference to_entries works on any row dict (function.py:176-179)
    df = spark.createDataFrame(
        [("1", ("red", 42))],
        "id string, attrs struct<color:string, size:bigint>",
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
    q = engine.apply(df, file_name="file")
    assert _objs(quads_of_df(q), "/def/attr") == ["color=red", "size=42"]


def test_row_templated_graph(spark):
    # reference expands @graph per row with full context
    # (template_support.py:284-287): rows route to different named graphs
    rows = [{"id": "1", "region": "eu"}, {"id": "2", "region": "us"},
            {"id": "3", "region": "eu"}]
    _, q = _apply(spark, {
        "resources": [{
            "name": "T",
            "@graph": "<http://g.example.org/{region}>",
            "properties": {
                "@id": "<http://example.com/{id}>",
                "p": "{id}",
            },
        }],
    }, rows)
    got = {(x.g, x.s.value) for x in quads_of_df(q)}
    assert got == {
        ("http://g.example.org/eu", "http://example.com/1"),
        ("http://g.example.org/us", "http://example.com/2"),
        ("http://g.example.org/eu", "http://example.com/3"),
    }


def test_row_templated_graph_with_multivalue(spark):
    # array property under a row-templated graph: the __g column must be
    # carried through the array-explode emission path
    rows = [{"id": "1", "region": "eu", "tags": "a b"}]
    _, q = _apply(spark, {
        "resources": [{
            "name": "T",
            "@graph": "<http://g.example.org/{region}>",
            "properties": {
                "@id": "<http://example.com/{id}>",
                "tag": "{tags | split(' ')}",
            },
        }],
    }, rows)
    got = {(x.g, x.o.value) for x in quads_of_df(q)
           if x.p.endswith("/def/tag")}
    assert got == {("http://g.example.org/eu", "a"),
                   ("http://g.example.org/eu", "b")}


def test_unless_null_with_absent_column(spark):
    # absent column counts as 'no value', which SATISFIES unless-null
    # (reference template_support.py:249-259 via state.get -> None)
    rows = [{"id": "1"}, {"id": "2"}]
    _, q = _apply(spark, {
        "resources": [{
            "name": "T",
            "unless": {"ghost": None},
            "properties": {"@id": "<http://example.com/{id}>", "p": "{id}"},
        }],
    }, rows)
    assert _objs(quads_of_df(q), "/def/p") == ["1", "2"]
    # scalar blocked value, absent column: never equal -> keep
    _, q2 = _apply(spark, {
        "resources": [{
            "name": "T",
            "unless": {"ghost": "x"},
            "properties": {"@id": "<http://example.com/{id}>", "p": "{id}"},
        }],
    }, rows)
    assert _objs(quads_of_df(q2), "/def/p") == ["1", "2"]


def test_guard_identity_semantics(spark):
    # the reference gate is `eval(guard) is None or is False` -> skip
    # (IDENTITY, template_support.py:212-218): '' and '0' KEEP the row
    # (a bare string only drops on null), a boolean cast of 'john' (NULL)
    # must not drop it either
    rows = [{"id": "1", "name": "john"}, {"id": "2", "name": ""},
            {"id": "3", "name": None}, {"id": "4", "name": "0"}]
    _, q = _apply(spark, {
        "resources": [{
            "name": "T",
            "guard": "name",
            "properties": {"@id": "<http://example.com/{id}>", "p": "{id}"},
        }],
    }, rows)
    assert _objs(quads_of_df(q), "/def/p") == ["1", "2", "4"]
    # boolean op: `name and n > 2` returns '' (KEEP) when name='' — python
    # `and` returns the falsy OPERAND, and '' is not None/False
    rows2 = [{"id": "1", "name": "john", "n": 3},
             {"id": "2", "name": "ann", "n": 1},
             {"id": "3", "name": "", "n": 1}]
    _, q2 = _apply(spark, {
        "resources": [{
            "name": "T",
            "guard": "name and n > 2",
            "properties": {"@id": "<http://example.com/{id}>", "p": "{id}"},
        }],
    }, rows2)
    assert _objs(quads_of_df(q2), "/def/p") == ["1", "3"]


def test_relative_iri_urljoin_semantics(spark):
    # path-absolute and dot-segment refs resolve like urljoin (reference
    # _make_full_iri; the pyeval oracle does the same)
    from urllib.parse import urljoin

    rows = [{"id": "1", "ref_abs": "/abs/path", "ref_up": "../up/x",
             "ref_dot": "./here"}]
    _, q = _apply(spark, {
        "globals": {"$datasetBase": "http://host.example/ds"},
        "resources": [{
            "name": "T",
            "properties": {
                "@id": "<http://example.com/{id}>",
                "a": "<{ref_abs}>",
                "u": "<{ref_up}>",
                "d": "<{ref_dot}>",
            },
        }],
    }, rows)
    base = "http://host.example/ds/data/T/"
    quads = quads_of_df(q)
    objs = {qq.p.rsplit("/", 1)[-1]: qq.o.value for qq in quads}
    assert objs["a"] == urljoin(base, "/abs/path") == \
        "http://host.example/abs/path"
    assert objs["u"] == urljoin(base, "../up/x") == \
        "http://host.example/ds/data/up/x"
    assert objs["d"] == urljoin(base, "./here") == base + "here"


def test_map_by_miss_counts_as_error(spark):
    # reference: map_by raises per row on a missing mapping; the exception
    # reaches template_processor.log_error and increments error_count
    rows = [{"id": "1", "k": "a"}, {"id": "2", "k": "zzz"}]
    eng, q = _apply(spark, {
        "mappings": {"m": {"a": "<http://example.com/A>"}},
        "resources": [{
            "name": "T",
            "properties": {
                "@id": "<http://example.com/{id}>",
                "p": "{k | map_by('m')}",
            },
        }],
    }, rows)
    assert _objs(quads_of_df(q), "/def/p") == ["http://example.com/A"]
    errs = eng.count_errors()
    assert errs.get("T.map_by(m):no-mapping") == 1, errs
    import pytest

    with pytest.raises(RuntimeError):
        eng.check_abort_on_error()


def test_hash_digest_md5hex_option(spark):
    """MapperEngine(hash_digest="md5hex"): <hash(...)> mints md5-hex IRIs
    (the DuckDB-oracle-checkable option); default stays sha1-base32hex."""
    import hashlib

    spec = {
        "globals": {"$datasetBase": "http://example.com"},
        "resources": [{
            "name": "T",
            "properties": {
                "@id": "<hash(v)>",
                "p": "x",
            },
        }],
    }
    rows = [{"v": "hello"}]
    _, q_md5 = _apply(spark, spec, rows, hash_digest="md5hex")
    subj_md5 = [r.s for r in q_md5.collect()]
    want = hashlib.md5(b"hello").hexdigest()
    assert subj_md5 == [f"http://example.com/data/T/{want}"]
    from rdf_mapper_spark.pyfuncs import sha1_b32hex

    _, q_sha = _apply(spark, spec, rows)
    subj_sha = [r.s for r in q_sha.collect()]
    assert subj_sha == [f"http://example.com/data/T/{sha1_b32hex('hello')}"]


def test_bpe_token_estimate(spark):
    from rdf_mapper_spark.ops.text import bpe_token_estimate

    df = spark.createDataFrame(
        [(1, "Hello world's 42 cats, don't!"), (2, ""), (3, "one")],
        ["id", "t"])
    got = {r.id: r.n for r in df.select(
        "id", bpe_token_estimate(F.col("t")).alias("n")).collect()}
    # Hello | world | 's | 42 | cats | , | don | 't | !
    assert got == {1: 9, 2: 0, 3: 1}


def test_winnow_shared_run_guarantee(spark):
    """Winnowing: documents sharing a run of >= k+w-1 tokens share at
    least one fingerprint; disjoint docs share none."""
    from rdf_mapper_spark.ops.text import winnow_fingerprints

    k, w = 5, 4
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = k+w-1
    docs = spark.createDataFrame([
        (1, "intro words here " + shared + " trailing content one"),
        (2, "completely different prefix " + shared),
        (3, "nothing in common with those other documents at all ok"),
    ], ["doc_id", "t"])
    fps = {r.doc_id: set(r.fps) for r in docs.select(
        "doc_id",
        winnow_fingerprints(F.col("t"), k=k, w=w).alias("fps")).collect()}
    assert fps[1] & fps[2], "shared k+w-1 run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])
    # short docs (< k tokens) produce no fingerprints; k<=len<k+w-1 produce 1
    tiny = spark.createDataFrame([(1, "a b c"), (2, "a b c d e f")],
                                 ["doc_id", "t"])
    tf = {r.doc_id: r.fps for r in tiny.select(
        "doc_id",
        winnow_fingerprints(F.col("t"), k=k, w=w).alias("fps")).collect()}
    assert tf[1] == []
    assert len(tf[2]) == 1


def test_lang_id_ngram_and_ratios(spark):
    from rdf_mapper_spark.ops.text import lang_id_ngram, punct_ratio

    df = spark.createDataFrame([
        (1, "the cat and the dog are sitting for the information"),
        (2, "les questions des unespace ait une eur"),
        (3, "der schnelle und die schoene einung ich den"),
        (4, "zz"),
        (5, "a,b,c!"),
    ], ["id", "t"])
    langs = {r.id: r.l for r in df.select(
        "id", lang_id_ngram(F.col("t")).alias("l")).collect()}
    assert langs[1] == "en" and langs[2] == "fr" and langs[3] == "de"
    assert langs[4] == "und"  # too short for any profile hit
    ratios = {r.id: r.p for r in df.select(
        "id", punct_ratio(F.col("t")).alias("p")).collect()}
    assert ratios[5] == 0.5  # 3 punct chars of 6
    assert ratios[4] == 0.0
