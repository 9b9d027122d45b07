"""CSV / JSON-lines sources (S1/S2), the mini-example end-to-end slice
(SURVEY §7.1), error accounting (K6) and TriG output."""

import pytest
from pyspark.sql import functions as F

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.sinks import trig_string
from rdf_mapper_spark.sources import read_csv, read_jsonlines, with_row_ordinal
from rdf_mapper_spark.spec import MappingSpec
from rdf_mapper_spark.turtle import canonical_quadset, parse_turtle

from tests.conftest import quads_of_df, rows_to_df

MINI_CSV = "/root/reference/examples/scratch/mini-data.csv"

MINI_SPEC = {
    "namespaces": {"def": "https://epimorphics.com/library/def/"},
    "resources": [{
        "name": "Concept",
        "properties": {
            "@id": "<http://example.com/{$row}>",
            "@type": "<skos:Concept>",
            "<skos:prefLabel>": "{label}",
            "<def:referenceNumber>": "{refno | asInt}",
        },
    }],
}


def test_mini_example_csv_end_to_end(spark):
    """The reference mini-example scenario: CSV scan -> mapping -> quads."""
    df = read_csv(spark, MINI_CSV)
    assert [f.dataType.simpleString() for f in df.schema.fields] == \
        ["string", "string"]  # CSV keeps DictReader all-string semantics
    engine = MapperEngine(MappingSpec(MINI_SPEC, auto_declare=False))
    quads = quads_of_df(engine.apply(df, row_order_col=None))
    # 4 rows x (type + label + refno) = 12 triples
    assert len(quads) == 12
    labels = sorted(q.o.value for q in quads if q.p.endswith("prefLabel"))
    assert labels == ["blue", "green", "red", "yellow"]
    refnos = sorted(q.o.value for q in quads
                    if q.p.endswith("referenceNumber"))
    assert refnos == ["300", "400", "500", "600"]
    assert all(
        q.o.datatype == "http://www.w3.org/2001/XMLSchema#integer"
        for q in quads if q.p.endswith("referenceNumber")
    )
    # row ordinals minted distinct subjects 1..4
    subjects = {q.s.value for q in quads}
    assert subjects == {f"http://example.com/{i}" for i in (1, 2, 3, 4)}


def test_jsonlines_source(spark, tmp_path):
    p = str(tmp_path / "rows.json")
    with open(p, "w") as fh:
        fh.write('{"id": "1", "vals": [{"x": 1}, {"x": 2}], "n": 42}\n')
        fh.write('{"id": "2", "n": 7}\n')
    df = read_jsonlines(spark, p)
    assert df.count() == 2
    assert dict(df.dtypes)["n"] == "bigint"  # JSON types preserved
    assert dict(df.dtypes)["vals"].startswith("array<struct")


def test_row_ordinal_two_phase(spark):
    df = spark.range(0, 1000, 1, 7).select(F.col("id").alias("v"))
    out = with_row_ordinal(df)
    rows = out.select("$row").collect()
    ordinals = sorted(r["$row"] for r in rows)
    assert ordinals == list(range(1, 1001))


def test_required_property_error_accounting(spark):
    spec = MappingSpec({
        "globals": {"$datasetID": "ds"},
        "properties": [{
            "name": "regNo", "prop": "<def:regNo>", "class": "<def:Reg>",
            "required": True,
        }],
        "namespaces": {"def": "http://example.com/def/"},
        "resources": [{
            "name": "T",
            "properties": {
                "@id": "<http://example.com/{id}>",
                ":regNo": "{maybe}",
            },
        }],
    }, auto_declare=False)
    engine = MapperEngine(spec)
    df = rows_to_df(spark, [
        {"id": "1", "maybe": "x"},
        {"id": "2", "maybe": None},
        {"id": "3", "maybe": None},
    ])
    quads = engine.apply(df)
    quads.count()
    counts = engine.count_errors()
    assert sum(counts.values()) == 2, counts
    with pytest.raises(RuntimeError, match="Aborting due to 2 errors"):
        engine.check_abort_on_error()


def test_trig_output(spark):
    from tests.golden_specs import GRAPHS_ROWS, GRAPHS_SPEC

    spec = MappingSpec(GRAPHS_SPEC, auto_declare=False)
    engine = MapperEngine(spec)
    q = engine.apply(rows_to_df(spark, GRAPHS_ROWS), file_name="file")
    trig = trig_string(q, {"ex": "http://example.com/"})
    want = canonical_quadset(parse_turtle(
        open("/root/reference/test/expected/graphs.trig").read()
    ))
    got = canonical_quadset(parse_turtle(trig))
    assert got == want
