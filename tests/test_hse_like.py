"""Real-world-shaped scenario modeled on the reference HSE example
(examples/hse/templates/hse.yaml): messy column names (trailing colons,
parens, slashes), hash-minted subjects from multiple columns, autoCV with
the implicit $prop scheme name, a plugin parser feeding map_to, backrefs
across resources, and asBoolean coercion."""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.pyfuncs import sha1_b32hex
from rdf_mapper_spark.spec import MappingSpec

from tests.conftest import quads_of_df, rows_to_df

ROWS = [
    {
        "Product Name:": "WeedGone",
        "MAPP (Reg.) Number:": "01234",
        "Formulation Type:": "  emulsion\r\n",
        "Amateur / Professional:": "Professional",
        "Active Substance(s):": "50% glyphosate; 2.5 g/l diquat",
        "Aquatic Use:": "No",
    },
    {
        "Product Name:": "BugAway",
        "MAPP (Reg.) Number:": "05678",
        "Formulation Type:": "granule",
        "Amateur / Professional:": "Amateur",
        "Active Substance(s):": "10% copper",
        "Aquatic Use:": "Yes",
    },
]

SPEC = {
    "globals": {"$datasetID": "hse"},
    "resources": [
        {
            "name": "product",
            # NB: hash(...) params cannot contain ')' — the reference's
            # _HASH_PATTERN ([^)]*) has the same restriction
            # (template_support.py:100), so parenthesized column names like
            # 'MAPP (Reg.) Number:' are referenced via {var} templates only.
            "properties": {
                "@id": "<hash(Product Name:,Aquatic Use:)>",
                "productName": "{Product Name:}",
                "formulation": "{Formulation Type: | trim | autoCV}",
                "usableBy": "{Amateur / Professional: | autoCV}",
                "active-ingredient":
                    "{Active Substance(s): | ingredient_parse | map_to('ingredient')}",
            },
        },
        {
            "name": "registration",
            "properties": {
                "@id": "<hash(Product Name:,'reg')>",
                ":registrationNo": "{ MAPP (Reg.) Number:}",
                "product": "<::product>",
                "aquaticUse": "{Aquatic Use: | asBoolean}",
            },
        },
    ],
    "properties": [
        {"name": "registrationNo", "prop": "<aglib:RegNo>",
         "class": "<aglib:Reg>", "type": "Int"},
    ],
    "namespaces": {"aglib": "https://epimorphics.com/library/def/"},
    "embedded": [
        {"name": "ingredient", "properties": {
            "@id": "<parent>",
            "substance": "{substance}",
            "amount": "{amount}",
        }},
    ],
}


def _register_parser():
    from rdf_mapper_spark.compiler.functions import register_udf

    def ingredient_parse(value: str) -> list[dict]:
        out = []
        for part in value.split(";"):
            amount, _, substance = part.strip().rpartition(" ")
            out.append({"amount": amount, "substance": substance})
        return out

    register_udf(
        "ingredient_parse", ingredient_parse,
        ArrayType(StructType([
            StructField("amount", StringType()),
            StructField("substance", StringType()),
        ])),
    )


def test_hse_like_mapping(spark):
    _register_parser()
    spec = MappingSpec(SPEC, auto_declare=True)
    engine = MapperEngine(spec)
    quads = quads_of_df(engine.apply(rows_to_df(spark, ROWS)))

    base = "https://epimorphics.com/datasets/hse"
    # hash-minted product subject: sha1 over the two column VALUES
    psubj = f"{base}/data/product/{sha1_b32hex('WeedGone', 'No')}"
    names = {q.o.value for q in quads if q.p.endswith("/def/productName")}
    assert names == {"WeedGone", "BugAway"}
    assert any(q.s.value == psubj for q in quads), sorted(
        {q.s.value for q in quads})[:8]

    # autoCV with implicit $prop scheme name -> formulation scheme
    concepts = {q.o.value for q in quads
                if q.p.endswith("/def/formulation")}
    assert concepts == {f"{base}/def/formulation/emulsion",
                        f"{base}/def/formulation/granule"}
    schemes = {q.s.value for q in quads if q.p.endswith("hasTopConcept")}
    assert f"{base}/def/formulation_scheme" in schemes
    assert f"{base}/def/usableBy_scheme" in schemes

    # plugin parser -> embedded ingredients under <parent> IRIs
    substances = {q.o.value for q in quads if q.p.endswith("/def/substance")}
    assert substances == {"glyphosate", "diquat", "copper"}
    ing_subjects = {q.s.value for q in quads
                    if q.p.endswith("/def/substance")}
    assert all("/ingredient/" in s for s in ing_subjects)

    # backref: registration.product points at the product subject
    product_links = {q.o.value for q in quads
                     if q.p.endswith("/def/product")}
    assert psubj in product_links

    # typed prop spec: registrationNo coerced to xsd:integer + class triple
    regnos = {(q.o.value, q.o.datatype) for q in quads
              if q.p == "https://epimorphics.com/library/def/RegNo"}
    assert regnos == {
        ("1234", "http://www.w3.org/2001/XMLSchema#integer"),
        ("5678", "http://www.w3.org/2001/XMLSchema#integer"),
    }
    # asBoolean on 'Aquatic Use:'
    aq = sorted(q.o.value for q in quads if q.p.endswith("/def/aquaticUse"))
    assert aq == ["false", "true"]
