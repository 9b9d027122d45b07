"""The quad DataFrame: the engine's universal intermediate representation.

Schema (flat columns shuffle/dedup-friendlier than nested structs — the
dedup key is the whole row, and Tungsten handles flat UnsafeRows best):

    g   string  graph IRI; NULL = default graph
    sk  string  subject kind: 'iri' | 'bnode'
    s   string  subject IRI / blank-node label
    p   string  predicate IRI
    ok  string  object kind: 'iri' | 'bnode' | 'literal'
    o   string  object IRI / bnode label / literal lexical form
    odt string  literal datatype IRI (NULL for plain / lang strings)
    olg string  literal language tag (NULL unless lang-tagged)

RDF graphs are sets (reference relies on rdflib Graph.add absorbing
duplicates, template_state.py:118-120) — `dedup_quads` enforces that with a
two-phase salted distinct so a handful of hot (s,p) pairs (popular entities /
predicates, the north rule's explicit skew case) cannot pin a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

QUAD_FIELDS = ["g", "sk", "s", "p", "ok", "o", "odt", "olg"]


def quad_schema() -> StructType:
    return StructType([StructField(f, StringType(), True) for f in QUAD_FIELDS])


def empty_quads(spark: SparkSession) -> DataFrame:
    from .localrel import local_df

    return local_df(spark, [], quad_schema())


def quads_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Driver-side constant quads (one-offs, auto-declared vocabulary).
    Pure-JVM relation — see localrel module docstring."""
    from .localrel import local_df

    return local_df(spark, rows, quad_schema())


def union_quads(dfs: list[DataFrame]) -> DataFrame:
    it = iter(dfs)
    out = next(it)
    for df in it:
        out = out.unionByName(df)
    return out


def dedup_quads(quads: DataFrame, salt: int = 0) -> DataFrame:
    """Set semantics over quads.

    With AQE enabled plain dropDuplicates already splits skewed partitions at
    runtime; `salt > 0` additionally forces a two-phase pre-aggregation:
    partial distinct on (quad, salt-bucket) then final distinct, which bounds
    any single task's input even for a quad repeated billions of times.
    """
    if salt > 0:
        salted = quads.withColumn(
            "_salt", F.pmod(F.xxhash64(F.spark_partition_id()), F.lit(salt))
        )
        partial = salted.dropDuplicates(QUAD_FIELDS + ["_salt"]).drop("_salt")
        return partial.dropDuplicates(QUAD_FIELDS)
    return quads.dropDuplicates(QUAD_FIELDS)


# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------
def _escape_col(c: Column) -> Column:
    """N-Triples string escaping, JVM-side."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def term_ntriples(kind: Column, value: Column, dt: Column, lg: Column) -> Column:
    """Render one term in N-Triples syntax as a Column (pure JVM expressions)."""
    lit_body = F.concat(F.lit('"'), _escape_col(value), F.lit('"'))
    lit_full = (
        F.when(lg.isNotNull(), F.concat(lit_body, F.lit("@"), lg))
        .when(dt.isNotNull(), F.concat(lit_body, F.lit("^^<"), dt, F.lit(">")))
        .otherwise(lit_body)
    )
    return (
        F.when(kind == "iri", F.concat(F.lit("<"), value, F.lit(">")))
        .when(kind == "bnode", F.concat(F.lit("_:"), value))
        .otherwise(lit_full)
    )


def nquads_lines(quads: DataFrame) -> DataFrame:
    """One N-Quads line per quad — embarrassingly parallel text sink.

    Reference K2 sink (template_processor.py:131-133); at 100 TB this is the
    production serialization path: `nquads_lines(df).write.text(path)`.
    """
    subj = term_ntriples(F.col("sk"), F.col("s"), F.lit(None), F.lit(None))
    pred = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    obj = term_ntriples(F.col("ok"), F.col("o"), F.col("odt"), F.col("olg"))
    graph_part = F.when(
        F.col("g").isNotNull() & (F.col("g") != F.lit(DEFAULT_GRAPH)),
        F.concat(F.lit(" <"), F.col("g"), F.lit(">")),
    ).otherwise(F.lit(""))
    line = F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, graph_part, F.lit(" ."))
    return quads.select(line.alias("value"))


DEFAULT_GRAPH = "urn:x-rdflib:default"


def collect_quads(quads: DataFrame) -> list[tuple]:
    """Driver-side collect as plain tuples — TEST SCALE ONLY."""
    return [tuple(r) for r in quads.select(*QUAD_FIELDS).collect()]
