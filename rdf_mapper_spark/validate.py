"""SHACL-lite shape validation over the quad store: the quality gate a
KG pipeline runs before publishing a snapshot.

A shape targets a class (focus nodes = subjects typed with it) and
carries per-property constraints: min_count / max_count, expected
datatype IRI, and a lexical regex pattern.  The validator emits one row
per (focus node, violated constraint) — empty output = conformant
graph, and the row count is the publishable quality metric.

Scale shape: per shape, ONE subject-keyed aggregation computes every
property's count and violation tallies as conditional aggregates with
map-side partials (never one pass per constraint), then a single join
against the focus set — keyed on the same subject column, so AQE reuses
the exchange.  Constraint fan-out happens in a pure-Column
array+filter+explode, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def validate_shapes(quads: DataFrame, shapes: list[dict],
                    graph: str | None = None) -> DataFrame:
    """-> (focus, shape, path, kind, detail) violation rows.

    Each shape: {"name": str, "target_class": IRI, "properties": [
        {"path": IRI, "min_count"?: int, "max_count"?: int,
         "datatype"?: IRI, "pattern"?: regex}, ...]}.

    detail is the observed count (min/max violations) or the number of
    offending values (datatype/pattern violations), as a string.
    """
    g_match = (F.col("g").isNull() if graph is None
               else (F.col("g") == graph))
    outs = []
    for shape in shapes:
        props = shape["properties"]
        focus = (quads.where(g_match & (F.col("p") == RDF_TYPE)
                             & (F.col("o") == shape["target_class"]))
                 .select(F.col("s").alias("focus")).distinct())
        rel = quads.where(
            g_match & F.col("p").isin([c["path"] for c in props]))
        aggs = []
        for i, c in enumerate(props):
            hit = F.col("p") == c["path"]
            aggs.append(F.sum(F.when(hit, 1).otherwise(0))
                        .alias(f"cnt_{i}"))
            if "datatype" in c:
                bad = hit & (F.coalesce(F.col("odt"), F.lit(""))
                             != c["datatype"])
                aggs.append(F.sum(F.when(bad, 1).otherwise(0))
                            .alias(f"dt_{i}"))
            if "pattern" in c:
                bad = hit & ~F.col("o").rlike(c["pattern"])
                aggs.append(F.sum(F.when(bad, 1).otherwise(0))
                            .alias(f"pat_{i}"))
        per_s = rel.groupBy(F.col("s").alias("focus")).agg(*aggs)
        j = focus.join(per_s, "focus", "left")

        def viol(path, kind, detail):
            return F.struct(F.lit(path).alias("path"),
                            F.lit(kind).alias("kind"),
                            detail.cast("string").alias("detail"))

        checks = []
        for i, c in enumerate(props):
            cnt = F.coalesce(F.col(f"cnt_{i}"), F.lit(0))
            if "min_count" in c:
                checks.append(F.when(cnt < c["min_count"],
                                     viol(c["path"], "minCount", cnt)))
            if "max_count" in c:
                checks.append(F.when(cnt > c["max_count"],
                                     viol(c["path"], "maxCount", cnt)))
            if "datatype" in c:
                bad = F.coalesce(F.col(f"dt_{i}"), F.lit(0))
                checks.append(F.when(bad > 0,
                                     viol(c["path"], "datatype", bad)))
            if "pattern" in c:
                bad = F.coalesce(F.col(f"pat_{i}"), F.lit(0))
                checks.append(F.when(bad > 0,
                                     viol(c["path"], "pattern", bad)))
        arr = F.filter(F.array(*checks), lambda x: x.isNotNull())
        outs.append(
            j.select("focus", F.explode(arr).alias("v"))
            .select("focus", F.lit(shape["name"]).alias("shape"),
                    F.col("v.path").alias("path"),
                    F.col("v.kind").alias("kind"),
                    F.col("v.detail").alias("detail"))
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
