import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("rdf-mapper-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield session
    session.stop()


def rows_to_df(spark, rows: list[dict], row_numbers: bool = True):
    """Heterogeneous test dicts -> DataFrame with a union schema + $row."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def type_of(v):
        if isinstance(v, bool):
            return StringType()
        if isinstance(v, int):
            return LongType()
        if isinstance(v, float):
            from pyspark.sql.types import DoubleType

            return DoubleType()
        if isinstance(v, list) and v and isinstance(v[0], dict):
            inner = StructType(
                [StructField(k, type_of(x), True) for k, x in v[0].items()]
            )
            return ArrayType(inner)
        if isinstance(v, dict):
            return StructType(
                [StructField(k, type_of(x), True) for k, x in v.items()]
            )
        return StringType()

    fields: dict[str, object] = {}
    for r in rows:
        for k, v in r.items():
            if k not in fields and v is not None:
                fields[k] = type_of(v)
    for r in rows:
        for k in r:
            fields.setdefault(k, StringType())
    schema = StructType(
        [StructField(k, t, True) for k, t in fields.items()]
        + ([StructField("$row", LongType(), False)] if row_numbers else [])
    )

    def tuple_of(r, n):
        vals = []
        for k, t in fields.items():
            v = r.get(k)
            if isinstance(t, ArrayType) and v is not None:
                v = [tuple(d.get(f.name) for f in t.elementType.fields)
                     for d in v]
            elif isinstance(t, StructType) and v is not None:
                v = tuple(v.get(f.name) for f in t.fields)
            vals.append(v)
        if row_numbers:
            vals.append(n)
        return tuple(vals)

    data = [tuple_of(r, i + 1) for i, r in enumerate(rows)]
    return spark.createDataFrame(data, schema)


def quads_of_df(quads_df):
    """Collect a quad DataFrame into terms.Quad objects."""
    from rdf_mapper_spark.terms import Quad, Term

    out = []
    for g, sk, s, p, ok, o, odt, olg in (
        tuple(r) for r in quads_df.select(
            "g", "sk", "s", "p", "ok", "o", "odt", "olg"
        ).collect()
    ):
        out.append(Quad(g, Term(sk, s), p, Term(ok, o, odt, olg)))
    return out
