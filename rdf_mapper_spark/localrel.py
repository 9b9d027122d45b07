"""Driver-row DataFrames without the Python-worker tax.

`SparkSession.createDataFrame(list_of_tuples)` parallelizes PYTHON-
pickled rows: the result is an RDD of pickled batches spread over
defaultParallelism partitions, and EVERY downstream scan — including
every broadcast-exchange build — launches one Python worker round-trip
per partition just to deserialize a dictionary-sized table (measured
~5-7 s executorRunTime per 32-task scan of a 45-row frame on this
host).  The helpers here keep dictionary-sized driver rows in the JVM:

* `local_df(rows <= max_inline)`: one `inline()` over an array of
  literal structs on a single-partition range — a 1-task pure-JVM scan
  (often folded to a LocalTableScan by ConvertToLocalRelation).
* larger `rows`: pandas + Arrow (`createDataFrame(pd.DataFrame(...))`),
  whose scan deserializes Arrow batches JVM-side — no Python workers at
  execution time.  Falls back to the classic path only if pandas is
  unavailable.

Semantics are identical to `createDataFrame(rows, schema)`: same rows,
same schema, same null handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Above this, a literal-struct plan tree costs more to analyze than the
#: Arrow path costs to scan.
MAX_INLINE_ROWS = 512


def _parse_schema(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    if isinstance(schema, str):
        parsed = T._parse_datatype_string(schema)
        if not isinstance(parsed, T.StructType):
            raise TypeError(f"schema string must be a struct: {schema!r}")
        return parsed
    raise TypeError(f"unsupported schema: {schema!r}")


def local_df(spark: SparkSession, rows: list[tuple], schema,
             max_inline: int = MAX_INLINE_ROWS) -> DataFrame:
    """`createDataFrame(rows, schema)` for driver-held scalar rows, with
    a pure-JVM execution plan (see module docstring)."""
    st = _parse_schema(schema)
    one = spark.range(0, 1, 1, 1)
    if not rows:
        null_cols = [F.lit(None).cast(f.dataType).alias(f.name)
                     for f in st.fields]
        return one.select(*null_cols).where(F.lit(False))
    if len(rows) <= max_inline:
        arr = F.array(*[
            F.struct(*[
                (F.lit(None) if v is None else F.lit(v))
                .cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ])
            for row in rows
        ])
        return one.select(F.inline(arr))
    try:
        import pandas as pd

        pdf = pd.DataFrame.from_records(
            rows, columns=[f.name for f in st.fields])
        return spark.createDataFrame(pdf, st)
    except ImportError:  # pragma: no cover - pandas ships with pyspark
        return spark.createDataFrame(rows, st)
