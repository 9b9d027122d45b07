"""Input sources and the deterministic row-ordinal operator.

Source parity (reference mapper.py:14-26, 58-63):
  S1 CSV   -> header row, every value a string (csv.DictReader semantics)
  S2 JSONL -> typed nested rows (json.loads semantics)
  S3 pages -> parquet/Iceberg Common-Crawl-style table (BASELINE input_hint)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header; all columns kept as strings to preserve the
    reference's csv.DictReader semantics (no type inference)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


def read_jsonlines(spark: SparkSession, path: str,
                   schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """The web-scale input table (url, warc_ts, html, text, lang)."""
    return spark.read.parquet(path)


def with_row_ordinal(df: DataFrame, order_col: str | None = None,
                     out_col: str = "$row") -> DataFrame:
    """Attach a deterministic 1-based ordinal without a global sort.

    Strategy (SURVEY.md §4.3 row-ordinal row):
      * ``order_col`` given  -> row_number() over that ordering (single
        window; only correct/cheap at test scale or per small partition).
      * otherwise -> two-phase partition-offset ordinal: count rows per
        input partition (one tiny aggregation), broadcast the cumulative
        offsets, and add each row's within-partition index. Scales linearly:
        no global shuffle, no single-reducer sort; deterministic for a
        stable source partition order (parquet file order is stable).

    At true web scale prefer content-keyed identity (url/content hash) over
    ordinals entirely — ordinals exist for reference parity ($row, <row>).
    """
    if order_col is not None:
        w = Window.orderBy(F.col(order_col))
        return df.withColumn(out_col, F.row_number().over(w))

    with_pid = df.withColumn("__pid", F.spark_partition_id()) \
                 .withColumn("__mid", F.monotonically_increasing_id())
    # local index: monotonically_increasing_id = (pid << 33) + local index
    local_idx = F.col("__mid") - (F.col("__pid").cast("bigint") * F.lit(1 << 33))
    counts = (
        with_pid.groupBy("__pid").count().collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        ordinal = mapping[F.col("__pid")] + local_idx + F.lit(1)
    else:
        ordinal = local_idx + F.lit(1)
    return with_pid.withColumn(out_col, ordinal.cast("bigint")) \
                   .drop("__pid", "__mid")
