"""Targeted driver-contract check: run one query vs its DuckDB oracle.

Usage: python scripts/check_query.py <query> [sf_dir]
Mirrors the grading driver: sort columns by name, sort rows, hash values.
"""
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("check").getOrCreate()
    )
    sdf = entry.queries()[name](spark, sf_dir).toPandas()
    sql = entry.oracle_sql().get(name)
    if sql is None:
        print(f"{name}: no oracle; spark rows={len(sdf)}")
        return
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    odf = con.sql(sql).df()
    print(f"spark rows={len(sdf)} oracle rows={len(odf)}")
    print(f"spark cols={sorted(sdf.columns)} oracle cols={sorted(odf.columns)}")
    a = sdf[sorted(sdf.columns)].sort_values(
        by=sorted(sdf.columns)).reset_index(drop=True)
    b = odf[sorted(odf.columns)].sort_values(
        by=sorted(odf.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print("ROWS MISMATCH")
        sys.exit(1)
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, rtol=1e-6)
        print("VALUES MATCH")
    except AssertionError as e:
        print("VALUE MISMATCH:", str(e)[:2000])
        print(a.head(10))
        print(b.head(10))
        sys.exit(1)


if __name__ == "__main__":
    main()
