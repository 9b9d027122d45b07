"""Batch driver-contract check: every query in oracle_sql() vs DuckDB,
one Spark session, driver-style canonicalization (sorted cols, sorted
rows, md5 value hash over the pandas CSV form).

Usage: python scripts/check_all.py [sf_dir] [name ...]
"""
import hashlib
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    # normalize dtypes the way value-compare (not dtype-compare) wants
    norm = df.copy()
    for c in norm.columns:
        if str(norm[c].dtype).startswith("float"):
            norm[c] = norm[c].round(6)
        elif str(norm[c].dtype).startswith("datetime"):
            # ns- vs us-resolution timestamps compare unequal in
            # assert_frame_equal even when the instants match
            norm[c] = norm[c].astype(str)
    return norm


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("check_all").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    import pandas as pd

    oracles = entry.oracle_sql()
    queries = entry.queries()
    n_pass = n_fail = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.sql(sql).df()
            a, b = canon(sdf), canon(odf)
            ok_rows = len(a) == len(b)
            ok_cols = list(a.columns) == list(b.columns)
            ok_vals = False
            if ok_rows and ok_cols:
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=False, check_exact=False,
                        rtol=1e-5, atol=1e-8)
                    ok_vals = True
                except AssertionError:
                    ok_vals = False
            status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
            if status == "PASS":
                n_pass += 1
            else:
                n_fail += 1
            print(f"{status} {name:28s} rows={len(a)}/{len(b)} "
                  f"cols_ok={ok_cols} vals_ok={ok_vals} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        except Exception as ex:
            n_fail += 1
            print(f"ERR  {name:28s} {type(ex).__name__}: {ex}"[:200],
                  flush=True)
    print(f"TOTAL pass={n_pass} fail={n_fail}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
