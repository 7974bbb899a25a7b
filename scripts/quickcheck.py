"""Fast side-by-side check of selected queries vs their DuckDB oracles.

Usage: python scripts/quickcheck.py q16_joinable_column_search q23_simhash ...
Mirrors the driver's compare: sort columns by name, sort rows, compare values.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from findopendata_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names: list[str]) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        try:
            sdf = Q.QUERIES[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            rc = 1
            continue
        sql = Q.ORACLE_SQL.get(name)
        if sql is None:
            print(f"{name}: no oracle ({len(sdf)} spark rows)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            rc = 1
            continue
        s, o = norm(sdf), norm(odf)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
                ok_vals = True
            except AssertionError as e:
                print(f"{name}: VALUE MISMATCH\n{str(e)[:800]}")
        print(
            f"{name}: rows={len(s)}/{len(o)} rows_match={ok_rows} "
            f"cols_match={ok_cols} ({list(s.columns)} vs {list(o.columns)}) "
            f"values_match={ok_vals}"
        )
        if not (ok_rows and ok_cols and ok_vals):
            rc = 1
            print("  spark head:\n", s.head(5).to_string())
            print("  oracle head:\n", o.head(5).to_string())
        # dtype report for hash-artifact debugging
        print("  dtypes spark:", dict(s.dtypes.astype(str)),
              "oracle:", dict(o.dtypes.astype(str)))
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
