"""Replicates the driver's correctness gate locally: every queries() entry
vs its DuckDB oracle at sf=0.01 — row count, column names, and exact
(sorted, order-insensitive) value equality.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries round explicitly; this only canonicalizes -0.0 / int-floats
        return round(v, 9)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


from findopendata_spark.queries import (  # noqa: E402
    DEPRECATED_ORACLE,
    DEPRECATED_QUERIES,
)

QUERY_NAMES = sorted(entry_mod.queries().keys()) + sorted(DEPRECATED_QUERIES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries().get(name) or DEPRECATED_QUERIES[name]
    oracle = entry_mod.oracle_sql().get(name) or DEPRECATED_ORACLE.get(name)
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    assert len(spark_rows) > 0, f"{name}: empty result"
    if oracle is None:
        return  # rows-only check (non-SQL-expressible op)
    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    s_cols, s_rows = _norm_rows(spark_cols, spark_rows)
    d_cols, d_rows = _norm_rows(duck_cols, duck_rows)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
