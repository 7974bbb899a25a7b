"""Tests for enrichment (C6/A8 lazy-model UDF) and scroll pagination (S2-S4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from findopendata_spark.enrichment import VEC_DIM, enrich_titles
from findopendata_spark.sources.scroll import paginate, pages_in_scroll_order


def test_enrich_titles_vectors_and_oov(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a of xx"), (3, None)],
        "id long, title string",
    )
    rows = {r["id"]: r for r in enrich_titles(df).collect()}
    assert len(rows[1]["word_vector"]) == VEC_DIM
    assert rows[1]["oov_count"] == 0
    assert rows[2]["oov_count"] == 3  # 'a','of','xx' all < 3 chars
    assert rows[3]["word_vector"] == [0.0] * VEC_DIM
    # deterministic across runs (per-executor model is stateless)
    rows2 = {r["id"]: r for r in enrich_titles(df).collect()}
    assert rows2[1]["word_vector"] == rows[1]["word_vector"]


def test_paginate_matches_offset_scroll(spark):
    df = spark.createDataFrame(
        [("ep1", i) for i in range(7)] + [("ep2", i) for i in range(3)],
        "endpoint string, rec_id long",
    )
    paged = paginate(df, ["rec_id"], page_size=3, partition_cols=["endpoint"])
    got = {
        (r["endpoint"], r["rec_id"]): (r["page"], r["slot"])
        for r in paged.collect()
    }
    # reference semantics: start += rows, in-page order by the total order
    for ep, n in (("ep1", 7), ("ep2", 3)):
        for k in range(n):
            assert got[(ep, k)] == (k // 3, k % 3)


def test_pages_in_scroll_order(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "rec_id long")
    paged = paginate(df, ["rec_id"], page_size=4)
    seen = []
    for p, page_df in pages_in_scroll_order(paged):
        ids = sorted(r["rec_id"] for r in page_df.collect())
        seen.append((p, ids))
    assert seen == [(0, [0, 1, 2, 3]), (1, [4, 5, 6, 7]), (2, [8, 9])]
