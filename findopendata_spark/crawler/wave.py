"""The crawl wave: politeness-scheduled fetch micro-batches over the frontier.

One wave = one deterministic Spark job, the re-expression of the
reference's Celery fan-out (``harvest_datasets.py:16-19`` →
``ckan_crawler.py:278-297`` per-endpoint tasks → per-package → per-resource
tasks). Stage map:

| reference                                   | here                         |
|---------------------------------------------|------------------------------|
| one scroll task per endpoint (serial pages)  | politeness window per host   |
| freshness/seen dict probe (`:255-273`)       | Bloom prefilter + anti-join  |
| HTTP GET + parse (`download.py`, parsers)    | synth fetch `applyInPandas`  |
| upsert registries (`:52-63,214-227`)         | atomic wave commit (catalog) |
| task log lines (`:44-45,131-132`)            | lineage rows per host shard  |

Determinism: the wave clock is the wave id (not wall time); selection
order inside a host is (priority desc, url_canon asc) — the explicit
re-expression of the reference's (endpoint order, page asc, slot asc)
visit ordering (SURVEY §2.5 W4); all content derives from url_hash.

Scale notes (the 1000-executor story):
- frontier and seen are only ever shuffled on ``url_canon`` (dedup) and
  ``host`` (politeness window + fetch groups) — two key spaces, both
  bucket-able in Iceberg for shuffle-free reuse across waves;
- hot-host skew: fetch groups are (host, salt) with
  ``salt = pmod(url_hash, hot_host_salt)``, so one hot host fans across
  executors; the politeness budget cap bounds any group absolutely;
- the Bloom prefilter keeps definite-new URLs (the vast majority in an
  expanding crawl) out of the anti-join shuffle;
- per-wave appends are O(wave delta); no O(total-state) rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from findopendata_spark.catalog import SnapshotCatalog
from findopendata_spark.config import CrawlConfig
from findopendata_spark.crawler import graph as G
from findopendata_spark.crawler.bloom import (
    bloom_size_bits,
    build_bloom,
    with_maybe_seen,
)
from findopendata_spark.functions.urls import canonicalize_url, url_host

FETCH_OUT_SCHEMA = (
    "url_canon string, host string, depth int, doc_id string, "
    "kind string, text string, media_ref string, offset int"
)


@dataclass
class CrawlState:
    cat: SnapshotCatalog
    cfg: CrawlConfig = field(default_factory=CrawlConfig)
    gcfg: G.GraphConfig = field(default_factory=G.GraphConfig)
    # driver-side incremental Bloom cache (rebuilt from tables on resume)
    _bloom: bytes | None = None
    _bloom_m: int = 0
    _seen_count: int = 0


def _shard(col, k: int):
    return F.pmod(F.xxhash64(col), F.lit(k)).cast("int")


def init_state(spark: SparkSession, state: CrawlState) -> None:
    """Wave 0: seeds → frontier + seen; robots table registered."""
    cat, gcfg = state.cat, state.gcfg
    if cat.current_wave() >= 0:
        return
    robots = spark.createDataFrame(G.robots_rows(gcfg))
    seeds = (
        G.seed_frontier(spark, gcfg)
        .join(F.broadcast(robots.select("host", "disallow_prefix")), "host", "left")
        .filter(~_is_blocked_expr())
        .drop("disallow_prefix")
    )
    seeds = seeds.withColumn("url_hash", F.xxhash64("url_canon"))
    frontier = seeds.select(
        "url_canon", "host", "depth", "priority", "discovered_wave", "url_hash"
    )
    seen0 = seeds.select(
        "url_canon", "url_hash", "host", F.lit(0).alias("first_wave")
    ).withColumn("wave", F.lit(0))
    host_state = spark.createDataFrame([], "host string, last_fetch_wave int")
    staged = {
        "frontier": cat.stage(frontier, "frontier", 0),
        "host_state": cat.stage(host_state, "host_state", 0),
        "robots": cat.stage(robots, "robots", 0),
    }
    cat.stage_append(seen0.drop("wave"), "seen", 0)
    cat.commit_wave(0, staged)


def _is_blocked_expr():
    path = F.regexp_extract(F.col("url_canon"), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.col("disallow_prefix").isNotNull() & path.startswith(
        F.col("disallow_prefix")
    )


def _make_fetch_fn(gcfg: G.GraphConfig):
    def fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        """Synthetic fetch of one (host, salt) group — numpy only."""
        h = pdf["url_hash"].to_numpy(np.int64, na_value=0).view(np.uint64)
        doc_idx, kind, text, media_ref, offset = G.synth_fetch_pandas(
            pd.Series(h), pdf["depth"], gcfg
        )
        return pd.DataFrame(
            {
                "url_canon": pdf["url_canon"].to_numpy()[doc_idx],
                "host": pdf["host"].to_numpy()[doc_idx],
                "depth": pdf["depth"].to_numpy()[doc_idx],
                "doc_id": ("doc-" + pd.Series(h).astype(str)).to_numpy()[doc_idx],
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "offset": offset,
            }
        )

    return fetch


def _get_bloom(spark, state: CrawlState, seen: DataFrame):
    """Driver-cached Bloom over the committed seen set.

    Built once (or on resume), then maintained incrementally by
    :func:`run_wave`; rebuilt from the table only when the key count
    outgrows the 4x headroom (keeps fpp ≈ target as the crawl expands).
    """
    cfg = state.cfg
    if (
        state._bloom is None
        or state._seen_count * cfg.bloom_bits_per_key > state._bloom_m
    ):
        n = seen.count()
        m = bloom_size_bits(max(n, 1) * 4, cfg.bloom_bits_per_key)  # 4x headroom
        state._bloom = build_bloom(seen, m, cfg.bloom_num_hashes)
        state._bloom_m = m
        state._seen_count = n
    return state._bloom, state._bloom_m


def run_wave(spark: SparkSession, state: CrawlState, wave: int) -> dict:
    cat, cfg, gcfg = state.cat, state.cfg, state.gcfg
    assert cat.current_wave() == wave - 1, "waves must be sequential"
    shard_k = cfg.host_shards

    frontier = cat.read(spark, "frontier")
    host_state = cat.read(spark, "host_state")
    robots = cat.read(spark, "robots")
    seen = cat.read_appended(spark, "seen").select("url_canon", "url_hash")

    # 1. politeness eligibility: wave clock vs per-host crawl_delay
    f = (
        frontier.join(F.broadcast(robots.select("host", "crawl_delay")), "host", "left")
        .withColumn(
            "crawl_delay", F.coalesce("crawl_delay", F.lit(cfg.default_crawl_delay_s))
        )
        .join(host_state, "host", "left")
    )
    ready = f.filter(
        F.col("last_fetch_wave").isNull()
        | (F.lit(wave) >= F.col("last_fetch_wave") + F.col("crawl_delay"))
    )
    ready.cache()  # reused: selection window + lineage eligible-count

    # 2. per-host selection window (W7/W4): priority desc, url asc, capped
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("url_canon")
    )
    selected = (
        ready.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cfg.per_host_wave_budget)
        .select("url_canon", "host", "depth", "priority", "url_hash")
    )
    selected.cache()  # reused: fetch, frontier anti-join, host_state, lineage

    # 3. fetch: salted (host, salt) groups → flat span rows
    spans = (
        selected.withColumn(
            "salt", F.pmod(F.col("url_hash"), F.lit(cfg.hot_host_salt))
        )
        .groupBy("host", "salt")
        .applyInPandas(_make_fetch_fn(gcfg), FETCH_OUT_SCHEMA)
    )
    spans.cache()  # reused: docs build + link extraction + lineage counts

    # 4. docs table (interleaved input_hint shape), JVM-side assembly
    docs = (
        spans.groupBy("doc_id", "url_canon", "host")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            "url_canon",
            "host",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )

    # 5. link extraction + canonicalization + robots gate (pre-enqueue, the
    #    reference checks before download: ckan_crawler.py:161-176)
    links = (
        spans.filter(F.col("kind") == "link")
        .select(
            canonicalize_url(F.col("text")).alias("url_canon"),
            (F.col("depth") + 1).alias("depth"),
        )
        .withColumn("host", url_host(F.col("url_canon")))
    )
    allowed = (
        links.join(
            F.broadcast(robots.select("host", "disallow_prefix")), "host", "left"
        )
        .filter(~_is_blocked_expr())
        .drop("disallow_prefix")
    )

    # intra-wave dedup: min depth wins (multiple parents)
    cand = (
        allowed.groupBy("url_canon", "host")
        .agg(F.min("depth").alias("depth"))
        .withColumn("priority", F.lit(1.0) / (F.col("depth") + 1))
        .withColumn("url_hash", F.xxhash64("url_canon"))
    )

    # 6. URL-seen dedup: Bloom prefilter → exact anti-join on maybes only
    bloom_bytes, m_bits = _get_bloom(spark, state, seen)
    bc = spark.sparkContext.broadcast(bloom_bytes)
    cand = with_maybe_seen(cand, bc, m_bits, cfg.bloom_num_hashes)
    definite_new = cand.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe_new = (
        cand.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(seen.select("url_canon"), "url_canon", "left_anti")
    )
    new = definite_new.unionByName(maybe_new).withColumn(
        "discovered_wave", F.lit(wave)
    )
    new.cache()

    # 7. next state
    frontier_next = frontier.join(
        selected.select("url_canon"), "url_canon", "left_anti"
    ).unionByName(
        new.select(
            "url_canon", "host", "depth", "priority", "discovered_wave", "url_hash"
        )
    )
    fetched_hosts = (
        selected.select("host").distinct().withColumn("last_fetch_wave", F.lit(wave))
    )
    host_state_next = host_state.join(
        fetched_hosts.select("host"), "host", "left_anti"
    ).unionByName(fetched_hosts)

    new_seen = new.select(
        "url_canon", "url_hash", "host", F.lit(wave).alias("first_wave")
    )

    # 8. lineage per (wave, host_shard) — the per-partition audit rows
    def cnt(df, name):
        return df.groupBy(_shard(F.col("host"), shard_k).alias("host_shard")).agg(
            F.count(F.lit(1)).alias(name)
        )

    lineage = (
        cnt(ready, "urls_eligible")
        .join(cnt(selected, "urls_fetched"), "host_shard", "full")
        .join(cnt(cand, "urls_candidates"), "host_shard", "full")
        .join(cnt(new, "urls_enqueued"), "host_shard", "full")
        .na.fill(0)
        .withColumn(
            "urls_deduped", F.col("urls_candidates") - F.col("urls_enqueued")
        )
    )

    # 9. atomic commit (snapshot tables + per-wave appends, one publish)
    staged = {
        "frontier": cat.stage(frontier_next, "frontier", wave),
        "host_state": cat.stage(host_state_next, "host_state", wave),
    }
    cat.stage_append(new_seen, "seen", wave)
    cat.stage_append(docs, "docs", wave)
    cat.stage_append(lineage, "lineage", wave)
    cat.commit_wave(wave, staged)

    # incremental driver-side Bloom update (avoids full rebuild next wave)
    new_hashes = np.array(
        [r["url_hash"] for r in new.select("url_hash").collect()], dtype=np.int64
    )
    stats = {
        "wave": wave,
        "fetched": selected.count(),
        "enqueued": int(len(new_hashes)),
    }
    if state._bloom is not None and len(new_hashes):
        from findopendata_spark.crawler.bloom import _positions

        bits = np.frombuffer(state._bloom, dtype=np.uint8).copy()
        pos = _positions(
            new_hashes.view(np.uint64), state._bloom_m, cfg.bloom_num_hashes
        ).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        state._bloom = bits.tobytes()
    state._seen_count += len(new_hashes)
    for df in (spans, new, ready, selected):
        df.unpersist()
    stats["frontier"] = cat.read(spark, "frontier").count()
    return stats


def crawl(
    spark: SparkSession,
    state_dir: str,
    waves: int,
    cfg: CrawlConfig | None = None,
    gcfg: G.GraphConfig | None = None,
    log=None,
) -> CrawlState:
    """Driver wave loop with exact resume from the last committed wave."""
    state = CrawlState(
        SnapshotCatalog(state_dir), cfg or CrawlConfig(), gcfg or G.GraphConfig()
    )
    init_state(spark, state)
    start = state.cat.current_wave() + 1
    for wave in range(start, waves + 1):
        stats = run_wave(spark, state, wave)
        if log:
            log(stats)
        if stats["frontier"] == 0:
            break  # politeness gaps can fetch 0 in a wave; only empty ends it
    return state
