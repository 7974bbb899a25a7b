"""Eighth batch: SQL-surface breadth a pipeline user expects —
exact percentiles, sliding-window aggregates, and a scalable AS-OF
join (the operator Spark lacks natively, re-expressed as a
union-and-window merge — shape (b) from the round brief)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q43_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of document length per lang
    (``F.percentile`` = SQL PERCENTILE_CONT semantics; DuckDB twin is
    ``quantile_cont``)."""
    docs = load(spark, sf_dir, "documents")
    pct = F.percentile("n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.element_at(pct, 1), 4).alias("p25"),
            F.round(F.element_at(pct, 2), 4).alias("p50"),
            F.round(F.element_at(pct, 3), 4).alias("p75"),
        )
    )


def q44_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregate: per-user 5-event moving average of
    value (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mavg5"),
    )


def q45_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every order, the latest event in its key bucket
    with ts <= o_orderdate (ties broken by highest event_id).

    Spark has no ASOF JOIN operator; the scalable re-expression is the
    union-and-window merge: tag both sides, sort each key bucket once by
    (ts, side, event_id), and carry the last-seen event struct forward
    with ``last(ignorenulls)`` — one shuffle on the key, no range join,
    no per-order probe. The DuckDB oracle computes the same pairs with
    an explicit ranked range join (its native ASOF JOIN leaves ties
    unspecified, so the oracle ranks deterministically instead).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("key"),
        F.col("ts"),
        F.lit(0).alias("is_order"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(50)).alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
    )
    merged = ev.unionByName(orders)
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "is_order", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn(
        "last_ev",
        F.last(
            F.when(
                F.col("is_order") == 0, F.struct("ts", "event_id")
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        carried.filter(F.col("is_order") == 1)
        .select(
            "o_orderkey",
            "key",
            F.col("last_ev.event_id").alias("last_event_id"),
            F.date_format("last_ev.ts", "yyyy-MM-dd HH:mm:ss").alias(
                "last_event_ts"
            ),
        )
    )


def q46_ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search end-to-end (the scale path q19 only quantizes):
    probe the query's 2 nearest of 8 TRAINED cells (2 Lloyd's
    iterations, VERDICT r02 item 5), exact cosine top-10 within them —
    served from the session-cached centroid + precomputed assignment
    tables (``embedding.ivf_index``), so a probe never rescans or
    reassigns the corpus. Ties broken by (cos desc, id asc), ranking on
    the 4dp-rounded cosine."""
    from findopendata_spark.embedding import ivf_index, ivf_topk

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    idx = ivf_index(spark, sf_dir, n_cells=8, n_iter=2)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    query = emb.orderBy("vec_id").limit(1)
    return ivf_topk(
        emb, query, k=10, n_probe=2,
        centroids=idx["centroids"], assigned=idx["assigned"],
    )


def q47_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id (all four grouping-set combinations; q35
    covers ROLLUP) — Spark's grouping_id() bitmask matches DuckDB's
    GROUPING(a, b)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
            "gid",
        )
    )


def q48_source_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation per group (LISTAGG /
    string_agg shape): deterministic via sort-before-join."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources"
        ),
        F.countDistinct("source").alias("n_sources"),
    )


QUERIES8 = {
    "q43_token_percentiles": q43_token_percentiles,
    "q44_moving_average": q44_moving_average,
    "q45_asof_join": q45_asof_join,
    "q46_ann_ivf_search": q46_ann_ivf_search,
    "q47_cube_revenue": q47_cube_revenue,
    "q48_source_digest": q48_source_digest,
}

ORACLE_SQL8: dict[str, str | None] = {
    "q43_token_percentiles": """
        SELECT lang, count(*) AS n_docs,
               round(quantile_cont(n_chars, 0.25), 4) AS p25,
               round(quantile_cont(n_chars, 0.50), 4) AS p50,
               round(quantile_cont(n_chars, 0.75), 4) AS p75
        FROM documents GROUP BY lang
    """,
    "q44_moving_average": """
        SELECT user_id, event_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mavg5
        FROM events
    """,
    "q45_asof_join": """
        WITH o AS (
            SELECT o_orderkey, o_custkey % 50 AS key, o_orderdate
            FROM orders
        ), e AS (
            SELECT user_id % 50 AS key, ts, event_id FROM events
        ), ranked AS (
            SELECT o.o_orderkey, o.key, e.ts, e.event_id,
                   row_number() OVER (
                       PARTITION BY o.o_orderkey
                       ORDER BY e.ts DESC, e.event_id DESC) AS rn
            FROM o LEFT JOIN e
              ON o.key = e.key AND e.ts <= o.o_orderdate
        )
        SELECT o_orderkey, key,
               event_id AS last_event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_event_ts
        FROM ranked WHERE rn = 1
    """,
    "q46_ann_ivf_search": None,  # filled below (trained-quantizer CTE)
    "q47_cube_revenue": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q48_source_digest": """
        SELECT lang,
               string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
               count(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
}

# q46 oracle: trained quantizer (shared CTE) + probe 2 cells + exact
# top-10 — identical math to ivf_topk over the ivf_index tables.
from findopendata_spark.embedding import ivf_oracle_with as _ivf_with  # noqa: E402

ORACLE_SQL8["q46_ann_ivf_search"] = f"""
    WITH {_ivf_with()},
    q AS (
        SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 1
    ), probe AS (
        SELECT q_id, qv, c_id AS cell FROM (
            SELECT q.q_id, q.qv, c.c_id,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY list_dot_product(q.qv, c.c) /
                                (sqrt(list_dot_product(q.qv, q.qv)) *
                                 sqrt(list_dot_product(c.c, c.c)))
                                DESC, c.c_id ASC) AS rn
            FROM q CROSS JOIN cent c
        ) WHERE rn <= 2
    )
    SELECT q_id AS q_vec_id, vec_id, cos_sim,
           CAST(row_number() OVER (
               ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
    FROM (
        SELECT p.q_id, a.vec_id,
               round(list_dot_product(a.v, p.qv) /
                     (sqrt(list_dot_product(a.v, a.v)) *
                      sqrt(list_dot_product(p.qv, p.qv))), 4) AS cos_sim
        FROM assigned a JOIN probe p ON a.cell = p.cell
        WHERE a.vec_id <> p.q_id
    )
    QUALIFY rank <= 10
"""
