"""Fourth batch of driver-contract queries: serving-path / join-chain /
schema-inference / JSON operators (SURVEY §2.1 S15, §2.3 J4, §2.5 W2,
§2.7 C12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from findopendata_spark.text_analysis import tokens


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_Q29_TERMS = ("data", "table", "query", "spark")


def q29_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search with BM25-lite ranking (W2 — the reference's FTS
    ``ts_rank_cd`` cover-density rank, ``apiserver/main.py:128-166``),
    top-20.

    score = Σ_t  tf_t/(tf_t + 1.2) · ln(1 + (N - df_t + 0.5)/(df_t + 0.5))

    — the classic BM25 term-frequency saturation × Robertson idf (no
    length norm; the corpus is near-constant length). Document
    frequencies come from one corpus aggregate; the DuckDB oracle
    recomputes the identical quantities, so the score is exact on both
    sides (round 4dp)."""
    docs = load(spark, sf_dir, "documents")
    return bm25_rank(docs, _Q29_TERMS, limit=20)


def bm25_rank(
    docs: DataFrame,
    terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    limit: int = 20,
) -> DataFrame:
    """BM25-lite ranking kernel (shared by q29 and the serving layer).

    r06 shape: ONE tokenize+explode pass computes every per-doc term
    frequency as a codegen'd hash aggregate (`sum(when(tok = t))`), and
    both the document-frequency stats and the score read those counts.
    The r05 plan evaluated `size(filter(toks, x == t))` per term per row
    TWICE (stats pass + scoring pass) — ArrayFilter is CodegenFallback,
    so that was 2 x |terms| interpreted passes over every token array
    (measured 4.7 s at sf1.0; this shape is ~1.5 s). Docs containing no
    query term score exactly +0.0 (every term contributes sat = 0.0) and
    are dropped by the score > 0 gate on both shapes, so aggregating
    hits-only is result-identical; the score expression folds terms in
    the same order with the same arithmetic."""
    terms = list(dict.fromkeys(terms))  # unique, order-preserving
    if not terms:
        return docs.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).limit(0)
    from findopendata_spark.dedup import spread_scan

    toks = tokens(F.col(text_col))
    cnts = (
        # spread the single-row-group docs scan so the tokenize+explode
        # +partial-agg stage parallelizes (guide §2.5)
        spread_scan(docs, [id_col, text_col])
        .select(F.col(id_col), F.explode(toks).alias("_tok"))
        .filter(F.col("_tok").isin(terms))
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.when(F.col("_tok") == t, 1).otherwise(0)).alias(
                    f"tf_{i}"
                )
                for i, t in enumerate(terms)
            ]
        )
    )
    from findopendata_spark.dedup import ensure_cached
    ensure_cached(cnts)  # reused: df stats + scoring (hits-only, small)
    n = float(docs.count())
    stats = cnts.agg(
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))],
    ).collect()[0]
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        df_t = float(stats[f"df_{i}"] or 0)
        idf = F.log(F.lit(1.0 + (n - df_t + 0.5) / (df_t + 0.5)))
        tf_c = F.col(f"tf_{i}")
        sat = tf_c.cast("double") / (tf_c + F.lit(1.2))
        score = score + sat * idf
    return (
        cnts.select(F.col(id_col), F.round(score, 4).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(limit)
    )


def q30_region_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way fk join chain (J4-shape, ``apiserver/main.py:210-254``):
    lineitem⋈orders⋈customer⋈nation⋈region⋈part, one-region filter
    pushed below the joins, broadcast dims."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load(spark, sf_dir, "part")
    # r06 (guide §3.1): propagate the one-region filter UP the fk chain
    # as broadcasts instead of shuffling lineitem⋈orders. Every dim join
    # here is a key-unique fk lookup used only as a filter (no dim
    # columns survive to the output), so region→nation→customer→orders
    # reduce to key lists that stay broadcast-sized (orders keys ≈ 1/|R|
    # of orders), and lineitem is never shuffled at all — its only wide
    # operation is the 25-group final aggregate. Same join semantics:
    # key-unique inner fk joins neither duplicate nor drop beyond the
    # filter, so the aggregated multiset is identical.
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    asia_cust = customer.join(
        F.broadcast(asia_nations),
        customer.c_nationkey == asia_nations.n_nationkey,
    ).select("c_custkey")
    asia_orders = orders.join(
        F.broadcast(asia_cust), orders.o_custkey == asia_cust.c_custkey
    ).select("o_orderkey")
    return (
        li.join(F.broadcast(asia_orders), li.l_orderkey == asia_orders.o_orderkey)
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q31_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded schema inference (S15, ``parsers/avro.py:83-113``): per
    column over a 25k-record head, infer {long, double, string} + a
    nullable union flag — the genson fold as one hash-agg."""
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(25_000)
    rec = docs.selectExpr(
        "stack(3, 'lang', lang, 'n_chars', cast(n_chars as string), "
        "'doc_id', cast(doc_id as string)) as (column_name, val)"
    )
    return rec.groupBy("column_name").agg(
        F.when(
            F.sum(F.when(F.col("val").try_cast("long").isNull()
                         & F.col("val").isNotNull(), 1).otherwise(0)) == 0,
            "long",
        )
        .when(
            F.sum(F.when(F.col("val").try_cast("double").isNull()
                         & F.col("val").isNotNull(), 1).otherwise(0)) == 0,
            "double",
        )
        .otherwise("string")
        .alias("inferred_type"),
        (F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)) > 0).alias("nullable"),
    )


def q32_resource_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-manifest shape (S17, ``sql/export_column_sketches.sql``):
    per (source, lang) roll-up with keys for a JSONL dump."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.sum("n_chars").alias("total_chars"),
    )


def q33_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field pulls with defaults (C12, ``metadata.py:48-67``):
    extract props.k, bucket it, aggregate."""
    from findopendata_spark.dedup import spread_scan

    # spread the single-row-group events scan: the per-row JSON parse
    # otherwise runs on one task (guide §2.5)
    ev = spread_scan(load(spark, sf_dir, "events"), ["event_type", "props"])
    k = F.coalesce(
        F.get_json_object("props", "$.k").try_cast("long"), F.lit(-1)
    )
    # project the JSON pull ONCE: with `k` inlined in both k_bucket and
    # avg(k), the plan parsed every props payload twice per row (no CSE
    # across the aggregate boundary) — measured 3.5 s -> ~2 s at sf1.0
    return (
        ev.select("event_type", k.alias("_k"))
        .withColumn("k_bucket", F.floor(F.col("_k") / 10).cast("long"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("_k"), 4).alias("avg_k"),
        )
    )


QUERIES4 = {
    "q29_keyword_search": q29_keyword_search,
    "q30_region_brand_revenue": q30_region_brand_revenue,
    "q31_schema_inference": q31_schema_inference,
    "q32_resource_export": q32_resource_export,
    "q33_json_props": q33_json_props,
}

ORACLE_SQL4: dict[str, str | None] = {
    "q29_keyword_search": """
        WITH tf AS (
            SELECT doc_id,
                   """ + ", ".join(
                       f"len(list_filter(string_split_regex(lower(trim(text)), "
                       f"'\\s+'), x -> x = '{t}')) AS tf_{t}"
                       for t in _Q29_TERMS
                   ) + """
            FROM documents
        ), stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   """ + ", ".join(
                       f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) "
                       f"AS DOUBLE) AS df_{t}"
                       for t in _Q29_TERMS
                   ) + """
            FROM tf
        )
        SELECT doc_id, round(
            """ + " + ".join(
                f"(CAST(tf_{t} AS DOUBLE) / (tf_{t} + 1.2)) * "
                f"ln(1 + (n - df_{t} + 0.5) / (df_{t} + 0.5))"
                for t in _Q29_TERMS
            ) + """, 4) AS score
        FROM tf CROSS JOIN stats
        WHERE round(
            """ + " + ".join(
                f"(CAST(tf_{t} AS DOUBLE) / (tf_{t} + 1.2)) * "
                f"ln(1 + (n - df_{t} + 0.5) / (df_{t} + 0.5))"
                for t in _Q29_TERMS
            ) + """, 4) > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    """,
    "q30_region_brand_revenue": """
        SELECT p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q31_schema_inference": """
        WITH head AS (
            SELECT * FROM documents ORDER BY doc_id LIMIT 25000
        ), rec AS (
            SELECT 'lang' AS column_name, lang AS val FROM head
            UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM head
            UNION ALL SELECT 'doc_id', CAST(doc_id AS VARCHAR) FROM head
        )
        SELECT column_name,
               CASE WHEN sum(CASE WHEN try_cast(val AS BIGINT) IS NULL
                                   AND val IS NOT NULL THEN 1 ELSE 0 END) = 0
                    THEN 'long'
                    WHEN sum(CASE WHEN try_cast(val AS DOUBLE) IS NULL
                                   AND val IS NOT NULL THEN 1 ELSE 0 END) = 0
                    THEN 'double'
                    ELSE 'string' END AS inferred_type,
               (sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) > 0) AS nullable
        FROM rec GROUP BY column_name
    """,
    "q32_resource_export": """
        SELECT source, lang, count(*) AS n_docs, min(doc_id) AS first_doc,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source, lang
    """,
    "q33_json_props": """
        SELECT event_type,
               CAST(floor(coalesce(try_cast(json_extract_string(props, '$.k')
                                            AS BIGINT), -1) / 10) AS BIGINT)
                   AS k_bucket,
               count(*) AS cnt,
               round(avg(coalesce(try_cast(json_extract_string(props, '$.k')
                                           AS BIGINT), -1)), 4) AS avg_k
        FROM events GROUP BY event_type, k_bucket
    """,
}
