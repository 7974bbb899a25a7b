"""Column-sketch dataflow: one pass over long-form records → sketch rows.

Reference lifecycle (SURVEY §3.3): ``indexing.py:59-192`` streams ≤1M
records per file through ``TableSketch.update`` →
``ColumnSketch.update`` (``column_sketch.py:166-197``) and upserts one
row per (file, column) into ``column_sketches``
(``sql/create_sketch_tables.sql:13-51``).

Spark re-expression — three shuffles, no per-row Python:

1. **normalize + hash (JVM)**: ``lower(trim(val))`` (C1), empty/numeric
   flags (F5/F6), murmur3-32 + xxhash64 of the normalized value. SQL
   NULLs become the string ``"null"`` exactly like the reference's
   ``json.dumps(None)`` (``column_sketch.py:171-172``).
2. **partial sketch** (``applyInPandas`` over (file, col, salt)): numpy
   MinHash partial (K=256, seed 43 permutation table) + HLL registers.
   The salt bounds group size, so no single Python task ever holds a
   whole hot column — the same treatment the crawler gives hot hosts.
3. **final merge** (``applyInPandas`` over (file, col)): elementwise
   min/max of the partials + HLL estimate.
4. **counters + ordered sample (JVM)**: hash-agg counters; first-N
   distinct values in arrival order via two windows over ``ingest_key``
   (the reference's sample is a set filled in arrival order,
   ``column_sketch.py:181-183`` — order keys make that reproducible,
   SURVEY §7 hard-parts list).

Output column names mirror ``create_sketch_tables.sql:13-51``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from findopendata_spark.config import SketchConfig
from findopendata_spark.sketch.hll import M as HLL_M
from findopendata_spark.sketch.hll import hll_count, hll_partial
from findopendata_spark.sketch.minhash import MinHashPermutations, minhash_partial

_PARTIAL_SCHEMA = (
    "file_id string, column_name string, n long, "
    "minhash array<long>, hll array<long>"
)
_FINAL_SCHEMA = (
    "file_id string, column_name string, sketch_count long, "
    "minhash array<long>, hyperloglog array<long>, hll_estimate double"
)


def _partial_fn(cfg: SketchConfig):
    perms = MinHashPermutations(cfg.minhash_size, cfg.minhash_seed)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        mh = minhash_partial(pdf["h32"].to_numpy(np.int64), perms)
        hl = hll_partial(pdf["h64"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "file_id": [pdf["file_id"].iloc[0]],
                "column_name": [pdf["column_name"].iloc[0]],
                "n": [len(pdf)],
                "minhash": [mh.astype(np.int64)],
                "hll": [hl],
            }
        )

    return fn


def _final_fn(cfg: SketchConfig):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        mh = np.minimum.reduce(
            [np.asarray(v, dtype=np.uint64) for v in pdf["minhash"]]
        )
        hl = np.maximum.reduce([np.asarray(v, dtype=np.int64) for v in pdf["hll"]])
        return pd.DataFrame(
            {
                "file_id": [pdf["file_id"].iloc[0]],
                "column_name": [pdf["column_name"].iloc[0]],
                "sketch_count": [int(pdf["n"].sum())],
                "minhash": [mh.astype(np.int64)],
                "hyperloglog": [hl],
                "hll_estimate": [hll_count(hl)],
            }
        )

    return fn


_WV_PARTIAL_SCHEMA = (
    "file_id string, column_name string, sum_vec array<double>, "
    "n_invocab long, n_oov long"
)


def _wv_partial_fn():
    """Per-(file, col, salt) word-vector partial: sum of per-value
    sum-vectors + in-vocab/oov value counts (reference
    ``column_sketch.py:188-197``: a value with no in-vocabulary token
    increments oov, otherwise its token-vector sum joins the running
    sum). Model = the lazy per-executor singleton from enrichment.py."""
    from findopendata_spark.enrichment import VEC_DIM, _load_model

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        model = _load_model()
        if hasattr(model, "_token_vectors"):
            # stub path: one flat token explode per group, segment flags
            tok_lists = pdf["v"].str.split()
            lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
            n = len(pdf)
            acc = np.zeros(VEC_DIM, dtype=np.float64)
            n_in = n_oov = 0
            if lens.sum():
                flat = np.concatenate(
                    [np.asarray(t, dtype=object) for t in tok_lists]
                )
                vecs, ok = model._token_vectors(flat)
                acc = vecs.astype(np.float64).sum(axis=0)
                row_of = np.repeat(np.arange(n), lens)
                has_in = np.zeros(n, dtype=bool)
                has_in[row_of[ok]] = True
                n_in = int(has_in.sum())
                n_oov = n - n_in
            else:
                n_oov = n
        else:  # real model: per-value docs   # pragma: no cover
            acc = np.zeros(VEC_DIM, dtype=np.float64)
            n_in = n_oov = 0
            for v in pdf["v"]:
                vecs, _tok_oov = model.vectors(v.split())
                if len(vecs):
                    acc += vecs.sum(axis=0)
                    n_in += 1
                else:
                    n_oov += 1
        return pd.DataFrame(
            {
                "file_id": [pdf["file_id"].iloc[0]],
                "column_name": [pdf["column_name"].iloc[0]],
                "sum_vec": [acc],
                "n_invocab": [n_in],
                "n_oov": [n_oov],
            }
        )

    return fn


def _wv_name_vector(names: pd.Series) -> pd.Series:
    """word_vector_column_name: SUM of the column name's token vectors,
    None when no token is in vocabulary (``column_sketch.py:127-135``)."""
    from findopendata_spark.enrichment import _load_model

    model = _load_model()
    out = []
    for name in names:
        vecs, _ = model.vectors(str(name).lower().split())
        out.append([float(x) for x in vecs.sum(axis=0)] if len(vecs) else None)
    return pd.Series(out)


def sketch_columns(
    records: DataFrame,
    cfg: SketchConfig | None = None,
    n_salts: int = 16,
    keep_merge_state: bool = False,
) -> DataFrame:
    """records(file_id, column_name, ingest_key, val) → one sketch row per
    (file_id, column_name), reference-rule semantics throughout.

    ``keep_merge_state`` additionally emits the raw mergeable word-vector
    accumulators (``wv_n_in``, ``wv_sum_vec``) so per-wave sketch rows can
    be combined EXACTLY by :func:`findopendata_spark.indexing.merge_sketch_rows`
    (``word_vector_data`` alone loses the sum/count split to float
    division, which would break bit-parity with a full rebuild)."""
    cfg = cfg or SketchConfig()

    # 1. normalize + flags + hashes, all JVM-side
    norm = F.lower(F.trim(F.coalesce(F.col("val"), F.lit("null"))))
    r = records.select(
        "file_id",
        "column_name",
        "ingest_key",
        norm.alias("v"),
    ).withColumns(
        {
            "is_empty": F.length("v") == 0,
            # try_cast: ANSI mode (Spark 4 default) makes plain cast throw
            "is_numeric": F.col("v").try_cast("double").isNotNull(),
        }
    )
    # ensure_cached: repeated invocations (the bench's best-of-2 per
    # query) rebuild an identical plan; the guard keeps CacheManager
    # reuse without its "already cached" warning per rerun
    from findopendata_spark.dedup import ensure_cached

    ensure_cached(r)

    # 4a. counters (reference properties: column_sketch.py:72-117)
    counters = r.groupBy("file_id", "column_name").agg(
        F.count(F.lit(1)).alias("count"),
        F.sum(F.col("is_empty").cast("long")).alias("empty_count"),
        F.sum(
            (F.col("is_numeric") & ~F.col("is_empty")).cast("long")
        ).alias("numeric_count"),
    )

    nonempty = r.filter(~F.col("is_empty")).withColumns(
        {"h32": F.hash("v"), "h64": F.xxhash64("v")}
    )

    # 2-3. partial+final sketches
    partials = (
        nonempty.withColumn("_salt", F.pmod(F.col("h64"), F.lit(n_salts)))
        .groupBy("file_id", "column_name", "_salt")
        .applyInPandas(_partial_fn(cfg), _PARTIAL_SCHEMA)
    )
    sketches = partials.groupBy("file_id", "column_name").applyInPandas(
        _final_fn(cfg), _FINAL_SCHEMA
    )

    # 4b. first-N distinct values in arrival order (A6). First occurrence
    # per value = min(ingest_key) over (file, col, v) — identical to the
    # r05 row_number()==1 window but as a HASH aggregate: the map-side
    # partial agg collapses duplicate values before the exchange and no
    # full-record sort happens (guide §2.3 "aggregate before you
    # shuffle"); only the distinct set pays the rank window's sort.
    w_rank = Window.partitionBy("file_id", "column_name").orderBy("_k")
    firsts = (
        r.filter(~F.col("is_empty"))
        .groupBy("file_id", "column_name", "v")
        .agg(F.min("ingest_key").alias("_k"))
        .withColumn("_rank", F.row_number().over(w_rank))
        .filter(F.col("_rank") <= cfg.column_sample_size)
    )
    samples = firsts.groupBy("file_id", "column_name").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_rank", "v"))),
            lambda s: s["v"],
        ).alias("sample")
    )

    out = (
        counters.join(samples, ["file_id", "column_name"], "left")
        .join(sketches, ["file_id", "column_name"], "left")
        .withColumn(
            "sample", F.coalesce("sample", F.array().cast("array<string>"))
        )
        # distinct-count rule, column_sketch.py:119-125
        .withColumn(
            "distinct_count",
            F.when(
                F.size("sample") < cfg.column_sample_size,
                F.size("sample").cast("long"),
            ).otherwise(
                F.greatest(
                    F.size("sample").cast("long"),
                    F.round("hll_estimate").cast("long"),
                )
            ),
        )
        # is_numeric rule (>=50% of non-empty), column_sketch.py:111-117
        .withColumn(
            "is_numeric",
            F.when(F.col("count") - F.col("empty_count") == 0, F.lit(False))
            .otherwise(
                F.col("numeric_count")
                >= 0.5 * (F.col("count") - F.col("empty_count"))
            ),
        )
        .withColumn("seed", F.lit(cfg.minhash_seed).cast("long"))
    )

    # word-vector fields (A8, create_sketch_tables.sql:27-48):
    # word_vector_column_name always; word_vector_data + oov accounting
    # only behind enable_word_vector_data (configs-example.yaml:62)
    name_vec = F.pandas_udf(_wv_name_vector, "array<double>")
    out = out.withColumn(
        "word_vector_column_name", name_vec(F.col("column_name"))
    )
    if cfg.enable_word_vector_data:
        wv_partials = (
            nonempty.withColumn("_salt", F.pmod(F.col("h64"), F.lit(n_salts)))
            .groupBy("file_id", "column_name", "_salt")
            .applyInPandas(_wv_partial_fn(), _WV_PARTIAL_SCHEMA)
        )
        wv = wv_partials.groupBy("file_id", "column_name").agg(
            F.sum("n_invocab").alias("_n_in"),
            F.sum("n_oov").alias("out_of_vocabulary_count"),
            F.array(
                *[
                    F.sum(F.element_at("sum_vec", i + 1))
                    for i in range(_wv_dim())
                ]
            ).alias("_sum_vec"),
        )
        out = (
            out.join(wv, ["file_id", "column_name"], "left")
            .withColumn(
                "word_vector_data",
                F.when(
                    F.col("_n_in") > 0,
                    F.transform("_sum_vec", lambda x: x / F.col("_n_in")),
                ),
            )
            .withColumn(
                "out_of_vocabulary_count",
                F.coalesce("out_of_vocabulary_count", F.lit(0)).cast("long"),
            )
            .withColumn("wv_n_in", F.coalesce("_n_in", F.lit(0)).cast("long"))
            .withColumn("wv_sum_vec", F.col("_sum_vec"))
            .drop("_n_in", "_sum_vec")
        )
    else:
        out = (
            out.withColumn("word_vector_data", F.lit(None).cast("array<double>"))
            .withColumn("out_of_vocabulary_count", F.lit(0).cast("long"))
            .withColumn("wv_n_in", F.lit(0).cast("long"))
            .withColumn("wv_sum_vec", F.lit(None).cast("array<double>"))
        )

    return out.select(
        "file_id",
        "column_name",
        "count",
        "empty_count",
        "out_of_vocabulary_count",
        "numeric_count",
        "is_numeric",
        "distinct_count",
        "sample",
        "word_vector_column_name",
        "word_vector_data",
        "minhash",
        "seed",
        "hyperloglog",
        *((["wv_n_in", "wv_sum_vec"]) if keep_merge_state else []),
    )


def _wv_dim() -> int:
    from findopendata_spark.enrichment import VEC_DIM

    return VEC_DIM
