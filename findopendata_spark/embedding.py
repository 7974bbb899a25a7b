"""Embedding similarity operators: blocked near-dup with skew guard.

The vector-space sibling of the MinHash text dedup (dedup.py). Blocking
on a metadata key (label) keeps the pair space O(sum block^2); the skew
guard bounds the worst block: any label larger than ``block_cap``
sub-blocks by IVF cell (nearest of the label's first ``ceil(n/cap)``
member vectors — the deterministic coarse quantizer q19 uses), so a
dominant label can no longer re-create O(n^2). Sub-blocked labels trade
recall for boundedness exactly like IVF search does: only within-cell
pairs are produced (documented, and exercised by the skew pytest).

All dot products fold left-to-right in double precision — bit-identical
to the DuckDB oracle's loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def _norm(c):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda s, x: s + x * x))


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """IVF approximate nearest-neighbor search: assign vectors to their
    nearest coarse centroid (q19's quantizer), probe only the query's
    ``n_probe`` closest cells, exact cosine top-k within them.

    The 100 TB shape: the corpus-side scan touches ~n_probe/n_cells of
    the data (cell assignment is a broadcast×N pass that would be
    precomputed/bucketed in a real deployment), the query side is a
    broadcast. Centroids = the first ``n_cells`` vectors by id — the
    deterministic quantizer both engines can reproduce.
    """
    cents = F.broadcast(
        emb.orderBy(id_col).limit(n_cells).select(
            F.col(id_col).alias("_c_id"), F.col(vec_col).alias("_c")
        )
    )
    cos_c = _dot(vec_col, "_c") / (_norm(F.col(vec_col)) * _norm(F.col("_c")))
    w_best = Window.partitionBy(id_col).orderBy(F.desc("_cos_c"), F.asc("_c_id"))
    assigned = (
        emb.join(cents, F.lit(True))
        .withColumn("_cos_c", cos_c)
        .withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, F.col("_c_id").alias("_cell"))
    )
    q = query.select(
        F.col(id_col).alias("_q_id"), F.col(vec_col).alias("_q")
    )
    q_cos = _dot("_q", "_c") / (_norm(F.col("_q")) * _norm(F.col("_c")))
    w_q = Window.partitionBy("_q_id").orderBy(F.desc("_qc"), F.asc("_c_id"))
    probe_cells = F.broadcast(
        q.join(cents, F.lit(True))
        .withColumn("_qc", q_cos)
        .withColumn("_rn", F.row_number().over(w_q))
        .filter(F.col("_rn") <= n_probe)
        .select("_q_id", "_q", F.col("_c_id").alias("_cell"))
    )
    cos = _dot(vec_col, "_q") / (_norm(F.col(vec_col)) * _norm(F.col("_q")))
    w_k = Window.partitionBy("_q_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        assigned.join(probe_cells, "_cell")
        .filter(F.col(id_col) != F.col("_q_id"))
        .withColumn("cos_sim", F.round(cos, 4))
        .withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_q_id").alias("q_vec_id"), id_col, "cos_sim", "rank"
        )
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.35,
    block_cap: int = 1000,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "v",
) -> DataFrame:
    """Pairs (a < b) within a label with cosine >= threshold.

    Labels with more than ``block_cap`` members sub-block by IVF cell
    before pairing (cell = argmax cosine against the label's first
    ``ceil(n/block_cap)`` members by id, ties to the lower centroid id).
    """
    sizes = emb.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n"))
    e = emb.join(F.broadcast(sizes), label_col)

    small = e.filter(F.col("_n") <= block_cap).withColumn("_cell", F.lit(-1))

    big = e.filter(F.col("_n") > block_cap)
    w_rank = Window.partitionBy(label_col).orderBy(id_col)
    cents = (
        big.withColumn("_r", F.row_number().over(w_rank))
        .filter(F.col("_r") <= F.ceil(F.col("_n") / block_cap))
        .select(
            F.col(label_col),
            F.col(id_col).alias("_c_id"),
            F.col(vec_col).alias("_c"),
        )
    )
    scored = big.join(F.broadcast(cents), label_col).withColumn(
        "_cos_c", _dot(vec_col, "_c") / (_norm(F.col(vec_col)) * _norm(F.col("_c")))
    )
    w_best = Window.partitionBy(id_col).orderBy(F.desc("_cos_c"), F.asc("_c_id"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(label_col, id_col, vec_col, F.col("_c_id").alias("_cell"))
    )

    blocked = small.select(label_col, id_col, vec_col, "_cell").unionByName(
        assigned
    )
    a = blocked.select(
        F.col(label_col), F.col("_cell"),
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
    )
    b = blocked.select(
        F.col(label_col), F.col("_cell"),
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
    )
    cos = _dot("va", "vb") / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, [label_col, "_cell"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select(label_col, "a", "b", F.round("cos_sim", 4).alias("cos_sim"))
    )
