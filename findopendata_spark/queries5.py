"""Fifth batch: embedding-cosine near-dup (training-data op — the
vector-space sibling of the MinHash text dedup in queries3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q34_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with metadata blocking.

    Blocking on `label` makes candidate generation exact and keeps the
    pair space O(sum block^2) instead of O(n^2) — the deterministic
    counterpart of IVF-cell blocking (q19 is the approximate scale
    path). Dot products fold left-to-right in double precision, matching
    the DuckDB oracle bit-for-bit.
    """
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(
        F.col("vec_id").alias("a"), "label", F.col("v").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("b"), "label", F.col("v").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda s, x: s + x * x)
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, "label")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= 0.35)
        .select("label", "a", "b", F.round("cos_sim", 4).alias("cos_sim"))
    )


QUERIES5 = {"q34_embedding_near_dup": q34_embedding_near_dup}

ORACLE_SQL5: dict[str, str | None] = {
    "q34_embedding_near_dup": """
        WITH d AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT x.label, x.vec_id AS a, y.vec_id AS b,
               round(list_dot_product(x.v, y.v) /
                     (sqrt(list_dot_product(x.v, x.v)) *
                      sqrt(list_dot_product(y.v, y.v))), 4) AS cos_sim
        FROM d x JOIN d y ON x.label = y.label AND x.vec_id < y.vec_id
        WHERE list_dot_product(x.v, y.v) /
              (sqrt(list_dot_product(x.v, x.v)) *
               sqrt(list_dot_product(y.v, y.v))) >= 0.35
    """,
}
