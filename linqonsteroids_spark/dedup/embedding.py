"""Embedding-cosine near-duplicate detection.

Exact within-block variant: compare only pairs sharing a blocking key
(here: the label column — at 100 TB the block would be an LSH bucket from
``similarity.knn.lsh_bucket``, same join shape). Cosine runs JVM-side
(zip_with + aggregate in double); the oracle uses DuckDB's
list_cosine_similarity over DOUBLE[] — verified bit-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.similarity.knn import cosine_from_norms, l2_norm


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """(id_a < id_b, cos_sim) within-block pairs above threshold."""
    # norms precomputed per row (O(n)), not per pair (O(pairs)); the sqrt-
    # per-side-then-multiply float ops are identical, so round-6 oracle
    # parity is unaffected.
    a = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = emb.select(
        F.col(block_col).alias("blk_b"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    sim = cosine_from_norms(F.col("vec_a"), F.col("vec_b"), F.col("_na"), F.col("_nb"))
    return (
        a.join(b, (a.blk == b.blk_b) & (a.id_a < b.id_b))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("cos_sim"))
    )


def embedding_oracle_sql(threshold: float = 0.9, table: str = "embeddings") -> str:
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM {table} a JOIN {table} b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {threshold}
"""
