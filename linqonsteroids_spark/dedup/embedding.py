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

from linqonsteroids_spark.similarity.knn import cosine_similarity


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """(id_a < id_b, cos_sim) within-block pairs above threshold."""
    a = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = emb.select(
        F.col(block_col).alias("blk_b"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    sim = cosine_similarity(F.col("vec_a"), F.col("vec_b"))
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
