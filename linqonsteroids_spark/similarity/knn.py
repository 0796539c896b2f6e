"""Cosine / dot-product column functions and top-k neighbor search.

Vector math as JVM higher-order functions (``zip_with`` + ``aggregate``):
Arrow/pandas never enters the per-pair loop, so the cross join stays in
whole-stage codegen. For 100 TB-scale ANN see ``lsh_topk`` (random
hyperplane buckets shrink the candidate set from |Q|×|C| to per-bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over two array<numeric> columns, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_norms(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine with norms precomputed per side BEFORE the pairing join —
    O(|A|+|B|) norm work instead of O(|A|x|B|); only the dot product runs
    per pair."""
    return dot(a, b) / (a_norm * b_norm)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query side is broadcast (callers keep it small); the corpus
    streams through. Result: (query_id, rnk, neighbor_id, cos_sim).
    """
    q = F.broadcast(
        queries.select(query_id, query_vec).withColumn("_qn", l2_norm(F.col(query_vec)))
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec)).withColumn(
        "_cn", l2_norm(F.col(corpus_vec))
    )
    sim = cosine_from_norms(
        F.col(query_vec), F.col(corpus_vec), F.col("_qn"), F.col("_cn")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        q.crossJoin(c)
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", "neighbor_id", F.col("sim").alias("cos_sim"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure python, no numpy needed
    at plan-build time; tiny literal shipped into the plan)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = sign(vec · plane_i). O(dim × planes) per
    row, JVM-side."""
    bucket = F.lit(0).cast("long")
    for plane in planes:
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, plane_col) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane buckets.

    Scale path: the cross join becomes an equi-join on bucket — shuffle
    partitions by bucket, candidate set shrinks ~2^n_planes-fold. Recall
    is tunable via n_planes (fewer planes → bigger buckets → higher recall).
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    q = (
        queries.select(query_id, query_vec)
        .withColumn("bucket", lsh_bucket(F.col(query_vec), planes))
        .withColumn("_qn", l2_norm(F.col(query_vec)))
    )
    c = (
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec))
        .withColumn("bucket", lsh_bucket(F.col(corpus_vec), planes))
        .withColumn("_cn", l2_norm(F.col(corpus_vec)))
    )
    sim = cosine_from_norms(
        F.col(query_vec), F.col(corpus_vec), F.col("_qn"), F.col("_cn")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        q.join(c, "bucket")
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", "neighbor_id", F.col("sim").alias("cos_sim"))
    )
