"""Semantic (embedding-cluster) dedup — the SemDeDup shape, linear form.

SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", 2023 — public) removes documents whose
EMBEDDINGS are near-identical even when their text is not: k-means the
embedding space, then within each cluster drop items too similar to a
kept representative.

This implementation keeps the published pipeline's structure but uses
CENTROID-LINKAGE within each cluster: every member is compared to the
cluster's one representative (the member nearest the centroid,
deterministic id tie-break) rather than to all kept members. That makes
the per-cluster work O(|cluster|) instead of O(|cluster|²) — the same
constant-cardinality-blocking trap the round-4/5 verdicts flagged for
fuzzy and simhash blocking, avoided by construction: no pair relation is
ever materialized, so cluster growth cannot go quadratic.

Scale (100 TB): assignment is row-local scoring against n_lists literal
centroids (the frozen IVF artifact — in production trained per-corpus
with n_lists ~ sqrt(N)); the representative election is one tiny agg
(n_lists rows out, map-side combined); the rep join broadcasts n_lists
rows. Total: one O(n_lists) shuffle + one broadcast — zero pair
explosion, zero windows over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.similarity.knn import cosine_from_norms, dot, l2_norm


def _centroid_scores(vec_col, centroids: list[list[float]]):
    """Array of (squared-L2 score, cell) structs vs literal centroids —
    |v|² is constant per row, so rank by -2·v·c + |c|² with |c|²
    precomputed from the same rounded literals (the ivf._literal_probes
    determinism contract: both engines only evaluate dot products live)."""
    out = []
    for i, c in enumerate(centroids):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        cc = 0.0
        for x in c:
            cc += float(x) * float(x)
        score = F.lit(-2.0) * dot(vec_col, cvec) + F.lit(cc)
        out.append(F.struct(score.alias("score"), F.lit(i).alias("cell")))
    return F.array(*out)


def semantic_dedup_reps(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, rep_id, cos_sim, is_dup): every vector assigned to its
    nearest frozen centroid, compared against the cluster representative
    (nearest-to-centroid member, id tie-break); ``is_dup`` marks members
    within ``threshold`` cosine of the representative — the rows a
    SemDeDup wash would drop."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # assignment can rank by -2·v·c + |c|² (|v|² is constant per vector),
    # but the REP ELECTION compares across DIFFERENT vectors of one cell,
    # where |v|² no longer cancels — cdist must be the true squared L2
    # (score + v·v), or the election would favor large-norm members
    # (caught by tests/test_dedup.py::test_semantic_dedup_reps_semantics)
    # materialized once: the assignment (n_centroids x d multiply-adds
    # per vector, the dominant per-row cost) feeds BOTH the rep election
    # and the comparison fact side — without the checkpoint it executes
    # twice per call (r15; same fix as the SimHash signature relation)
    assigned = (
        emb.select(F.col(id_col), v.alias("v"))
        .withColumn("_s", F.array_min(_centroid_scores(F.col("v"), centroids)))
        .select(
            id_col,
            "v",
            F.col("_s.cell").alias("cell"),
            (F.col("_s.score") + dot(F.col("v"), F.col("v"))).alias("cdist"),
        )
        .localCheckpoint(eager=True)
    )
    # representative election: lexicographic struct min == ORDER BY cdist
    # ASC, id ASC (ids are unique, so the trailing vector never compares)
    reps = (
        assigned.groupBy("cell")
        .agg(
            F.min(
                F.struct(
                    F.col("cdist"),
                    F.col(id_col).alias("rep_id"),
                    F.col("v").alias("rep_v"),
                )
            ).alias("r")
        )
        .select("cell", "r.rep_id", "r.rep_v")
    )
    sim = cosine_from_norms(
        F.col("v"), F.col("rep_v"), l2_norm(F.col("v")), l2_norm(F.col("rep_v"))
    )
    return (
        assigned.join(F.broadcast(reps), "cell")
        .withColumn("_sim", sim)
        .select(
            id_col,
            "cell",
            "rep_id",
            # + 0.0 normalizes IEEE negative zero: a sim in (-5e-5, 0)
            # rounds to -0.0 on one engine and 0.0 on the other —
            # numerically equal but distinct to byte-level hashes and
            # string sorts (caught by the sf0.001 differential)
            (F.round("_sim", 4) + F.lit(0.0)).alias("cos_sim"),
            (
                (F.col(id_col) != F.col("rep_id"))
                & (F.col("_sim") >= F.lit(threshold))
            ).alias("is_dup"),
        )
    )
