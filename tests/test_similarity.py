"""ANN tests: LSH and IVF vs the brute-force baseline (recall + invariants)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.similarity.ivf import ivf_topk
from linqonsteroids_spark.similarity.knn import brute_force_topk, lsh_topk

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 40


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered synthetic corpus: 8 well-separated centers + noise."""
    rng = random.Random(7)
    centers = [[rng.gauss(0, 10) for _ in range(DIM)] for _ in range(N_CLUSTERS)]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(PER_CLUSTER):
            rows.append((vid, [x + rng.gauss(0, 0.5) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def queries(vectors):
    return (
        vectors.filter(F.col("vec_id") % 40 == 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def _recall(approx, exact):
    return len(approx & exact) / len(exact)


def test_brute_force_excludes_nothing_and_ranks(vectors, queries):
    out = brute_force_topk(queries, vectors, k=5)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rnk, r.cos_sim))
    for q, items in per_q.items():
        items.sort()
        assert [r for r, _ in items] == [1, 2, 3, 4, 5]
        sims = [s for _, s in items]
        assert sims == sorted(sims, reverse=True)


def test_ivf_full_probe_equals_brute_force(vectors, queries):
    exact = _pairs(brute_force_topk(queries, vectors, k=5))
    full = _pairs(ivf_topk(queries, vectors, k=5, n_lists=6, n_probe=6))
    assert full == exact  # probing every cell ⇒ exact


def test_ivf_partial_probe_high_recall_on_clustered_data(vectors, queries):
    exact = _pairs(brute_force_topk(queries, vectors, k=5))
    approx = _pairs(ivf_topk(queries, vectors, k=5, n_lists=8, n_probe=2))
    assert _recall(approx, exact) >= 0.9  # neighbors live in the probed cells


def test_lsh_recall_reasonable(vectors, queries):
    exact = _pairs(brute_force_topk(queries, vectors, k=5))
    approx = _pairs(
        lsh_topk(queries, vectors, k=5, n_planes=4, dim=DIM)
    )
    assert _recall(approx, exact) >= 0.5  # same-cluster vectors share sign buckets


def test_brute_force_topk_empty_query_side(spark):
    # empty query side: empty result with the right schema, not a numpy
    # stack error inside executors
    from linqonsteroids_spark.similarity.knn import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame([], "query_id long, query_vec array<double>")
    out = brute_force_topk(queries, corpus, k=2)
    assert out.columns == ["query_id", "rnk", "neighbor_id", "cos_sim"]
    assert out.count() == 0


def test_brute_force_topk_query_cap_enforced(spark, monkeypatch):
    # past the documented cap the collect is a driver OOM in disguise —
    # must fail fast with an actionable error instead
    from linqonsteroids_spark.similarity import knn

    monkeypatch.setattr(knn, "_QUERY_SIDE_CAP", 10)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    queries = spark.range(11).selectExpr(
        "id as query_id", "array(cast(id as double), 1.0) as query_vec"
    )
    with pytest.raises(ValueError, match="broadcast cap"):
        knn.brute_force_topk(queries, corpus, k=1)
