"""IVF (inverted-file) approximate nearest neighbor — the clustered scale path.

Standard IVF: k-means the corpus into ``n_lists`` cells; at query time
probe only the ``n_probe`` nearest cells. Candidate work drops from
|corpus| to ~|corpus| × n_probe / n_lists per query, at a recall cost
that shrinks as n_probe grows; n_probe = n_lists degenerates to exact
brute force (the invariant our tests pin).

Spark-first: training is distributed (pyspark.ml KMeans over the corpus),
cell assignment is a model transform, and the probe phase is an equi-join
on cell id — shuffle partitions by cell, never an all-pairs cross join.
Centroids (n_lists × dim floats) are the only driver-side state and are
shipped as plan literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linqonsteroids_spark.similarity.knn import cosine_from_norms, dot, l2_norm


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 8,
    train_cap: int = 100_000,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF cell probing.

    ``centroids``: a pretrained centroid artifact (list of n_lists
    vectors). When given, training is skipped entirely — assignment and
    probing run against the frozen literals (the production IVF shape:
    train once on a sample, ship the index artifact, replay per query).
    This path is deterministic and oracle-replayable, and spends zero
    corpus passes on training. When None, a seeded MLlib k-means trains
    on a capped sample at build time.

    Returns (query_id, rnk, neighbor_id, cos_sim).
    """
    if centroids is not None:
        n_lists = len(centroids)
    if n_probe >= n_lists:
        # Exact configuration: every cell is probed, so the cell partition
        # is a no-op by definition — this IS brute force. Training would
        # be wasted corpus passes (at 100 TB, hours of them) and the cell
        # join would only re-materialize the all-pairs set; delegate to
        # the streamed batch scorer (O(|C|·dim) transfer, top-k per batch).
        from linqonsteroids_spark.similarity.knn import brute_force_topk

        return brute_force_topk(
            queries, corpus, k=k,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
        )

    corpus_base = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec)
    ).withColumn("_cn", l2_norm(F.col(corpus_vec)))
    if centroids is not None:
        assigned, probes = _literal_probes(
            queries, corpus_base, centroids, n_probe,
            query_id, query_vec, corpus_vec,
        )
    else:
        assigned, probes = _kmeans_probes(
            queries, corpus_base, n_lists, n_probe, seed, max_iter, train_cap,
            query_id, query_vec, corpus_vec,
        )

    sim = cosine_from_norms(
        F.col(query_vec), F.col(corpus_vec), F.col("_qn"), F.col("_cn")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    # broadcast the probe side: cell has only n_lists distinct values, so a
    # shuffle join on it collapses parallelism to n_lists partitions (and
    # skews with cell sizes). Broadcasting keeps the corpus in place — the
    # probe list is |Q| x n_probe rows, small by design.
    return (
        assigned.join(F.broadcast(probes), "cell")
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", "neighbor_id", F.col("sim").alias("cos_sim"))
    )


def _kmeans_probes(
    queries: DataFrame,
    corpus_base: DataFrame,
    n_lists: int,
    n_probe: int,
    seed: int,
    max_iter: int,
    train_cap: int,
    query_id: str,
    query_vec: str,
    corpus_vec: str,
):
    """Trained IVF path: k-means cells + per-query nearest-cell probe list.

    Returns (assigned corpus with ``cell``, probe list with ``cell``).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus_base.withColumn(
        "_v", array_to_vector(F.col(corpus_vec).cast("array<double>"))
    )
    # Train on a bounded, cached sample with random init and capped
    # iterations: centroid quality only shifts the recall/probe balance.
    # At 100 TB a full-corpus pass per k-means iteration is the difference
    # between minutes and hours; the cache stops MLlib re-reading the
    # sample once per iteration.
    n = corpus_v.count()
    train = (
        corpus_v.sample(fraction=min(1.0, train_cap / n), seed=seed)
        if n > train_cap
        else corpus_v
    ).cache()
    try:
        model = KMeans(
            k=n_lists,
            seed=seed,
            maxIter=max_iter,
            initMode="random",
            featuresCol="_v",
            predictionCol="cell",
        ).fit(train)
    finally:
        train.unpersist()
    assigned = model.transform(corpus_v).drop("_v")

    # per-query distance to every centroid, JVM-side; keep n_probe nearest.
    # centroids are a tiny literal array — no shuffle, no UDF.
    centers = [
        F.struct(
            F.lit(i).alias("cell"),
            F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
        )
        for i, c in enumerate(model.clusterCenters())
    ]
    q = (
        queries.select(query_id, query_vec)
        .withColumn("_qn", l2_norm(F.col(query_vec)))
        .withColumn("_c", F.explode(F.array(*centers)))
    )
    # squared L2 to centroid: |q|² is constant per query → rank by -2q·c + |c|²
    score = -2 * dot(F.col(query_vec), F.col("_c.cvec")) + dot(
        F.col("_c.cvec"), F.col("_c.cvec")
    )
    wq = Window.partitionBy(query_id).orderBy(F.asc("score"), F.asc("cell"))
    probes = (
        q.select(
            query_id, query_vec, "_qn", F.col("_c.cell").alias("cell"), score.alias("score")
        )
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select(query_id, query_vec, "_qn", "cell")
    )
    return assigned, probes


def centroid_score_structs(vec: str, centroids: list[list[float]]):
    """array<struct<score,cell>> of squared-L2 rank scores of ``vec``
    against the frozen centroid literals: -2·v·c + |c|² (|v|² is constant
    per row, so it cancels in ranking); the |c|² terms ship as
    precomputed double literals (sequential python accumulation, so the
    oracle embeds the character-identical repr) and both engines only
    evaluate the dot products live. Shared by the IVF literal path and
    the IVF-PQ ann_join (similarity/ann.py)."""
    out = []
    for i, c in enumerate(centroids):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        cc = 0.0
        for x in c:
            cc += float(x) * float(x)
        score = F.lit(-2.0) * dot(F.col(vec), cvec) + F.lit(cc)
        out.append(F.struct(score.alias("score"), F.lit(i).alias("cell")))
    return F.array(*out)


def assign_nearest_cell(vec: str, centroids: list[list[float]]):
    """Nearest-centroid cell id: `array_min` over the score structs
    (lexicographic struct order == ORDER BY score ASC, cell ASC — ties
    deterministic). No window, no explode-then-rank."""
    return F.array_min(centroid_score_structs(vec, centroids)).getField("cell")


def _literal_probes(
    queries: DataFrame,
    corpus_base: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    query_id: str,
    query_vec: str,
    corpus_vec: str,
):
    """Frozen-centroid IVF path: assignment and probing against literals.

    Entirely JVM-side and shuffle-free: per-row scores against the
    n_lists centroid literals fold into an array of (score, cell)
    structs (``centroid_score_structs``); `array_min` picks the corpus
    cell and `array_sort` + `slice` picks the query's n_probe nearest
    cells — nothing for AQE to even rebalance.
    """

    def scores(vec: str):
        return centroid_score_structs(vec, centroids)

    assigned = corpus_base.withColumn(
        "cell", assign_nearest_cell(corpus_vec, centroids)
    )
    probe_cells = F.transform(
        F.slice(F.array_sort(scores(query_vec)), 1, n_probe), lambda s: s.cell
    )
    probes = (
        queries.select(query_id, query_vec)
        .withColumn("_qn", l2_norm(F.col(query_vec)))
        .withColumn("cell", F.explode(probe_cells))
    )
    return assigned, probes
