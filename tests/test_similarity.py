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


def test_power_iteration_matches_numpy(spark):
    """Distributed power iteration vs numpy on the same matrix: after 3
    rounds both iterates must agree to float tolerance (same algorithm,
    different summation order), and the Rayleigh norm must respect the
    variational bound against numpy's exact top singular value."""
    import numpy as np

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.eigen import (
        power_iteration_top_component,
    )
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    v, norm_xv = power_iteration_top_component(emb, iterations=3)
    x = np.array(
        [r.e for r in emb.selectExpr(
            "transform(embedding, c -> cast(c AS double)) AS e"
        ).collect()]
    )
    d = x.shape[1]
    ref = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(3):
        w = x.T @ (x @ ref)
        ref = w / np.linalg.norm(w)
    k = int(np.argmax(np.abs(ref)))
    if ref[k] < 0:
        ref = -ref
    assert np.allclose(np.array(v), ref, atol=1e-9)
    # Rayleigh estimate: never exceeds the true top singular value, and
    # after 3 rounds carries real overlap with the dominant direction
    # (this synthetic corpus has a small spectral gap, so full
    # convergence is slow — the pin here is the DIFFERENTIAL above plus
    # the variational bound, not a convergence-rate claim)
    top_sv = np.linalg.svd(x, compute_uv=False)[0]
    assert norm_xv <= top_sv * (1 + 1e-9)
    assert norm_xv >= 0.8 * top_sv
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_pq_encode_matches_reference(spark):
    """PQ encode vs a direct numpy reference with the same sequential
    accumulation: identical codes (first-match argmin) and exact
    per-subspace errors; every code inside [0, K)."""
    import numpy as np

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.pq import (
        PQ_CODEBOOK,
        PQ_D,
        PQ_K,
        PQ_M,
        pq_encode,
    )
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {r.vec_id: r for r in pq_encode(emb).collect()}
    raw = {r.vec_id: list(r.embedding) for r in emb.collect()}
    assert set(got) == set(raw)
    for vid, v in raw.items():
        x = np.array(v, dtype=np.float64)
        for s in range(PQ_M):
            sub = x[s * PQ_D : (s + 1) * PQ_D]
            book = np.array(PQ_CODEBOOK[s], dtype=np.float64)
            sq = (sub[None, :] - book) ** 2
            d = sq[:, 0]
            for i in range(1, PQ_D):
                d = d + sq[:, i]
            r = got[vid]
            assert 0 <= r[f"code_{s}"] < PQ_K
            assert r[f"code_{s}"] == int(np.argmin(d))
            assert r[f"err2_{s}"] == float(np.min(d))  # bit-exact


# --- IVF x PQ ANN join (similarity/ann.py) ----------------------------------


def test_ivfpq_full_probe_full_refine_equals_brute_force(spark):
    """Degenerate configuration pin: probing every cell and refining the
    entire candidate set makes IVFADC-R exactly brute force (the same
    invariant test_ivf_full_probe_equals_brute_force pins for plain
    IVF). Uses the real sf0.001 corpus + frozen artifacts."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    n = emb.count()
    ann = ivfpq_topk(
        q, emb, IVF_CENTROIDS, k=5,
        n_probe=len(IVF_CENTROIDS), refine=n,
    )
    exact = brute_force_topk(q, emb, k=5, exclude_self=True)
    assert _pairs(ann) == _pairs(exact)
    # rank agreement too, not just set equality
    a = {(r.query_id, r.rnk): r.neighbor_id for r in ann.collect()}
    e = {(r.query_id, r.rnk): r.neighbor_id for r in exact.collect()}
    assert a == e


def test_ivfpq_production_config_recall_floor(spark):
    """The gated configuration (the production _ANN_NPROBE_R /
    _ANN_REFINE_FRAC constants, so this floor tracks the gate) must clear
    a recall floor vs exact brute force on the real corpus. Unit-norm
    random-ish vectors are PQ's WORST case — distances concentrate and
    cell routing carries little signal — which is exactly why the
    production default must not lean on a lucky corpus. With the r10
    32x2 codebook + fractional refine at the r12 n_probe=7 config,
    measured recall is 0.94 @ sf0.001, 0.92 @ sf0.01, 0.91 @ sf0.1
    (the old n_probe=5 config was ceiling-capped at 0.81). Pin 0.85
    at sf0.001: regeneration noise cannot flake it, while a real
    regression (broken LUT / probe / code) lands near random-pick
    recall k/|corpus| ~ 0.01, far below."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from linqonsteroids_spark.queries.vector import (
        _ANN_NPROBE_R,
        _ANN_REFINE_FRAC,
    )

    ann = ivfpq_topk(
        q, emb, IVF_CENTROIDS, k=5,
        n_probe=_ANN_NPROBE_R, refine_frac=_ANN_REFINE_FRAC,
    )
    exact = brute_force_topk(q, emb, k=5, exclude_self=True)
    assert _recall(_pairs(ann), _pairs(exact)) >= 0.85


def test_ivfpq_recall_clears_production_target_at_sf01(spark):
    """The production default must clear 0.85 recall at the LARGEST
    local scale (r11 verdict item 7 raised the target past the old
    n_probe=5 cell-probe ceiling of 0.81). With n_probe=7 — measured
    ceilings 0.81/0.845/0.92 at probes 5/6/7 — ann_recall_report at
    sf0.1 (2000 vectors, 40 queries) measures 910000 ppm. Pin the
    PRODUCTION TARGET itself (>= 850000): regeneration slack lives in
    the TRAINER's acceptance check (tools/train_pq_codebook.py rejects
    a retrained codebook below the measured quality), not in this
    floor — a codebook that passes training but misses 0.85 here must
    fail."""
    from linqonsteroids_spark.queries.vector import ann_recall_report

    r = ann_recall_report(spark, "/root/testdata/sf0.1").collect()[0]
    assert r.recall_ppm >= 850_000, r


def test_ivfpq_adc_plan_shape(spark):
    """The ADC candidate join must be a broadcast hash join on cell —
    never a cartesian/BNLJ — and the corpus side must not shuffle before
    the join (the 100 TB contract: corpus stays put, probes move)."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = (
        ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfpq_persisted_index_equals_inmemory_and_prunes(spark, tmp_path):
    """The parquet index artifact must (1) return bit-identical results
    to the in-memory path — encoding is deterministic — including
    through the refine stage, and (2) physically scan ONLY the probed
    cell directories (PartitionFilters on cell), the on-disk
    inverted-file contract."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import (
        build_ivfpq_index,
        ivfpq_index_topk,
        ivfpq_topk,
    )
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, IVF_CENTROIDS)
    idx = spark.read.parquet(path)

    mem = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=3)
    art = ivfpq_index_topk(idx, q, None, IVF_CENTROIDS, k=5, n_probe=3)
    assert sorted(map(tuple, art.collect())) == sorted(
        map(tuple, mem.collect())
    )

    memr = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=5, refine=20)
    artr = ivfpq_index_topk(idx, q, emb, IVF_CENTROIDS, k=5, n_probe=5, refine=20)
    assert sorted(map(tuple, artr.collect())) == sorted(
        map(tuple, memr.collect())
    )

    plan = art._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in pf, pf

    # one file per cell directory, not one per (task x cell)
    import glob as _glob
    import os as _os

    for d in _glob.glob(_os.path.join(path, "cell=*")):
        files = [f for f in _os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_ivfpq_index_append_equals_full_build(spark, tmp_path):
    """Incremental maintenance contract: build(A) + append(B) must be
    search-identical to build(A ∪ B) — frozen centroids/codebook encode
    old and new rows identically, so the artifact is append-safe with
    O(new batch) work and no rebuild."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_index_topk,
    )
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    full_path = str(tmp_path / "full")
    incr_path = str(tmp_path / "incr")
    build_ivfpq_index(emb, full_path, IVF_CENTROIDS)
    build_ivfpq_index(a, incr_path, IVF_CENTROIDS)
    append_to_ivfpq_index(b, incr_path, IVF_CENTROIDS)

    kwargs = dict(k=5, n_probe=3)
    full = ivfpq_index_topk(
        spark.read.parquet(full_path), q, None, IVF_CENTROIDS, **kwargs
    )
    incr = ivfpq_index_topk(
        spark.read.parquet(incr_path), q, None, IVF_CENTROIDS, **kwargs
    )
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_ivfpq_empty_query_side(spark):
    """Empty query side: empty result with the right schema on both the
    ADC and index paths — no numpy stack error inside executors (the
    brute_force_topk empty-side contract extended to IVF-PQ)."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = spark.createDataFrame(
        [], "query_id long, query_vec array<float>"
    )
    out = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=3)
    assert out.columns == ["query_id", "rnk", "neighbor_id", "adc_dist"]
    assert out.count() == 0


def test_ivfpq_refine_frac_scales_with_corpus(spark):
    """refine_frac resolves R from the corpus size (R = ceil(frac*n),
    floored at k) and must equal the explicit-R call at the resolved
    value — the scale-honest knob the fixed-R recall numbers motivate."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")  # 500 vectors
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    frac = ivfpq_topk(
        q, emb, IVF_CENTROIDS, k=5, n_probe=5, refine_frac=0.1
    )
    fixed = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=5, refine=50)
    assert sorted(map(tuple, frac.collect())) == sorted(
        map(tuple, fixed.collect())
    )
    with pytest.raises(ValueError, match="not both"):
        ivfpq_topk(q, emb, IVF_CENTROIDS, refine=5, refine_frac=0.1)


# --- property: IVFADC-R degenerate config == brute force on random input ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _random_corpora(draw):
    """Small random 64-dim corpora (PQ requires dim = M*D = 64):
    adversarial shapes included — duplicate vectors, tiny sizes."""
    rng = draw(st.randoms(use_true_random=False))
    n = draw(st.integers(min_value=3, max_value=24))
    vecs = []
    for i in range(n):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        # zero vectors have undefined cosine (hypothesis shrinks straight
        # to them): the engine raises loudly under ANSI rather than
        # emitting NaN ranks, which is the behavior we want — so the
        # property domain is nonzero vectors
        v[i % 64] += 1.0 if v[i % 64] >= 0 else -1.0
        vecs.append((i, v))
    if draw(st.booleans()) and n >= 2:  # inject an exact duplicate pair
        vecs[1] = (1, list(vecs[0][1]))
    return vecs


@settings(
    max_examples=6,
    deadline=None,
    # data_too_large: the corpora strategy draws 64-float vectors per
    # row, so some SEEDS trip hypothesis's generation-size heuristic
    # (observed r14: FailedHealthCheck with zero generated failures) —
    # the domain itself is bounded (n <= the strategy's max), the
    # check is advisory about generation efficiency, not correctness
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
    # one unreproduced suite-run failure was observed (r11) and its
    # example lost — print_blob makes any future failure replayable
    # straight from the CI log via @reproduce_failure
    print_blob=True,
)
@given(_random_corpora())
def test_ivfpq_degenerate_equals_bruteforce_random(spark, vecs):
    """Full probe + full refine must equal brute force rank-for-rank on
    ARBITRARY corpora — including exact-duplicate vectors (cos ties
    broken by neighbor_id on both paths) and tiny corpora where
    k > |corpus| - 1."""
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS

    corpus = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    q = corpus.filter(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = ivfpq_topk(
        q, corpus, IVF_CENTROIDS, k=4,
        n_probe=len(IVF_CENTROIDS), refine=len(vecs),
    )
    exact = brute_force_topk(q, corpus, k=4, exclude_self=True)
    a = {(r.query_id, r.rnk): r.neighbor_id for r in ann.collect()}
    e = {(r.query_id, r.rnk): r.neighbor_id for r in exact.collect()}
    assert a == e


def test_topk_outputs_are_distinct_pairs(spark):
    """The single-pass full-outer recall reports (ann_recall_report,
    matryoshka_recall_report) count |truth|/|ann|/|hits| as flag counts
    over one join on (query_id, neighbor_id) — correct ONLY while both
    top-k outputs are duplicate-free on that pair. Enforce the invariant
    here so a future top-k variant cannot silently inflate the recall
    counts (r15 ADVICE). Corpus includes exact-duplicate vectors (the
    tie case most likely to tempt a variant into emitting a pair twice).
    """
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) + 0.1 for _ in range(64)]) for i in range(40)]
    rows[1] = (1, list(rows[0][1]))  # exact duplicate pair
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = corpus.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    for out in (
        brute_force_topk(q, corpus, k=5, exclude_self=True),
        ivfpq_topk(q, corpus, IVF_CENTROIDS, k=5, n_probe=2),
    ):
        pairs = out.select("query_id", "neighbor_id")
        assert pairs.count() == pairs.distinct().count()


def test_sdc_tables_consistent_with_codebook():
    """The SDC lookup tables are a pure derived artifact: symmetric,
    zero diagonal, and every entry equals the sequential squared-L2
    between the two codebook centroids (numpy recompute with the same
    accumulation order)."""
    import numpy as np

    from linqonsteroids_spark.similarity.pq import (
        PQ_CODEBOOK,
        PQ_D,
        PQ_K,
        PQ_M,
        sdc_tables,
    )

    tables = sdc_tables()
    assert len(tables) == PQ_M
    for s in range(PQ_M):
        t = tables[s]
        book = np.array(PQ_CODEBOOK[s], dtype=np.float64)
        for i in range(PQ_K):
            assert t[i][i] == 0.0
            for j in range(PQ_K):
                assert t[i][j] == t[j][i]
                sq = (book[i] - book[j]) ** 2
                d = sq[0]
                for k in range(1, PQ_D):
                    d = d + sq[k]
                assert t[i][j] == float(d)  # bit-exact


def test_matryoshka_prefix_adc_mechanism(spark):
    """The m_sub (matryoshka prefix) composition, r13. Recall on THIS
    corpus is a recorded NEGATIVE result (i.i.d. random embeddings
    spread energy evenly, so the 32-dim prefix keeps half the signal:
    measured 0.60 vs 0.91 at sf0.1 — see similarity/ann.py docstring);
    what ships is the MECHANISM, pinned here: (a) m_sub=PQ_M is
    bit-identical to the default path; (b) the m_sub=M/2 ADC equals the
    brute-force recomputation of the truncated chain — same codes, half
    the LUT terms — so the prefix arithmetic is exact, not approximate."""
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import ivfpq_topk
    from linqonsteroids_spark.similarity.pq import PQ_M
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    full = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=3)
    explicit = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=3, m_sub=PQ_M)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # (b) prefix ADC distances: recompute one query's candidate scores
    # from raw vectors + codebook, truncated to the first M/2 subspaces
    import numpy as np

    from linqonsteroids_spark.similarity.pq import PQ_CODEBOOK, PQ_D

    half = ivfpq_topk(q, emb, IVF_CENTROIDS, k=5, n_probe=3, m_sub=PQ_M // 2)
    rows = half.collect()
    assert rows and {len(r) for r in [rows[0]]} == {4}
    qid = rows[0]["query_id"]
    qvec = np.array(
        q.filter(F.col("query_id") == qid).first()["query_vec"], dtype=np.float64
    )
    for r in rows:
        if r["query_id"] != qid:
            continue
        nvec = np.array(
            emb.filter(F.col("vec_id") == r["neighbor_id"]).first()["embedding"],
            dtype=np.float64,
        )
        expect = 0.0
        for s in range(PQ_M // 2):
            sub = nvec[s * PQ_D : (s + 1) * PQ_D]
            book = np.array(PQ_CODEBOOK[s], dtype=np.float64)
            d = ((sub[None, :] - book) ** 2)
            acc = d[:, 0]
            for i in range(1, PQ_D):
                acc = acc + d[:, i]
            code = int(acc.argmin())
            qsub = qvec[s * PQ_D : (s + 1) * PQ_D]
            lut = 0.0
            for i in range(PQ_D):
                lut += (qsub[i] - book[code][i]) ** 2
            expect += lut
        assert abs(r["adc_dist"] - expect) < 1e-9, (r, expect)


def test_ivfpq_takedown_tombstones_and_compaction(spark, tmp_path):
    """Takedown contract: delete(X) then search must equal a fresh
    build over corpus − X — first through the tombstone mask (no
    artifact rewrite), then again after compaction folds the
    tombstones into the touched cell directories only. Both tombstone
    derivations (from the deleted vectors + centroids, and from a
    pushed-IN scan of the artifact) must agree."""
    import os

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import (
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_topk,
        read_ivfpq_index,
    )
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dead_ids = [
        r["vec_id"]
        for r in emb.filter(
            (F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 100 != 0)
        )
        .select("vec_id")
        .collect()
    ]
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    kwargs = dict(k=5, n_probe=3)

    main_path = str(tmp_path / "main")
    ref_path = str(tmp_path / "ref")
    scan_path = str(tmp_path / "scan")
    build_ivfpq_index(emb, main_path, IVF_CENTROIDS)
    build_ivfpq_index(emb, scan_path, IVF_CENTROIDS)
    build_ivfpq_index(
        emb.filter(~F.col("vec_id").isin(dead_ids)), ref_path, IVF_CENTROIDS
    )

    # vectors+centroids derivation (zero artifact reads) vs pushed-IN
    # scan derivation: same tombstone set
    n1 = delete_from_ivfpq_index(
        spark, main_path, dead_ids,
        vectors=emb, centroids=IVF_CENTROIDS,
    )
    n2 = delete_from_ivfpq_index(spark, scan_path, dead_ids)
    assert n1 == n2 == len(dead_ids)
    t1 = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(main_path, "_tombstones"))
            .collect(),
        )
    )
    t2 = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(scan_path, "_tombstones"))
            .collect(),
        )
    )
    assert t1 == t2

    want = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                spark.read.parquet(ref_path), q, None, IVF_CENTROIDS,
                **kwargs,
            ).collect(),
        )
    )
    masked = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                read_ivfpq_index(spark, main_path), q, None,
                IVF_CENTROIDS, **kwargs,
            ).collect(),
        )
    )
    assert masked == want

    cells = compact_ivfpq_index(spark, main_path)
    assert cells  # some inverted lists held deleted entries
    assert not os.path.isdir(os.path.join(main_path, "_tombstones"))
    # post-compaction: the PLAIN read serves the takedown state, and
    # no deleted id survives anywhere in the artifact
    plain = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                spark.read.parquet(main_path), q, None, IVF_CENTROIDS,
                **kwargs,
            ).collect(),
        )
    )
    assert plain == want
    leftover = (
        spark.read.parquet(main_path)
        .where(F.col("neighbor_id").isin(dead_ids))
        .count()
    )
    assert leftover == 0
    assert compact_ivfpq_index(spark, main_path) == []  # idempotent


def test_ivfpq_takedown_empties_a_cell(spark, tmp_path):
    """Deleting EVERY entry of a cell removes its directory outright
    (dynamic overwrite cannot replace a partition with zero rows — the
    silent-stale-partition trap this pin exists for)."""
    import os

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import (
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        read_ivfpq_index,
    )
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "idx")
    build_ivfpq_index(emb, path, IVF_CENTROIDS)
    idx = spark.read.parquet(path)
    cell_counts = idx.groupBy("cell").count().collect()
    victim = min(cell_counts, key=lambda r: (r["count"], r["cell"]))
    dead = [
        r["neighbor_id"]
        for r in idx.where(F.col("cell") == victim["cell"])
        .select("neighbor_id")
        .collect()
    ]
    delete_from_ivfpq_index(spark, path, dead)
    compact_ivfpq_index(spark, path)
    assert not os.path.isdir(os.path.join(path, f"cell={victim['cell']}"))
    remaining = read_ivfpq_index(spark, path)
    assert remaining.where(F.col("cell") == victim["cell"]).count() == 0
    assert remaining.count() == emb.count() - len(dead)


def test_ivfpq_compaction_spares_concurrent_tombstones(spark, tmp_path):
    """A takedown batch appended while a compaction is mid-fold must
    survive into the next compact — the fold clears exactly the
    tombstone FILES it consumed, never the whole set (sweeping the
    dir would serve the new batch's vectors again)."""
    import os

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.similarity.ann import (
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        read_ivfpq_index,
    )
    from linqonsteroids_spark.similarity.pretrained import IVF_CENTROIDS
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "idx")
    build_ivfpq_index(emb, path, IVF_CENTROIDS)
    first = [r["vec_id"] for r in emb.select("vec_id").limit(3).collect()]
    later = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy(F.desc("vec_id"))
        .limit(3)
        .collect()
    ]
    delete_from_ivfpq_index(spark, path, first)
    # simulate the race: the "mid-compaction" arrival is a second
    # tombstone file the fold below did not list (os.listdir pins the
    # file set before this append in the racy interleaving; here we
    # exercise the contract by appending between two compacts and
    # asserting the second batch is never lost)
    compact_ivfpq_index(spark, path)
    delete_from_ivfpq_index(spark, path, later)
    assert os.path.isdir(os.path.join(path, "_tombstones"))
    # the masked read already hides the new batch pre-compaction
    served = {
        r["neighbor_id"]
        for r in read_ivfpq_index(spark, path)
        .select("neighbor_id")
        .collect()
    }
    assert not (set(first) | set(later)) & served
    cells2 = compact_ivfpq_index(spark, path)
    assert cells2
    assert (
        spark.read.parquet(path)
        .where(F.col("neighbor_id").isin(first + later))
        .count()
        == 0
    )
