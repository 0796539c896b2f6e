"""Corpus-hygiene operators (queries/contamination.py + quota sampling):
semantic invariants and the plan shapes that make them scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linqonsteroids_spark.queries.contamination import (
    EVAL_MOD,
    REF_MOD,
    benchmark_contamination,
    bloom_reference_dedup,
)
from linqonsteroids_spark.queries.pipeline import _QUOTA, quota_per_source
from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_contamination_flags_eval_overlap(spark):
    out = benchmark_contamination(spark, SF_SMOKE)
    rows = out.collect()
    # eval docs themselves are excluded from the training side
    assert all(r.doc_id % EVAL_MOD != 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_shingles
        assert r.is_contaminated == (r.n_contaminated >= 3)


def test_contamination_eval_side_is_broadcast(spark):
    # eval n-gram set must be the broadcast side; the corpus must not shuffle
    # except for the final per-doc aggregate
    plan = _physical(benchmark_contamination(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_has_no_false_negatives(spark):
    # plant a probe doc whose text equals a reference doc's text: Bloom must
    # flag it (exact_dup=true implies bloom_maybe_dup=true, always)
    out = bloom_reference_dedup(spark, SF_SMOKE).collect()
    assert all(r.bloom_maybe_dup for r in out if r.exact_dup)
    for r in out:
        assert 0 <= r.n_hits <= 4
        assert r.bloom_maybe_dup == (r.n_hits == 4)
        assert r.doc_id % REF_MOD != 0


def test_bloom_bitmap_is_broadcast_bounded(spark):
    # the (word, bits) bitmap relation is broadcast — never a shuffled join —
    # and its size is bounded by m/32 rows whatever the reference size
    df = bloom_reference_dedup(spark, SF_SMOKE)
    plan = _physical(df)
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_quota_two_stage_equals_single_window(spark):
    # the subshard pre-prune must be invisible in the result: compare with a
    # direct single-window computation
    from pyspark.sql import Window

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.queries.pipeline import _QUOTA_SEED, _hash_frac

    got = {
        (r.doc_id, r.source, r.pick_rank)
        for r in quota_per_source(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    w = Window.partitionBy("source").orderBy(
        _hash_frac(_QUOTA_SEED, F.col("doc_id")), "doc_id"
    )
    want = {
        (r.doc_id, r.source, r.pick_rank)
        for r in docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("pick_rank"),
        )
        .filter(F.col("pick_rank") <= _QUOTA)
        .collect()
    }
    assert got == want


def test_quota_caps_every_source(spark):
    counts = (
        quota_per_source(spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.max("pick_rank").alias("mx"))
        .collect()
    )
    for r in counts:
        assert r.n <= _QUOTA
        assert r.mx == r.n  # ranks are dense 1..n


def test_funnel_single_exchange_and_ordering_invariants(spark):
    import re

    from linqonsteroids_spark.queries.windows import event_funnel_stages

    df = event_funnel_stages(spark, SF_SMOKE)
    plan = _physical(df)
    # the whole funnel rides one hashpartitioning exchange: 3 windows + the
    # final per-user aggregate all reuse the user_id partitioning
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    for r in df.collect():
        assert r.funnel_stage in (0, 1, 2, 3)
        # durations exist exactly from stage 2 / stage 3 up, and are ordered
        assert (r.us_view_to_click is not None) == (r.funnel_stage >= 2)
        assert (r.us_view_to_purchase is not None) == (r.funnel_stage >= 3)
        if r.funnel_stage == 3:
            assert 0 < r.us_view_to_click < r.us_view_to_purchase


def test_kmv_estimate_tracks_exact_count(spark):
    from linqonsteroids_spark.queries.sketches import KMV_K, kmv_distinct_users

    rows = kmv_distinct_users(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.exact_users < KMV_K:
            # sketch degenerates to the exact set below k
            assert r.kmv_est == float(r.exact_users)
        else:
            # ~1/sqrt(k) nominal error; 3 sigma bound keeps flake out
            assert r.rel_err <= 3.0 / (KMV_K ** 0.5), (r.event_type, r.rel_err)
