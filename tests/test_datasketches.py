"""Apache DataSketches built-in family (Spark 4.1): mergeable HLL,
theta set operations, KLL quantiles, approx_top_k lifecycle.

The driver gates check the error contracts cross-engine; these tests pin
the sharper single-engine invariants the gates can't express — theta
exact-mode equality below the nominal entry count, KLL's exact n through
an arbitrary merge fold, and approx_top_k exactness below
maxItemsTracked.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_hll_merge_and_direct_within_bounds(spark):
    from linqonsteroids_spark.queries.sketches import hll_sketch_mergeability

    row = hll_sketch_mergeability(spark, SF_SMOKE).collect()[0]
    assert row.exact_custkeys > 0
    assert row.merged_within_3se == 1
    assert row.direct_within_3se == 1


def test_theta_exact_mode_below_nominal_entries(spark):
    # at smoke SF every per-priority custkey set is far below the 4096
    # nominal entries, so the theta sketch never samples: the set-op
    # ESTIMATES equal the exact counts, not just land within bounds
    from linqonsteroids_spark.sources.parquet import register_views

    register_views(spark, SF_SMOKE, ["orders"])
    row = spark.sql("""
        WITH a AS (SELECT theta_sketch_agg(o_custkey) AS sk FROM orders
                   WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT theta_sketch_agg(o_custkey) AS sk FROM orders
               WHERE o_orderpriority = '5-LOW'),
         ua AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
         ub AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '5-LOW')
        SELECT theta_sketch_estimate(theta_union(a.sk, b.sk)) AS e_union,
               theta_sketch_estimate(theta_intersection(a.sk, b.sk))
                   AS e_int,
               (SELECT count(*)
                FROM (SELECT * FROM ua UNION SELECT * FROM ub)) AS x_union,
               (SELECT count(*)
                FROM (SELECT * FROM ua INTERSECT SELECT * FROM ub)) AS x_int
        FROM a, b""").collect()[0]
    assert row.e_union == row.x_union
    assert row.e_int == row.x_int


def test_kll_merged_n_is_exact_and_verdicts_green(spark):
    from linqonsteroids_spark.queries.sketches import kll_quantile_sketch

    rows = {r.l_returnflag: r for r in kll_quantile_sketch(spark, SF_SMOKE).collect()}
    assert "*ALL*" in rows
    per_flag_n = sum(r.n_rows for k, r in rows.items() if k != "*ALL*")
    assert rows["*ALL*"].n_rows == per_flag_n  # merge preserves n exactly
    for r in rows.values():
        assert r.sketch_n_exact == 1
        assert r.median_within_rank_bound == 1


def test_approx_topk_exact_below_max_items_tracked(spark):
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.queries.sketches import approx_topk_lifecycle

    import pyspark.sql.functions as F

    got = {
        r.event_type: r.n_events
        for r in approx_topk_lifecycle(spark, SF_SMOKE).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact  # every item, every count — no approximation
