"""Query registry: every implemented operator exposed as a (spark_fn, oracle_sql) pair.

Each module defines ``QUERIES: dict[name -> (callable, sql | None)]`` where
the callable takes ``(spark, sf_dir)`` and returns a DataFrame, and the SQL
is the DuckDB-runnable oracle over the same parquet tables. ``None`` marks
genuinely non-SQL-expressible ops (driver records a rows-only check).

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
value-hashing. Double-typed outputs are rounded on BOTH sides so bitwise
summation-order differences between engines cannot flip the hash; count
RATIOS go further and are emitted as exact integer parts-per-million via
floor division (round(double, 6) proved hash-unstable across engines at
representation boundaries — the r4 red gates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from linqonsteroids_spark.queries import (
    cdc,
    contamination,
    core,
    dedup,
    engine,
    graph,
    misc,
    nested,
    parity,
    pipeline,
    scale,
    sketches,
    text,
    typed,
    vector,
    windows,
)

_MODULES = [
    core, windows, graph, text, vector, dedup, typed, nested, misc,
    scale, engine, parity, pipeline, contamination, sketches, cdc,
]

# The driver's correctness snapshot covers the FIRST 50 registry entries in
# insertion order, so ordering is evidence policy, not cosmetics.  _ROTATION
# pins the front of the registry explicitly, round-7 policy: (1) the three
# r6 ERR gates, re-fixed this round (top-level ARRAY columns scalarized to
# array_join strings — the driver's pandas canonicalizer cannot sort list
# cells; now banned forever by the SHAPE-HAZARD guard in
# tests/test_oracle_types.py + test_oracle_differential.py) — they MUST
# re-sample green; (2) any gate newly registered in round 7 (never
# sampled); (3) the stalest evidence first — the 10 gates last sampled in
# round 3, then the round-4 cohort (46 gates, alphabetical) as far as the
# window reaches.
_ROTATION = [
    # -- r6 ERR, re-fixed (array columns scalarized): must re-sample green --
    "bpe_encode_segments", "embedding_quantize_int8", "hashed_count_vectors",
    # -- new in round 7 (never driver-sampled): generic Fix combinator with
    #    a user-supplied step (recursive-CTE oracle), count-min sketch
    #    heavy hitters, character-entropy quality score ---------------------
    "fix_order_contagion", "cms_heavy_hitters", "char_entropy_scores",
    "batch_user_sessions", "tfidf_top_terms", "compression_ratio_scores",
    "streaming_outer_purchase_clicks", "interval_overlap_orders",
    "order_price_outliers", "embedding_top_component",
    "variant_event_props", "multimodal_keyframes", "pq_codes",
    "sql_surface_returned_revenue",
    # -- last sampled in round 3 (stalest evidence), alphabetical -----------
    "order_qty_foldhash", "pack_sequences", "pii_scrub",
    "pivot_status_counts", "quartile_prices_by_flag", "quota_per_source",
    "small_quantity_revenue", "training_shards", "udaf_weighted_price",
    "unpivot_flag_metrics",
    # -- last sampled in round 4, alphabetical (window holds the first 37) --
    "advised_segment_lookup", "asof_purchase_click",
    "asof_purchase_click_bucketed", "cube_priority_status",
    "customer_order_counts", "customers_with_urgent_orders",
    "customers_without_orders", "dedup_clusters_bucketed",
    "dedup_embedding_pairs", "dedup_ngram_jaccard",
    "dedup_simhash_signatures", "dedup_source_priority", "dedup_survivors",
    "doc_chunks", "event_funnel_stages", "event_sliding_windows",
    "events_json_stats", "events_running_stats", "events_time_features",
    "events_trailing_hour_value", "events_value_bands", "kmv_distinct_users",
    "knn_lsh_bucketed",
    #
    # ROUND-8 ROTATION NOTE: the 23 remaining r4 gates
    # (lang_id, nation_pairs_same_region, nested_array_stats,
    # nested_explode_positions, nested_guarded_access, orders_monthly_revenue,
    # sql_surface_revenue, stratified_split, streaming_dedup_events,
    # streaming_enriched_segments, streaming_hourly_events,
    # streaming_mv_refresh, streaming_purchase_click_pairs,
    # streaming_user_sessions, supplier_nation_region, token_frequencies,
    # token_stats_bpe, top_orders_per_priority, typecase_events,
    # typefilter_clicks, typeindex_event_lookup, udf_event_features,
    # unigram_surprisal) plus
    # the round-5 cohort (47 gates, acctbal_buckets .. weighted_sample_
    # per_source) front-load next round after any new never-sampled gates;
    # every registered gate then has driver evidence from r6 or later
    # within two rounds.  New r7 gates displace the r4 tail above, pushing
    # the displaced names into the r8 front-load.
]

ALL: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
_BY_MODULE: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        if _k in _BY_MODULE:
            raise ValueError(f"duplicate query name {_k!r}")
        _BY_MODULE[_k] = _v
for _k in _ROTATION:
    ALL[_k] = _BY_MODULE[_k]
for _k, _v in _BY_MODULE.items():
    if _k not in ALL:
        ALL[_k] = _v


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in ALL.items() if v[1] is not None}
