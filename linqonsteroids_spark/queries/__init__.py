"""Query registry: every implemented operator exposed as a (spark_fn, oracle_sql) pair.

Each module defines ``QUERIES: dict[name -> (callable, sql | None)]`` where
the callable takes ``(spark, sf_dir)`` and returns a DataFrame, and the SQL
is the DuckDB-runnable oracle over the same parquet tables. ``None`` marks
genuinely non-SQL-expressible ops (driver records a rows-only check).

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
value-hashing. Double-typed outputs are rounded on BOTH sides so bitwise
summation-order differences between engines cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from linqonsteroids_spark.queries import (
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
    scale, engine, parity, pipeline, contamination, sketches,
]

# The driver's correctness snapshot covers the FIRST 50 registry entries in
# insertion order, so ordering is evidence policy, not cosmetics.  _ROTATION
# pins the front of the registry explicitly, round-4 policy: first the 7
# queries that errored in round 3 on the events.ts encoding change (never a
# green driver row; fixed by catalog.normalize_events_ts), then every query
# whose latest green row is round 2 (rotated out of the r3 window).  7 + 43
# = exactly 50; the 41 queries green in round 3 follow in module order.
_ROTATION = [
    # -- errored in round 3 (ts encoding), never green — fixed this round ----
    "events_value_bands", "streaming_hourly_events",
    "streaming_user_sessions", "streaming_purchase_click_pairs",
    "streaming_dedup_events", "events_trailing_hour_value",
    "kmv_distinct_users",
    # -- new in round 4, never driver-checked --------------------------------
    "doc_chunks", "vocab_coverage", "unigram_surprisal",
    "stratified_split", "ngram_novelty", "dedup_source_priority",
    "sql_surface_revenue", "streaming_enriched_segments",
    "dedup_clusters_bucketed", "advised_segment_lookup",
    "typeindex_event_lookup", "streaming_mv_refresh", "fuzzy_part_pairs",
    "udf_event_features", "corpus_report",
    # -- last green in round 2 (rotated out of the round-3 window; six
    # trivially-stable r1+r2-green gates — brand_* set ops,
    # distinct_segments, nations_indexed, discount_products — ceded their
    # slots to the new round-4 gates) ---------------------------------------
    "event_funnel_stages", "events_json_stats", "supplier_nation_region",
    "customers_with_urgent_orders", "customers_without_orders",
    "nation_pairs_same_region", "customer_order_counts",
    "top_orders_per_priority",
    "events_running_stats", "event_sliding_windows",
    "token_frequencies", "token_stats_bpe", "lang_id",
    "knn_lsh_bucketed", "dedup_simhash_signatures", "dedup_ngram_jaccard",
    "dedup_embedding_pairs", "dedup_survivors", "typefilter_clicks",
    "typecase_events", "orders_monthly_revenue", "events_time_features",
    "cube_priority_status", "asof_purchase_click",
    "asof_purchase_click_bucketed", "nested_guarded_access",
    "nested_array_stats", "nested_explode_positions",
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
