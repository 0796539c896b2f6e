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
# pins the front of the registry explicitly, round-5 policy (from
# tools/rotation_plan.py staleness ranking, amended for this round's
# changes): (1) never-green gates — the three r4 hash-reds now emitting
# integer-ppm output, plus knn_ivf_trained which no prior window sampled;
# (2) queries whose OUTPUT changed this round (fuzzy_part_pairs' SNM
# rewrite, doc_quality / benchmark_contamination's ppm columns) — their old
# green rows describe the old projection, so they need fresh evidence;
# (3) the 14 remaining gates last green in round 2; (4) round-3 greens by
# staleness until the 50 slots fill. Round-4 greens rotate out entirely.
_ROTATION = [
    # -- never green (r4 hash-reds now integer-ppm; never-sampled IVF) ------
    "vocab_coverage", "ngram_novelty", "corpus_report", "knn_ivf_trained",
    # -- new this round: no prior driver evidence ---------------------------
    "span_dedup_stats", "cdc_latest_snapshot", "cdc_scd2_history",
    "pagerank_order_parts", "weighted_sample_per_source",
    "streaming_cdc_snapshot", "bpe_learned_merges", "triangle_count_coparts",
    "pagerank_order_parts_bucketed", "brand_except_all", "brand_intersect_all",
    # -- output changed this round: need fresh driver rows ------------------
    "fuzzy_part_pairs", "doc_quality", "benchmark_contamination",
    # -- last green in round 2 ----------------------------------------------
    "brand_union", "brand_except", "brand_intersect", "distinct_segments",
    "orders_by_priority", "rollup_priority_status", "customer_name_report",
    "acctbal_buckets", "lineitem_stats", "nations_indexed", "dedup_exact",
    "doc_fingerprints", "label_centroid_norms", "discount_products",
    # -- last green in round 3, staleness order -----------------------------
    "flagship_order_records", "pricing_summary", "shipping_priority",
    "nation_transitive_closure", "knn_bruteforce", "dedup_minhash_pairs",
    "dedup_clusters", "format_roundtrip_supplier",
    "salted_supplier_volume", "salted_status_stats",
    "knn_ivf_exact", "streaming_user_totals", "incremental_mv_event_stats",
    "indexed_segment_lookup", "indexed_computed_key_lookup",
    "indexed_join_lookup", "indexed_chain_lookup", "bucketed_mv_join",
    # (first_last_order_per_customer, customer_key_regex, cast_matrix,
    # option_last_event, multimodal_image_stats, udaf_weighted_price,
    # multimodal_frame_counts, nation_full_outer_counts,
    # small_quantity_revenue, order_qty_foldhash, collect_urgency_scores
    # rotate out this round — r3-green, least stale of the r3 cohort, all
    # pytest-covered — to make window room for the eleven new
    # never-sampled gates; window stays at exactly 50.)
    #
    # ROUND-6 ROTATION NOTE: these round-5 gates did not fit the window
    # and have never been driver-sampled (each IS covered by the sf0.001
    # differential in tests/test_oracle_differential.py) — front-load them
    # next round: customers_without_urgent_orders, events_hourly_gapfill,
    # null_safe_segment_join, qty_price_correlation,
    # streaming_trending_users, span_dedup_clean, vocab_growth_curve,
    # dedup_simhash_near_pairs, incremental_mv_time_travel, mv_change_feed,
    # sql_surface_priority_counts, sql_surface_flag_priority,
    # streaming_cdc_as_of, decimal_exact_totals, embedding_quantize_int8.
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
