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
# pins the front of the registry explicitly, round-6 policy: (1) every
# never-driver-green gate — the 3 chronic hash-reds (root-caused this round:
# DuckDB HUGEINT -> float64 in the driver's pandas hash path; oracles now
# CAST to BIGINT, guarded by tests/test_oracle_types.py), the 15 r5 gates
# the 50-slot window couldn't hold (two of which — sql_surface_flag_priority
# and decimal_exact_totals — carried the same HUGEINT/DECIMAL mine and were
# pre-fixed before this, their first, sampling), and the ten new r6 gates;
# (2) the 22 gates last green in round 3 (stalest evidence in the
# registry), which exactly fill the remaining slots. Round-4 and round-5
# greens rotate out (r4 cohort front-loads in r7, see note below).
_ROTATION = [
    # -- never driver-green: chronic reds, now fixed at the real root cause -
    "vocab_coverage", "ngram_novelty", "corpus_report",
    # -- never sampled (r5 window overflow; two pre-fixed type mines) -------
    "customers_without_urgent_orders", "events_hourly_gapfill",
    "null_safe_segment_join", "qty_price_correlation",
    "streaming_trending_users", "span_dedup_clean", "vocab_growth_curve",
    "dedup_simhash_near_pairs", "incremental_mv_time_travel",
    "mv_change_feed", "sql_surface_priority_counts",
    "sql_surface_flag_priority", "streaming_cdc_as_of",
    "decimal_exact_totals", "embedding_quantize_int8",
    # -- new this round: BPE encode (hash-checkable companion to the
    #    rows-only bpe_learned_merges), Okapi BM25 scoring, inverted-index
    #    build, SemDeDup centroid-linkage semantic dedup, point-in-time
    #    feature join, reconciliation digest, column profile ---------------
    "bpe_encode_segments", "bm25_doc_scores", "inverted_postings",
    "semantic_dedup_candidates", "pit_feature_join", "table_digest_orders",
    "profile_orders_columns", "bloom_pruned_revenue", "merge_into_balances",
    "quality_model_scores", "multimodal_audio_stats", "kmv_sketch_union",
    "corpus_wash_report", "nearest_purchase_click",
    "sql_surface_local_revenue", "leakage_safe_split", "referential_audit",
    "hashed_count_vectors", "bigram_surprisal", "lsh_recall_report",
    # -- last green in round 3 (stalest), alphabetical ----------------------
    "bloom_reference_dedup", "cast_matrix", "collect_urgency_scores",
    "corpus_mix_sample", "customer_key_regex", "doc_repetition_scores",
    "first_last_order_per_customer", "grouping_sets_order_totals",
    "multimodal_frame_counts", "multimodal_image_stats",
    "nation_full_outer_counts", "option_last_event",
    #
    # ROUND-7 ROTATION NOTE: order_qty_foldhash, pack_sequences,
    # pii_scrub, pivot_status_counts, quartile_prices_by_flag,
    # quota_per_source, small_quantity_revenue, training_shards,
    # udaf_weighted_price, unpivot_flag_metrics
    # (r3-green, bumped for the twenty new r6 gates) and the
    # round-4-green cohort (46 gates, advised_segment_lookup ..
    # unigram_surprisal, alphabetical) no longer fit this window —
    # front-load them next round after any new never-sampled gates; every
    # registered gate will then have driver evidence from r5 or later
    # within two rounds.
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
