"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing = full query wall time to a count-style action (foreach(noop) would
skip result materialization; we use a collect of the aggregated result,
which for these queries is small). Methodology (BASELINE.md): steady-state
timing per Georges et al. (OOPSLA'07) — one warm-up execution (JIT +
classloading), then repeated timed runs until the coefficient of variation
of the last three samples drops under 5% (max 5 samples), reporting the
MEDIAN. Medians make round-over-round regressions attributable to code, not
to machine load at snapshot time. Set SPARK_GRAFT_BENCH_COLD=1 to time
single cold runs instead.

The HEADLINE list is frozen to round 1's 22 queries so suite totals stay
comparable across rounds; operators added later are timed in the separate
``extra_queries`` field, which does not count toward ``value``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS_MIN = 3
REPS_MAX = 5
COV_CUTOFF = 0.05

#: headline queries — a representative slice across operator families:
#: joins/aggs, top-k, windows, as-of/range, nested arrays, text, dedup
#: ladder, vector search (exact + IVF), iterative graph, skew mitigation,
#: index rewrite, pandas UDAF, multimodal, streaming.
HEADLINE = [
    "flagship_order_records",
    "pricing_summary",
    "shipping_priority",
    "customer_order_counts",
    "grouping_sets_order_totals",
    "pivot_status_counts",
    "top_orders_per_priority",
    "events_running_stats",
    "asof_purchase_click",
    "events_value_bands",
    "nested_array_stats",
    "token_frequencies",
    "dedup_exact",
    "dedup_minhash_pairs",
    "knn_bruteforce",
    "knn_ivf_exact",
    "nation_transitive_closure",
    "salted_status_stats",
    "indexed_segment_lookup",
    "udaf_weighted_price",
    "multimodal_image_stats",
    "streaming_hourly_events",
]

#: operators added after round 1 — timed, reported, excluded from the total
EXTRA = [
    "indexed_chain_lookup",
    "bucketed_mv_join",
    "knn_lsh_bucketed",
    "asof_purchase_click_bucketed",
    "streaming_purchase_click_pairs",
    "incremental_mv_event_stats",
    "streaming_dedup_events",
    "dedup_survivors",
    "corpus_mix_sample",
    "pack_sequences",
    "training_shards",
    "doc_repetition_scores",
    "pii_scrub",
    "benchmark_contamination",
    "bloom_reference_dedup",
    "quota_per_source",
    "event_funnel_stages",
    "kmv_distinct_users",
    "doc_chunks",
    "vocab_coverage",
    "unigram_surprisal",
    "stratified_split",
    "ngram_novelty",
    "dedup_source_priority",
    "streaming_enriched_segments",
    "dedup_clusters_bucketed",
    "advised_segment_lookup",
    "typeindex_event_lookup",
    "streaming_mv_refresh",
    "fuzzy_part_pairs",
    "udf_event_features",
    "span_dedup_stats",
    "cdc_latest_snapshot",
    "cdc_scd2_history",
    "pagerank_order_parts",
    "weighted_sample_per_source",
    "streaming_cdc_snapshot",
    "bpe_learned_merges",
    "triangle_count_coparts",
    "pagerank_order_parts_bucketed",
    "events_hourly_gapfill",
    "streaming_trending_users",
    "span_dedup_clean",
    "vocab_growth_curve",
    "dedup_simhash_near_pairs",
    "incremental_mv_time_travel",
    "mv_change_feed",
    "sql_surface_priority_counts",
    "sql_surface_flag_priority",
    "streaming_cdc_as_of",
    "decimal_exact_totals",
    "embedding_quantize_int8",
    "bpe_encode_segments",
    "bm25_doc_scores",
    "inverted_postings",
    "semantic_dedup_candidates",
    "pit_feature_join",
    "table_digest_orders",
    "profile_orders_columns",
    "bloom_pruned_revenue",
    "merge_into_balances",
    "quality_model_scores",
    "multimodal_audio_stats",
    "kmv_sketch_union",
    "corpus_wash_report",
    "nearest_purchase_click",
    "sql_surface_local_revenue",
    "leakage_safe_split",
    "referential_audit",
    "hashed_count_vectors",
    "bigram_surprisal",
    "lsh_recall_report",
    "fix_order_contagion",
    "cms_heavy_hitters",
    "char_entropy_scores",
    "batch_user_sessions",
    "tfidf_top_terms",
    "compression_ratio_scores",
    "streaming_outer_purchase_clicks",
    "interval_overlap_orders",
    "order_price_outliers",
    "embedding_top_component",
    "variant_event_props",
    "multimodal_keyframes",
    "pq_codes",
    "sql_surface_returned_revenue",
    # round 8-9 additions (kept to the fast high-signal heads: the
    # driver's bench window is finite and its log capture is
    # tail-truncated, so streaming-floor gates with documented fixed
    # costs stay out)
    "ann_ivfpq_topk",
    "dag_reachability_rcte",
    "sql_surface_small_qty_revenue",
    "hll_sketch_mergeability",
    "theta_sketch_setops",
    "kll_quantile_sketch",
    "approx_topk_lifecycle",
    "sql_surface_forecast_revenue",
    "sql_surface_supplier_variety",
    "collated_segment_stats",
    # round 10: the modern-SQL heads + the new scale operators (the
    # index/compaction/dedup gates keyed by cached artifacts measure
    # steady-state probe cost, same as the other indexed heads)
    "groupby_all_pricing",
    "bitmap_exact_distinct",
    "filter_clause_status_matrix",
    "lateral_api_latest_order",
    "events_range_frame_sums",
    "indexed_range_lookup",
    "dedup_incremental_lsh",
    "compaction_event_stats",
    "advised_range_lookup",
    # the 7 r10 heads the r10 verdict found untimed — every round's new
    # heads get at least one extras timing from r11 on (enforced by
    # tests/test_registry.py::test_every_gate_timed_or_allowlisted)
    "listagg_top_orders",
    "sql_udf_price_tiers",
    "sql_table_udf_big_orders",
    "identifier_param_rollup",
    "try_divide_margins",
    "mode_event_types",
    "streaming_dedup_ingest",
    # round 11 heads
    "indexed_in_lookup",
    "mv_stale_fallback",
    "advised_refresh_rollup",
    "dpp_partition_revenue",
    "deterministic_sample_orders",
    "parameterized_sql_revenue",
    "hotkey_salted_volume",
    "bloom_layout_lookup",
    "partition_compaction_stats",
    # round 12 heads
    "fuzzy_name_neighbors",
    "snapshot_diff_orders",
    # round 13 heads
    "snapshot_diff_changed_cols",
    "snapshot_diff_bucketed_orders",
    "digest_manifest_audit",
    "streaming_audited_ingest",
    "fuzzy_name_neighbors_k2",
    "mor_time_travel_orders",
    "digest_manifest_incremental",
    "ann_matryoshka_adc",
    "price_qty_regression",
    "zorder_range_scan",
    "cohort_retention",
    "basket_brand_pairs",
    "mor_read_orders",
    "result_cache_revenue",
    "runtime_bloom_join",
    "wap_publish_orders",
    "user_activity_streaks",
    "phrase_search_postings",
    "file_provenance_counts",
    "fileindex_range_scan",
    "dynamic_partition_backfill",
    "matryoshka_recall_report",
    "k_anonymity_audit",
    "keyset_paginated_orders",
    # round 14 heads
    "mor_schema_evolution",
    "mor_manifest_reconciliation",
    "mor_change_feed_orders",
    "mor_cdf_agg_maintenance",
    "mor_merge_into_orders",
    "mor_stream_cdf_mv",
    "mor_log_compaction_orders",
    "mor_point_lookup_orders",
    "mor_provenance_orders",
    "quarantine_replay_release",
    "mor_concurrent_writers",
    "mor_timestamp_travel_orders",
    "mor_multi_clause_merge",
    "mor_minmax_mv_maintenance",
    "mor_retention_sync",
    "takedown_lsh_maintenance",
    "mor_tagged_reads",
    "mor_consumer_feed_mv",
    "mor_txn_takedown",
    "mor_bloom_fingerprint_lookup",
    "mor_stream_txn_ingest",
    "ann_takedown_search",
]

# -- timing-coverage allowlist (r11) ------------------------------------------
# Every registered gate must appear in HEADLINE, EXTRA, or here — with a
# reason — so a new head can never silently ship untimed again
# (tests/test_registry.py asserts the three sets exactly tile the
# registry). These are the pre-r11 backlog, bucketed by why timing them
# adds no signal; promote any of them to EXTRA when that stops holding.
_R_VARIANT = (
    "micro-variant of a family whose representative is timed in "
    "HEADLINE/EXTRA; adds a row to the bench window, not information"
)
_R_FLOOR = (
    "dominated by a documented fixed floor at toy SF (micro-batch "
    "startup, partitioned-write/localCheckpoint commit, subprocess "
    "staging) — timing measures the floor, not the operator"
)
_R_PROBE = (
    "raising-discipline index/MV gate whose steady-state probe cost is "
    "timed via the indexed_*/advised_* heads already in EXTRA"
)
UNTIMED_ALLOWLIST = {
    # core/misc/parity/nested/typed/windows set-op + SQL-surface variants
    **dict.fromkeys(
        [
            "customers_with_urgent_orders", "customers_without_orders",
            "supplier_nation_region", "customers_without_urgent_orders",
            "nation_pairs_same_region", "brand_union", "brand_except",
            "brand_intersect", "brand_except_all", "brand_intersect_all",
            "distinct_segments", "orders_by_priority",
            "rollup_priority_status", "customer_name_report",
            "acctbal_buckets", "lineitem_stats",
            "qty_price_correlation", "first_last_order_per_customer",
            "customer_key_regex", "cast_matrix", "option_last_event",
            "sql_surface_market_share", "sql_surface_nation_profit",
            "sql_surface_custdist", "sql_surface_disjunctive_parts",
            "sql_pipe_pricing_summary", "sql_script_threshold_search",
            "sessionvar_param_exec", "discount_products",
            "sql_surface_revenue",
            "nation_full_outer_counts", "null_safe_segment_join",
            "collect_urgency_scores", "union_by_name_evolution",
            "small_quantity_revenue", "events_trailing_hour_value",
            "order_qty_foldhash", "quartile_prices_by_flag",
            "unpivot_flag_metrics",
            "nested_guarded_access", "nested_explode_positions",
            "typefilter_clicks", "xml_roundtrip_orders",
            "typecase_events", "events_json_stats",
            "orders_monthly_revenue", "events_time_features",
            "cube_priority_status",
            "event_sliding_windows", "orders_ranking_functions",
            "nations_indexed",
            "sql_surface_large_orders", "sql_surface_waiting_suppliers",
            "sql_surface_idle_rich_customers",
            "sql_surface_volume_shipping", "sql_surface_top_supplier",
            "sql_surface_promo_revenue", "sql_surface_lateral_topk",
            "sql_surface_nation_census", "sql_surface_null_aware_anti",
            "sql_surface_priority_check",
            "sql_surface_value_concentration",
            "sql_surface_excess_suppliers",
            "hll_distinct_bounds", "approx_quantile_bounds",
            "arrow_native_token_stats", "udtf_bigram_stats",
            "udtf_trigram_stats", "token_stats_bpe", "lang_id",
            "doc_fingerprints", "doc_quality",
            "dedup_simhash_signatures", "dedup_ngram_jaccard",
            "dedup_embedding_pairs", "dedup_clusters",
            "corpus_report", "wash_observed_metrics",
            "salted_supplier_volume", "knn_ivf_trained",
            "ann_ivfpq_adc", "dedup_pq_sdc_pairs", "sdc_dedup_survivors",
            "ann_recall_report", "label_centroid_norms",
            "multimodal_frame_counts", "audio_vad_segments",
            "multimodal_resize_stats",
        ],
        _R_VARIANT,
    ),
    **dict.fromkeys(
        [
            "streaming_user_sessions", "streaming_user_totals",
            "statestore_reader_counts", "streaming_ann_ingest",
            "ann_index_persisted", "mor_stream_upserts",
            "pyds_ledger_rollup", "pyds_stream_ingest",
            "pyds_write_roundtrip", "pyds_stream_sink",
            "format_roundtrip_supplier", "schema_evolution_orders",
        ],
        _R_FLOOR,
    ),
    **dict.fromkeys(
        [
            "agg_mv_rollup", "agg_mv_optimized_rollup",
            "workload_replay_lookup", "advised_agg_rollup",
            "indexed_computed_key_lookup", "indexed_join_lookup",
        ],
        _R_PROBE,
    ),
}


def _envgated_allowlist() -> dict[str, str]:
    """Mirror queries/envgated.py's capability probes so the registry
    tiling stays exact whether or not this sandbox can run the
    typed-state / avro gates (they self-register when the runtime
    appears; they land here, floor-dominated, until promoted)."""
    try:
        from linqonsteroids_spark.queries import envgated
    except Exception:
        return {}
    return dict.fromkeys(envgated.QUERIES, _R_FLOOR)


UNTIMED_ALLOWLIST.update(_envgated_allowlist())


def _calibrate() -> float:
    """Fixed single-threaded CPU-bound loop (~0.3 s on a quiet core).

    Round-9 postmortem: the same code measured 9.9 s in the morning and
    11.4-14.7 s in the afternoon under ambient CPU steal — every query
    uniformly 1.2-1.5x slower, nothing attributable to the diff. This
    canary makes that machine state VISIBLE in the bench artifact: if
    calib_*_sec is inflated vs other rounds, suite drift is machine
    noise, not a regression. Pure-python xorshift so the number depends
    on nothing but the interpreter and the core it runs on."""
    t0 = time.time()
    x = 88172645463325252
    for _ in range(3_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return round(time.time() - t0, 3)


def _parallel_efficiency() -> float | None:
    """Full-width/single-thread throughput ratio (1.0 = every core
    delivers; lower = the host is narrowing us).

    The r13 postmortem class the single-thread canary CANNOT see: two
    back-to-back runs measured 14.6 s against a 9.7 s morning run with
    calib_*_sec IDENTICAL (0.70 s) and steal under 1% — but a 32-way
    burn showed median per-task time 1.5x the single-thread time, i.e.
    the VM's vCPUs were being width-throttled by the host (firecracker
    steal accounting misses it). This canary runs the same xorshift
    loop on every core via multiprocessing and reports
    single_time / median_parallel_time, making that state visible in
    the artifact: uniform suite drift with a sunk parallel_efficiency
    is machine narrowing, not a code regression."""
    try:
        import multiprocessing as mp

        n = mp.cpu_count()
        single = _calibrate()
        with mp.Pool(n) as pool:
            times = pool.map(_calib_task, range(n))
        times.sort()
        return round(single / times[n // 2], 3)
    except Exception:  # noqa: BLE001 — canary must never kill the bench
        return None


def _calib_task(_):
    return _calibrate()


def _proc_stat_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat's aggregate cpu line."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:
        return None


#: steal share above which a run is stamped contended and refuses to
#: pose as evidence (r10 verdict item 6: a 2.55% steal measured 1.16x,
#: a 10.9% steal measured 2.6x — the driver's own runs sit at 0.1-1.7%)
STEAL_CONTENDED_PCT = 3.0

#: per-query drift threshold (r11 verdict item 4): a median more than
#: this multiple of the committed BENCH_LOCAL history triggers an
#: automatic solo re-probe and a stamped adjudication, so a single
#: query's ambient outlier (nearest_purchase_click's unexplained 6.4x
#: in r11) can never masquerade as a code regression again
DRIFT_RATIO = 2.0


def _prev_timings(sf: str) -> dict[str, float]:
    """Per-query medians from the COMMITTED BENCH_LOCAL.json (HEAD, not
    the working tree — smoke runs at other SFs overwrite the file);
    empty when absent or recorded at a different scale factor."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10,
        ).stdout
        prev = json.loads(out.splitlines()[0])
    except Exception:
        return {}
    if str(prev.get("sf")) != sf:
        return {}
    return {**prev.get("queries", {}), **prev.get("extra_queries", {})}


def _function_changed_since_artifact(query_fn) -> bool:
    """True when the query FUNCTION's own source text differs from what
    it was at the last commit touching BENCH_LOCAL.json — the 'code'
    adjudication leg: a >2x mover whose function nobody edited cannot be
    claimed a code regression without a re-probe. Module-granularity
    matching (the first r12 shape of this check) over-attributes: gate
    modules grow by APPENDING new gates, which stamped every co-resident
    query 'code' on a pure addition (weighted_sample_per_source vs a
    pipeline.py append). Function-body granularity can still
    under-attribute when only a shared helper changed — the re-probe
    leg's 'persistent-unexplained' verdict is the backstop for that."""
    import inspect
    import subprocess

    try:
        src_now = inspect.getsource(query_fn)
        mod_file = os.path.abspath(inspect.getsourcefile(query_fn))
        repo = os.path.dirname(os.path.abspath(__file__))
        rel = os.path.relpath(mod_file, repo)
        artifact_commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", "BENCH_LOCAL.json"],
            capture_output=True,
            text=True,
            cwd=repo,
            timeout=10,
        ).stdout.strip()
        if not artifact_commit:
            return True
        old = subprocess.run(
            ["git", "show", f"{artifact_commit}:{rel}"],
            capture_output=True,
            text=True,
            cwd=repo,
            timeout=10,
        )
        if old.returncode != 0:
            return True  # module did not exist at the artifact commit
        return src_now not in old.stdout
    except Exception:
        return True  # unknowable -> don't claim 'ambient'


class _StreamCounter:
    """StreamingQueryListener counting query starts and micro-batch
    progress events, so the bench can decompose streaming-gate timings
    into n_microbatches x per-trigger floor (r11 verdict item 8: the
    streaming family's solo spread is trigger-bound, not data-bound —
    the artifact should say so by construction)."""

    def __init__(self) -> None:
        self.starts = 0
        self.progress = 0

    def attach(self, spark) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        counter = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                counter.starts += 1

            def onQueryProgress(self, event):
                counter.progress += 1

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        spark.streams.addListener(_L())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    calib_before = _calibrate()
    par_eff = _parallel_efficiency()
    stat_before = _proc_stat_ticks()

    spark = get_spark("bench")
    # warm-up: JVM classloading + codegen paths, plus one tiny pandas stage
    # so Python workers are spawned (spark.python.worker.reuse keeps them
    # alive for every later Arrow-batched query).
    ALL["flagship_order_records"][0](spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD") == "1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    prev_timings = _prev_timings(sf)
    streams = _StreamCounter()
    streams.attach(spark)
    streaming_decomp: dict[str, dict] = {}
    drift: dict[str, dict] = {}

    def measure(name: str) -> float:
        fn = ALL[name][0]
        starts0, progress0 = streams.starts, streams.progress
        t_all0 = time.time()
        if cold:
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            print(f"# {name}: {n} rows in {dt}s (cold)", file=sys.stderr)
            return dt
        fn(spark, sf_dir).count()  # warm-up: JIT + classload this plan
        samples: list[float] = []
        n = 0
        while len(samples) < REPS_MAX:
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
            if len(samples) >= REPS_MIN:
                tail = samples[-REPS_MIN:]
                m = statistics.mean(tail)
                if m > 0 and statistics.stdev(tail) / m < COV_CUTOFF:
                    break
        med = round(statistics.median(samples), 3)
        print(
            f"# {name}: {n} rows, median {med}s over {len(samples)} samples "
            f"({', '.join(f'{s:.3f}' for s in samples)})",
            file=sys.stderr,
        )
        # streaming decomposition: listener events are async, give the
        # bus a beat before snapshotting. One invocation = warm-up +
        # len(samples) timed runs.
        if streams.starts > starts0:
            time.sleep(0.3)
            invocations = len(samples) + 1
            n_mb = streams.progress - progress0
            elapsed = time.time() - t_all0 - 0.3
            streaming_decomp[name] = {
                "stream_starts": streams.starts - starts0,
                "microbatches": n_mb,
                "invocations": invocations,
                "microbatches_per_invocation": round(n_mb / invocations, 1),
                "sec_per_microbatch": (
                    round(elapsed / n_mb, 3) if n_mb else None
                ),
            }
        # drift guard (r11 item 4): adjudicate any >DRIFT_RATIO mover vs
        # the committed history before it can read as a regression
        prev = prev_timings.get(name)
        if prev and prev > 0 and med > prev * DRIFT_RATIO:
            if _function_changed_since_artifact(fn):
                verdict = "code"
                reprobe = None
            else:
                rs = []
                for _ in range(3):
                    t0 = time.time()
                    fn(spark, sf_dir).count()
                    rs.append(time.time() - t0)
                reprobe = round(statistics.median(rs), 3)
                verdict = (
                    "ambient"
                    if reprobe <= prev * DRIFT_RATIO
                    else "persistent-unexplained"
                )
            drift[name] = {
                "prev": prev,
                "median": med,
                "ratio": round(med / prev, 2),
                "reprobe": reprobe,
                "drift": verdict,
            }
            print(f"# {name}: DRIFT {drift[name]}", file=sys.stderr)
        return med

    timings = {name: measure(name) for name in HEADLINE}
    extra = {name: measure(name) for name in EXTRA if name in ALL}

    total = round(sum(timings.values()), 3)
    calib_after = _calibrate()
    stat_after = _proc_stat_ticks()
    steal_pct = None
    if stat_before and stat_after and stat_after[1] > stat_before[1]:
        steal_pct = round(
            100.0
            * (stat_after[0] - stat_before[0])
            / (stat_after[1] - stat_before[1]),
            2,
        )
    # contention refusal (r10 item 6): a run timed under heavy ambient
    # steal is machine noise wearing a benchmark's clothes. The artifact
    # is still printed and persisted — stamped contended — but the tool
    # exits non-zero so automation cannot record it as a clean number.
    forced = (
        os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1"
        or "--force" in sys.argv
    )
    contended = steal_pct is not None and steal_pct > STEAL_CONTENDED_PCT
    line = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "extra_queries": extra,
            "method": f"median of <= {REPS_MAX} steady-state runs, CoV cutoff {COV_CUTOFF}",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            # machine-state canaries (round-9 ambient-steal postmortem):
            # a fixed single-core python loop timed before/after the
            # suite, plus /proc/stat steal-tick share across the run —
            # inflated canaries mean machine noise, not a regression
            "calib_before_sec": calib_before,
            "calib_after_sec": calib_after,
            "parallel_efficiency": par_eff,
            "steal_pct": steal_pct,
            "contended": contended,
            # r12: stamped >2x movers (vs committed history) and the
            # trigger-count decomposition of every streaming-family gate
            "drift": drift,
            "streaming_decomp": streaming_decomp,
            "headline_total_sec": total,
        }
    )
    print(line)
    # The driver keeps only stdout's LAST ~2000 chars, which truncates
    # the full line above mid-map (BENCH_r11 retained ~60 of 143 pairs).
    # So the FINAL line is a compact, parseable artifact that fits the
    # tail whole: every timed value as "%.3f", comma-joined in
    # sorted-name order, with the name list pinned by a sha256 prefix —
    # the names themselves are recoverable from this commit's
    # HEADLINE/EXTRA lists, making BENCH_r{N} self-sufficient for
    # cross-round per-query comparison (r11 verdict item 6).
    all_t = {**timings, **extra}
    names = sorted(all_t)
    import hashlib

    compact = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "calib_before_sec": calib_before,
            "calib_after_sec": calib_after,
            "parallel_efficiency": par_eff,
            "steal_pct": steal_pct,
            "contended": contended,
            "n_queries": len(names),
            "names_sha256": hashlib.sha256(
                ",".join(names).encode()
            ).hexdigest()[:12],
            "timings_by_sorted_name": ",".join(
                f"{all_t[n]:.3f}" for n in names
            ),
            "n_drift": len(drift),
            "drift_verdicts": {k: v["drift"] for k, v in drift.items()},
        },
        separators=(",", ":"),
    )
    print(compact)
    # Belt-and-braces: the driver captures stdout's tail, which has been
    # truncated before (BENCH_r05 lost the headline total). Persist the
    # FULL line to a file so the rich map survives any capture failure.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as f:
            f.write(line + "\n")
            f.write(compact + "\n")
    except OSError:
        pass
    if contended and not forced:
        print(
            f"# CONTENDED: steal_pct {steal_pct} > {STEAL_CONTENDED_PCT} — "
            "this run is machine noise, rerun on a quiet host (or pass "
            "--force / SPARK_GRAFT_BENCH_FORCE=1 to accept it anyway)",
            file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    from tools.evidence_lock import evidence_lock

    with evidence_lock("bench"):
        main()
