"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing = full query wall time to a count-style action (foreach(noop) would
skip result materialization; we use a collect of the aggregated result,
which for these queries is small). Methodology (BASELINE.md): the
reference baseline is steady-state timing (Georges et al. OOPSLA'07, min
10 sample loops); we approximate it with one warm-up execution per query
(amortizing first-run JIT/classloading, ~3-5s on the hash-heavy plans)
and report the following steady-state run. Set SPARK_GRAFT_BENCH_COLD=1
to time single cold runs instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("bench")
    # warm-up: JVM classloading + codegen paths, plus one tiny pandas stage
    # so Python workers are spawned (spark.python.worker.reuse keeps them
    # alive for every later Arrow-batched query).
    ALL["flagship_order_records"][0](spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD") == "1"
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = ALL[name][0]
        if not cold:
            fn(spark, sf_dir).count()  # warm-up: JIT + classload this plan
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
