"""Standalone saved-workload replay harness (plans/workload.py).

Usage: python tools/workload_replay.py [sf_dir] [log_path]

Day-1 mode (log absent): runs a demo workload over the testdata tables,
RECORDING each query's advisable shapes to the JSONL log, and exits —
nothing is advised yet.

Day-2 mode (log present): replays the log through a fresh
WorkloadAdvisor (no queries run), prints the recommendations,
materializes them, and proves the loop closed by optimizing a fresh
same-shaped query and printing whether the scan reads the advised MV.

Run it twice to see both halves.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from linqonsteroids_spark.api import lift
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.plans.advisor import WorkloadAdvisor
    from linqonsteroids_spark.plans.registry import IndexRepository
    from linqonsteroids_spark.plans.workload import WorkloadLog
    from linqonsteroids_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    log_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.gettempdir(), "linq_workload.jsonl")
    )
    spark = get_spark("workload_replay")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    log = WorkloadLog(log_path)

    if not os.path.exists(log_path):
        print(f"day 1: recording workload shapes -> {log_path}")
        for p in ("1-URGENT", "2-HIGH", "3-MEDIUM"):
            log.record(
                lift(orders, table="orders").filter(
                    lambda o, p=p: o.o_orderpriority == p
                )
            )
        for seg in ("BUILDING", "MACHINERY"):
            log.record(
                lift(customer, table="customer").filter(
                    lambda c, seg=seg: c.c_mktsegment == seg
                )
            )
        log.record(
            lift(orders, table="orders").filter(lambda o: o.o_totalprice > 9.0)
        )  # unrepeated — must not be advised
        print(f"recorded {len(log.entries())} queries; run again to replay")
        return

    print(f"day 2: replaying {log_path}")
    storage = tempfile.mkdtemp(prefix="workload_replay_repo_")
    repo = IndexRepository(spark, storage, n_buckets=8)
    advisor = WorkloadAdvisor(
        repo,
        {
            "orders": lambda: lift(orders, table="orders"),
            "customer": lambda: lift(customer, table="customer"),
        },
        min_count=2,
    )
    n = log.replay_into(advisor)
    print(f"replayed {n} logged queries (no data touched)")
    for table, col, cnt in advisor.advise():
        print(f"  advise: index {table}.{col} (seen {cnt}x)")
    entries = advisor.auto_materialize()
    print(f"materialized {len(entries)} advised index(es)")

    probe = lift(orders, table="orders").filter(
        lambda o: o.o_orderpriority == "5-LOW"
    )
    opt = repo.optimize(probe)
    files = opt.df.inputFiles()
    routed = bool(files) and all("adv_orders_o_orderpriority" in f for f in files)
    print(f"fresh same-shape query routed to advised MV: {routed}")
    print(f"rows: {opt.df.count()}")
    os.remove(log_path)


if __name__ == "__main__":
    main()
