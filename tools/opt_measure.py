"""Round-15/16 optimization measurement harness.

Usage:
  python tools/opt_measure.py <query1,query2,...|top> [--sf DIR] [--plans SUFFIX]
         [--reps N]

For each named query: warm-up run, then N timed runs of (a) the bench's
`.count()` action and (b) the guide-§1.4 noop sink (computes every column,
no result pruning). Prints medians and writes `plans/r16/<name>_<SUFFIX>.txt`
with the `.explain("formatted")` output when --plans is given.

This is a measurement tool only — it never touches the bench contract.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    names_arg = args[0] if args else "top"
    sf_dir = "/root/testdata/sf0.1"
    plans_suffix = None
    reps = 3
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--plans" in args:
        plans_suffix = args[args.index("--plans") + 1]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])

    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    names = names_arg.split(",")
    for n in names:
        if n not in ALL:
            raise SystemExit(f"unknown query: {n}")

    spark = get_spark("opt_measure")
    # same warm-up as bench.py: JVM + Python workers
    ALL["flagship_order_records"][0](spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = ALL[name][0]
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        df = fn(spark, sf_dir)
        if plans_suffix:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        # warm-up for this plan
        fn(spark, sf_dir).count()
        counts, noops = [], []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            counts.append(time.time() - t0)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noops.append(time.time() - t0)
        print(
            f"{name}: count median {statistics.median(counts):.3f}s "
            f"({', '.join(f'{s:.3f}' for s in counts)}) | "
            f"noop median {statistics.median(noops):.3f}s "
            f"({', '.join(f'{s:.3f}' for s in noops)})",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
