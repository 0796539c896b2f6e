"""Capture the include_preimages=True change-feed plan + noop timing.

Usage: python tools/cdf_feed_plan.py <suffix>
Writes plans/r15/mor_cdf_feed_<suffix>.txt and prints the noop median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    from linqonsteroids_spark.queries.pipeline import _mor_orders_table
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("cdf_feed_plan")
    table = _mor_orders_table(spark, "/root/testdata/sf0.1")
    feed = table.changes(0, 2, include_preimages=True)
    plan = feed._sc._jvm.PythonSQLUtils.explainString(
        feed._jdf.queryExecution(), "formatted"
    )
    with open(f"plans/r15/mor_cdf_feed_{suffix}.txt", "w") as f:
        f.write(plan)
    times = []
    for _ in range(4):
        t0 = time.time()
        feed.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    print(
        f"noop warm={times[0]:.3f} median={statistics.median(times[1:]):.3f} "
        f"({', '.join(f'{t:.3f}' for t in times[1:])})"
    )
    scans = plan.count("Scan parquet")
    print(f"Scan parquet nodes: {scans}; Window nodes: {plan.count('Window')}")


main()
