"""Interleaved A/B for the r15 apply_cdf_* single-feed-pass rewrite.

Arms run alternating in ONE session so ambient host throttling hits
both equally. Arm OLD is a frozen copy of the pre-r15 library shape
(protocol isEmpty over the raw feed; lazy delta; lazy MV chain between
windows); arm NEW is the current library + checkpointed MV boundary.

Usage: python tools/ab_cdf.py [--reps N]
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_apply_minmax(mv, changes, group_cols, minmax_cols, table, count_col):
    SF = F
    if not changes.where(SF.col("_change_type") == "update").isEmpty():
        raise ValueError("update rows")
    is_add = SF.col("_change_type").isin("insert", "update_postimage")
    is_ret = SF.col("_change_type").isin("delete", "update_preimage")
    aggs = [SF.sum(SF.when(is_add, 1).otherwise(-1)).alias("_d_n")]
    for out, (op, src) in minmax_cols.items():
        fn = SF.min if op == "min" else SF.max
        aggs.append(fn(SF.when(is_add, SF.col(src))).alias(f"_add_{out}"))
        aggs.append(fn(SF.when(is_ret, SF.col(src))).alias(f"_ret_{out}"))
    delta = (
        changes.where(
            SF.col("_change_type").isin(
                "insert", "delete", "update_preimage", "update_postimage"
            )
        )
        .groupBy(*group_cols)
        .agg(*aggs)
    )
    cond = functools.reduce(
        lambda a, b: a & b,
        [mv[c].eqNullSafe(delta[c]) for c in group_cols],
    )
    hit = SF.lit(False)
    for out, (op, _src) in minmax_cols.items():
        cmp = (
            delta[f"_ret_{out}"] <= mv[out]
            if op == "min"
            else delta[f"_ret_{out}"] >= mv[out]
        )
        hit = hit | (
            delta[f"_ret_{out}"].isNotNull() & mv[out].isNotNull() & cmp
        )
    merged = mv.join(delta, cond, "full_outer").select(
        *[SF.coalesce(mv[c], delta[c]).alias(c) for c in group_cols],
        *[
            (
                (SF.least if op == "min" else SF.greatest)(
                    mv[out], delta[f"_add_{out}"]
                )
            ).alias(out)
            for out, (op, _src) in minmax_cols.items()
        ],
        (
            SF.coalesce(mv[count_col], SF.lit(0))
            + SF.coalesce(delta["_d_n"], SF.lit(0))
        ).alias(count_col),
        (SF.coalesce(mv[count_col].isNotNull() & hit, SF.lit(False))).alias(
            "_rescan"
        ),
    )
    merged = merged.where(SF.col(count_col) > 0)
    rescan_rows = (
        mv.join(SF.broadcast(delta), cond, "inner")
        .where(hit)
        .select(*[mv[c] for c in group_cols])
        .collect()
    )
    if not rescan_rows:
        return merged.drop("_rescan")
    spark = mv.sparkSession
    rg = spark.createDataFrame(rescan_rows, mv.select(*group_cols).schema)
    scan_cond = functools.reduce(
        lambda a, b: a & b,
        [table[c].eqNullSafe(rg[c]) for c in group_cols],
    )
    rescanned = (
        table.join(SF.broadcast(rg), scan_cond, "left_semi")
        .groupBy(*group_cols)
        .agg(
            *[
                (SF.min if op == "min" else SF.max)(SF.col(src)).alias(
                    f"_rs_{out}"
                )
                for out, (op, src) in minmax_cols.items()
            ]
        )
    )
    rcond = functools.reduce(
        lambda a, b: a & b,
        [merged[c].eqNullSafe(rescanned[c]) for c in group_cols],
    )
    return merged.join(rescanned, rcond, "left").select(
        *[merged[c].alias(c) for c in group_cols],
        *[
            F.when(merged["_rescan"], rescanned[f"_rs_{out}"])
            .otherwise(merged[out])
            .alias(out)
            for out, (op, _src) in minmax_cols.items()
        ],
        merged[count_col].alias(count_col),
    )


def main() -> None:
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf_dir = "/root/testdata/sf0.1"

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.session import get_spark
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_minmax_mv,
    )

    spark = get_spark("ab_cdf")
    import tempfile

    path = os.path.join(tempfile.mkdtemp(prefix="ab_cdf_"), "orders_mm")
    table = MorTable(spark, path, "o_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    table.write_base(orders)
    table.append_delta(
        1,
        upserts=orders.where(key % 89 == 0).withColumn(
            "o_orderpriority", F.concat(F.col("o_orderpriority"), F.lit("*"))
        ),
    )
    s1 = table.read(as_of_version=1).withColumn("cents", cents)
    mx = s1.groupBy("o_orderpriority").agg(F.max("cents").alias("_m"))
    dels = (
        s1.join(F.broadcast(mx), "o_orderpriority")
        .where(F.col("cents") == F.col("_m"))
        .select("o_orderkey")
    )
    table.append_delta(2, delete_keys=dels)

    def base_mv():
        return (
            spark.read.parquet(table._base)
            .withColumn("cents", cents)
            .groupBy("o_orderpriority")
            .agg(
                F.min("cents").alias("mn_cents"),
                F.max("cents").alias("mx_cents"),
                F.count("*").cast("bigint").alias("n_orders"),
            )
        )

    mm = {"mn_cents": ("min", "cents"), "mx_cents": ("max", "cents")}

    def run_old():
        mv = base_mv()
        for win in ((0, 1), (1, 2)):
            feed = table.changes(*win, include_preimages=True).withColumn(
                "cents", cents
            )
            mv = old_apply_minmax(
                mv,
                feed,
                ["o_orderpriority"],
                mm,
                table.read(as_of_version=win[1]).withColumn("cents", cents),
                "n_orders",
            )
        return mv

    def run_new():
        mv = base_mv()
        for win in ((0, 1), (1, 2)):
            feed = table.changes(*win, include_preimages=True).withColumn(
                "cents", cents
            )
            mv = apply_cdf_to_minmax_mv(
                mv,
                feed,
                ["o_orderpriority"],
                mm,
                table=table.read(as_of_version=win[1]).withColumn(
                    "cents", cents
                ),
                count_col="n_orders",
            ).localCheckpoint(eager=True)
        return mv

    a = sorted(map(tuple, run_old().collect()))
    b = sorted(map(tuple, run_new().collect()))
    print("result:", "OK" if a == b else "MISMATCH", a[:2])

    times = {"old": [], "new": []}
    for rep in range(reps):
        for name, fn in (("old", run_old), ("new", run_new)):
            spark.sparkContext.setJobDescription(f"ab_cdf {name} rep{rep}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"({', '.join(f'{t:.3f}' for t in ts)})"
        )


if __name__ == "__main__":
    main()
