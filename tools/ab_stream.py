"""Round-15 interleaved A/B harness for the streaming gate changes:

  dedup  — streaming_dedup_events with vs without the trailing no-data
           (watermark-advance) micro-batch
  outer  — streaming_outer_purchase_clicks with maxFilesPerTrigger=1
           (3 micro-batches) vs one data batch + watermark flush (2)

Variants replay the FULL gate (stream start to readback) interleaved in
ONE session so host drift hits both arms equally; result identity is
asserted on every rep before timings are reported.

Usage: python tools/ab_stream.py <dedup|outer> [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run_dedup(spark, sf_dir, no_data_batches):
    from linqonsteroids_spark.catalog import normalize_events_ts
    from linqonsteroids_spark.queries.scale import (
        _MV_IDS,
        _run_stream_to_memory,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        normalize_events_ts(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"ab_dedup_{next(_MV_IDS)}"
    _run_stream_to_memory(
        spark, stream, name, "append", no_data_batches=no_data_batches
    )
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )


def run_outer(spark, sf_dir, one_file_per_trigger):
    import shutil
    import tempfile

    from linqonsteroids_spark.catalog import normalize_events_ts
    from linqonsteroids_spark.queries.scale import (
        _MV_IDS,
        _run_stream_to_memory,
    )
    from linqonsteroids_spark.streaming.incremental import (
        stream_stream_interval_join,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = dict(base.dtypes)["ts"]
    stage = tempfile.mkdtemp(prefix="ab_outer_stage_")
    try:
        shutil.copy(
            f"{sf_dir}/events.parquet", f"{stage}/part-0-events.parquet"
        )
        far = (
            F.lit(4102444800 * 10**9).cast("long")
            if ts_dtype == "bigint"
            else F.lit("2100-01-01 00:00:00").cast(ts_dtype)
        )
        one = base.limit(1)

        def sentinel(eid, etype):
            return one.select(
                F.lit(eid).cast("long").alias("event_id"),
                far.alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit(etype).alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )

        sentinel(10**9, "click").union(
            sentinel(10**9 + 1, "purchase")
        ).coalesce(1).write.mode("overwrite").parquet(f"{stage}/z")
        for f in os.listdir(f"{stage}/z"):
            if f.endswith(".parquet"):
                shutil.move(
                    f"{stage}/z/{f}", f"{stage}/part-9-sentinel.parquet"
                )
        shutil.rmtree(f"{stage}/z")

        reader = spark.readStream.schema(base.schema)
        if one_file_per_trigger:
            reader = reader.option("maxFilesPerTrigger", "1")
        events = normalize_events_ts(reader.parquet(stage))
        purchases = events.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        clicks = events.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value"),
        )
        joined = stream_stream_interval_join(
            purchases,
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS"))
            & (F.col("c_ts") < F.col("p_ts")),
            left_time="p_ts",
            right_time="c_ts",
            how="left_outer",
        )
        name = f"ab_ssouter_{next(_MV_IDS)}"
        _run_stream_to_memory(spark, joined, name, "append", state_partitions=4)
        out = (
            spark.table(name)
            .filter(F.col("p_user") >= 0)
            .select(
                "purchase_id",
                "click_id",
                F.round("value", 4).alias("click_value"),
            )
        )
        rows = out.collect()  # materialize before the staging dir dies
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def main():
    from linqonsteroids_spark.session import get_spark

    which = sys.argv[1]
    args = sys.argv[2:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 3
    sf_dir = (
        args[args.index("--sf") + 1]
        if "--sf" in args
        else "/root/testdata/sf0.1"
    )
    spark = get_spark(f"ab_stream_{which}")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warm-up

    if which == "dedup":
        variants = {
            "old(noData on)": lambda: run_dedup(spark, sf_dir, True),
            "new(noData off)": lambda: run_dedup(spark, sf_dir, False),
        }
    elif which == "outer":
        variants = {
            "old(1 file/trigger)": lambda: run_outer(spark, sf_dir, True),
            "new(all files)": lambda: run_outer(spark, sf_dir, False),
        }
    else:
        raise SystemExit(f"unknown target {which}")

    # result identity once up front
    frames = {k: fn() for k, fn in variants.items()}
    sets = {
        k: sorted(tuple(r) for r in df.collect()) for k, df in frames.items()
    }
    vals = list(sets.values())
    assert vals[0] == vals[1], "VARIANTS DISAGREE"
    print(f"results identical: {len(vals[0])} rows")

    times = {k: [] for k in variants}
    for rep in range(reps):
        for k, fn in variants.items():
            t0 = time.time()
            df = fn()
            df.count()
            times[k].append(time.time() - t0)
            print(f"  rep{rep} {k}: {times[k][-1]:.3f}s", flush=True)
    for k, ts in times.items():
        print(
            f"{k}: median {statistics.median(ts):.3f}s "
            f"({', '.join(f'{s:.3f}' for s in ts)})"
        )


if __name__ == "__main__":
    main()
