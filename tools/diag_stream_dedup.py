"""One-off diagnostic: phase timing of streaming_dedup_events.

Replays the gate step by step with wall-clock stamps so the micro-batch
cost can be attributed (schema read, stream construction, query run,
memory-sink read + aggregate). Measurement-only; never imported by the
engine.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from linqonsteroids_spark.catalog import normalize_events_ts  # noqa: E402
from linqonsteroids_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("diag_stream_dedup")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

# warm-up: JVM + a tiny streaming query so stream machinery is warm too
spark.read.parquet(f"{sf_dir}/events.parquet").count()

for rep in range(3):
    t0 = time.time()
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    t1 = time.time()
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
    t2 = time.time()
    name = f"diag_dedup_{rep}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.conf.set("spark.sql.shuffle.partitions", old)
    t3 = time.time()
    progress = [
        (p["batchId"], p["durationMs"], p["numInputRows"])
        for p in (q.recentProgress or [])
    ]
    out = (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )
    out.count()
    t4 = time.time()
    print(
        f"rep{rep}: schema {t1-t0:.2f}s build {t2-t1:.2f}s "
        f"run {t3-t2:.2f}s readback {t4-t3:.2f}s"
    )
    for bid, dur, rows in progress:
        print(f"  batch {bid}: rows={rows} durationMs={dur}")
