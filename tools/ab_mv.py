"""Interleaved A/B for the r15 IncrementalAggMV-family _merge change
(partial localCheckpoint + bucket-aligned generation writes).

Old and new _merge implementations alternate in ONE Spark session so
ambient host drift hits both arms equally. Each rep runs the full gate
invocation (scratch dirs, streaming machinery) and times gate() +
noop sink. Result identity is asserted on the first rep pair.

Usage: python tools/ab_mv.py [--reps N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def old_incagg_merge(self, batch_df, batch_id):
    merge_ops = {"sum": F.sum, "min": F.min, "max": F.max}
    partial = (
        batch_df.groupBy(self.key)
        .agg(*[v.alias(n) for n, (_, v) in self.aggs.items()])
        .withColumn("mv_bucket", self._bucket())
    )
    old = self._read_mv_or_none()
    if old is None:
        self._write_meta()
        merged = partial
    else:
        self._check_meta()
        touched = [
            r.mv_bucket
            for r in partial.select("mv_bucket").distinct().collect()
        ]
        merged = (
            old.filter(F.col("mv_bucket").isin(touched))
            .unionByName(partial)
            .groupBy(self.key, "mv_bucket")
            .agg(
                *[
                    merge_ops[op](F.col(n)).alias(n)
                    for n, (op, _) in self.aggs.items()
                ]
            )
        )
    merged = merged.repartition(F.col("mv_bucket")).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("mv_bucket")
        .parquet(self.mv_path)
    )


def old_vagg_merge(self, batch_df, batch_id):
    import os as _os

    merge_ops = {"sum": F.sum, "min": F.min, "max": F.max}
    partial = (
        batch_df.groupBy(self.key)
        .agg(*[v.alias(n) for n, (_, v) in self.aggs.items()])
        .withColumn("mv_bucket", self._bucket())
    )
    vs = self.versions()
    prev = self._read_manifest(vs[-1]) if vs else {}
    if not vs:
        self._write_meta()
    else:
        self._check_meta()
    touched = [
        str(r.mv_bucket)
        for r in partial.select("mv_bucket").distinct().collect()
    ]
    old_files = [f for b in touched for f in prev.get(b, [])]
    if old_files:
        old = self.spark.read.option("basePath", self.mv_path).parquet(*old_files)
        merged = (
            old.select(partial.columns)
            .unionByName(partial)
            .groupBy(self.key, "mv_bucket")
            .agg(
                *[
                    merge_ops[op](F.col(n)).alias(n)
                    for n, (op, _) in self.aggs.items()
                ]
            )
        )
    else:
        merged = partial
    version = (vs[-1] if vs else 0) + 1
    gen_dir = _os.path.join(self.mv_path, "data", f"g{version}")
    merged.write.mode("overwrite").partitionBy("mv_bucket").parquet(gen_dir)
    manifest = dict(prev)
    new_files = self._list_bucket_files(gen_dir)
    for b in touched:
        manifest[b] = new_files.get(b, [])
    self._commit_manifest(version, manifest)


def main() -> None:
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark
    from linqonsteroids_spark.streaming import incremental as inc

    spark = get_spark("ab_mv")
    ALL["flagship_order_records"][0](spark, SF_DIR).count()

    new_incagg = inc.IncrementalAggMV._merge
    new_vagg = inc.VersionedAggMV._merge

    gates = {
        "incremental_mv_event_stats": ("incagg", ALL["incremental_mv_event_stats"][0]),
        "incremental_mv_time_travel": ("vagg", ALL["incremental_mv_time_travel"][0]),
        "mv_change_feed": ("vagg", ALL["mv_change_feed"][0]),
    }

    def set_arm(kind: str, arm: str) -> None:
        if kind == "incagg":
            inc.IncrementalAggMV._merge = (
                old_incagg_merge if arm == "old" else new_incagg
            )
        else:
            inc.VersionedAggMV._merge = (
                old_vagg_merge if arm == "old" else new_vagg
            )

    for name, (kind, fn) in gates.items():
        times: dict[str, list[float]] = {"old": [], "new": []}
        rows: dict[str, list] = {}
        for rep in range(reps):
            for arm in ("old", "new"):
                set_arm(kind, arm)
                spark.sparkContext.setJobDescription(f"ab_mv {name} {arm} {rep}")
                t0 = time.time()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                times[arm].append(time.time() - t0)
                if rep == 0:
                    rows[arm] = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        set_arm(kind, "new")
        assert rows["old"] == rows["new"], f"{name}: arms disagree"
        print(
            f"{name}: old median {statistics.median(times['old']):.3f}s "
            f"({', '.join(f'{t:.2f}' for t in times['old'])}) | "
            f"new median {statistics.median(times['new']):.3f}s "
            f"({', '.join(f'{t:.2f}' for t in times['new'])})",
            flush=True,
        )


if __name__ == "__main__":
    main()
