"""Custom Python Data Source (Spark 4): the non-file connector leaf.

Pins the three connector properties the module documents: declared
partitioned reads, source-level filter pushdown (accepted predicates
vanish from the post-scan Filter; unsupported ones are handed back),
and exact determinism against the frozen row function.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linqonsteroids_spark.sources.pydatasource import register, synth_row


def _df(spark, n=10000, parts=8):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    return (
        spark.read.format("linq_synth")
        .option("n", n)
        .option("parts", parts)
        .load()
    )


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_values_match_frozen_row_function(spark):
    got = sorted(tuple(r) for r in _df(spark, n=500, parts=3).collect())
    assert got == [synth_row(i) for i in range(500)]


def test_declared_partitions_reach_the_scan(spark):
    assert _df(spark, n=10000, parts=8).rdd.getNumPartitions() == 8


def test_range_predicate_absorbed_by_pushdown(spark):
    df = _df(spark).filter((F.col("i") >= 2000) & (F.col("i") < 2500))
    plan = _physical(df)
    # the range predicate is gone from the post-scan Filter: only the
    # planner's isnotnull remains
    post = plan.split("BatchScan")[0]
    assert "2000" not in post and "2500" not in post, plan[:1500]
    got = sorted(tuple(r) for r in df.collect())
    assert got == [synth_row(i) for i in range(2000, 2500)]


def test_unsupported_predicate_handed_back(spark):
    # bucket is not pushable: the source yields the filter back and
    # Spark evaluates it post-scan — values stay correct either way
    df = _df(spark, n=2000, parts=4).filter(F.col("bucket") == 3)
    plan = _physical(df)
    post = plan.split("BatchScan")[0]
    assert "bucket" in post, plan[:1500]
    got = sorted(tuple(r) for r in df.collect())
    assert got == [synth_row(i) for i in range(2000) if i % 16 == 3]


def test_equality_pushdown_narrows_to_one_row(spark):
    df = _df(spark).filter(F.col("i") == 4242)
    assert [tuple(r) for r in df.collect()] == [synth_row(4242)]


def test_stream_reader_drains_in_declared_micro_batches(spark, tmp_path):
    # partition-planned DataSourceStreamReader: offsets advance by
    # `batch` ids per trigger, so n=2000/batch=500 must take 4 genuine
    # micro-batches, and the landed rows equal the frozen row function
    import os

    register(spark)
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    stream = (
        spark.readStream.format("linq_synth")
        .option("n", 2000)
        .option("batch", 500)
        .option("parts", 4)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    last_batch = q.lastProgress["batchId"]
    q.stop()
    assert last_batch >= 3  # 4 batches: ids 0..3 (+ possibly one empty)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == [synth_row(i) for i in range(2000)]


def test_writer_roundtrip_manifest_ignores_orphans(spark, tmp_path):
    # exactly-once: readers resolve the MANIFEST, not the directory
    # listing — a file from a dead task attempt is invisible
    import json
    import os

    from linqonsteroids_spark.sources.pydatasource import (
        MANIFEST,
        SYNTH_SCHEMA,
        read_jsonl_manifest,
    )

    register(spark)
    sink = str(tmp_path / "sink")
    df = _df(spark, n=3000, parts=5)
    df.write.format("linq_synth").option("path", sink).mode("append").save()
    assert MANIFEST in os.listdir(sink)
    orphan = os.path.join(sink, "part-99999-0.jsonl")
    with open(orphan, "w") as f:
        f.write(
            json.dumps({"i": 999999, "bucket": 0, "amount": 0, "tag": "x"})
            + "\n"
        )
    got = sorted(
        tuple(r) for r in read_jsonl_manifest(spark, sink, SYNTH_SCHEMA).collect()
    )
    assert got == [synth_row(i) for i in range(3000)]


def test_stream_sink_commits_one_manifest_per_batch(spark, tmp_path):
    # DataSourceStreamWriter end-to-end: the custom stream source drains
    # into the custom stream sink; every non-empty micro-batch publishes
    # its own _manifest-<batchId>.json, and the manifest-resolved
    # read-back equals the frozen row function exactly — with a planted
    # orphan file staying invisible
    import glob
    import json
    import os

    from linqonsteroids_spark.sources.pydatasource import (
        SYNTH_SCHEMA,
        read_jsonl_stream_manifests,
    )

    register(spark)
    sink, chk = str(tmp_path / "sink"), str(tmp_path / "chk")
    stream = (
        spark.readStream.format("linq_synth")
        .option("n", 2000)
        .option("batch", 500)
        .option("parts", 4)
        .load()
    )
    q = (
        stream.writeStream.format("linq_synth")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    manifests = sorted(glob.glob(os.path.join(sink, "_manifest-*.json")))
    assert len(manifests) >= 4  # 2000/500: batches 0..3 (+ maybe empty)
    orphan = os.path.join(sink, "part-99999-0.jsonl")
    with open(orphan, "w") as f:
        f.write(
            json.dumps({"i": 999999, "bucket": 0, "amount": 0, "tag": "x"})
            + "\n"
        )
    got = sorted(
        tuple(r)
        for r in read_jsonl_stream_manifests(spark, sink, SYNTH_SCHEMA).collect()
    )
    assert got == [synth_row(i) for i in range(2000)]


def test_stream_sink_batch_replay_is_idempotent(spark, tmp_path):
    # the exactly-once core: a batch re-committed after a failure (same
    # batchId, new attempt's files) REPLACES its own manifest — readers
    # see the new attempt's rows once, never both attempts'
    import json
    import os

    from linqonsteroids_spark.sources.pydatasource import (
        SYNTH_SCHEMA,
        LedgerJsonlStreamWriter,
        _FileCommit,
        read_jsonl_stream_manifests,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)

    def _plant(name, rows):
        p = os.path.join(sink, name)
        with open(p, "w") as f:
            for i in rows:
                f.write(json.dumps(dict(zip(
                    ("i", "bucket", "amount", "tag"), synth_row(i)
                ))) + "\n")
        return _FileCommit(path=p, n_rows=len(rows))

    w = LedgerJsonlStreamWriter({"path": sink})
    # first attempt of batch 0 commits, then the batch replays (e.g.
    # checkpoint recovered before the offset commit landed)
    w.commit([_plant("part-00000-1.jsonl", range(0, 5))], 0)
    w.commit([_plant("part-00000-7.jsonl", range(0, 5))], 0)
    w.commit([_plant("part-00000-9.jsonl", range(5, 8)), None], 1)
    got = sorted(
        tuple(r)
        for r in read_jsonl_stream_manifests(spark, sink, SYNTH_SCHEMA).collect()
    )
    assert got == [synth_row(i) for i in range(8)]


def test_stream_sink_abort_removes_attempt_files(tmp_path):
    import os

    from linqonsteroids_spark.sources.pydatasource import (
        LedgerJsonlStreamWriter,
        _FileCommit,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    p = os.path.join(sink, "part-00000-3.jsonl")
    with open(p, "w") as f:
        f.write("{}\n")
    w = LedgerJsonlStreamWriter({"path": sink})
    w.abort([_FileCommit(path=p, n_rows=1), None], 5)
    assert os.listdir(sink) == []


def test_writer_abort_removes_written_files(tmp_path):
    # driver-side abort contract: every file named in a commit message
    # is deleted; no manifest is ever published
    import os

    from linqonsteroids_spark.sources.pydatasource import (
        MANIFEST,
        LedgerJsonlWriter,
        _FileCommit,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    paths = []
    for k in range(3):
        p = os.path.join(sink, f"part-{k:05d}-{k}.jsonl")
        with open(p, "w") as f:
            f.write("{}\n")
        paths.append(p)
    w = LedgerJsonlWriter({"path": sink})
    w.abort([_FileCommit(path=p, n_rows=1) for p in paths] + [None])
    assert os.listdir(sink) == []
    assert not os.path.exists(os.path.join(sink, MANIFEST))


def test_writer_empty_input_publishes_empty_manifest(spark, tmp_path):
    # r9 ADVICE: a zero-row write produces zero tasks/files, so commit()
    # runs before anything created the sink dir — it must makedirs and
    # publish an EMPTY manifest, not die with FileNotFoundError
    import os

    from linqonsteroids_spark.sources.pydatasource import (
        MANIFEST,
        SYNTH_SCHEMA,
        read_jsonl_manifest,
    )

    register(spark)
    sink = str(tmp_path / "never_created" / "sink")
    assert not os.path.exists(sink)
    empty = _df(spark, n=3000, parts=5).filter(F.col("i") < 0)
    empty.write.format("linq_synth").option("path", sink).mode(
        "append"
    ).save()
    assert MANIFEST in os.listdir(sink)
    back = read_jsonl_manifest(spark, sink, SYNTH_SCHEMA)
    assert back.count() == 0
    assert back.schema == _df(spark).schema
