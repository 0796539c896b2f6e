"""Structured Streaming tests: incremental results must equal batch results.

The reference's own correctness idea for IVM (delta query ≡ recompute,
``PrototypeTest.scala:13-33``) — here: a streaming query over a growing
parquet directory, checked against the batch computation on the same data
after each increment.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from linqonsteroids_spark.streaming import StreamingIndex, streaming_index_by, windowed_aggregate

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("kind", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", LongType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "mv": str(tmp_path / "mv"),
        "ckpt": str(tmp_path / "ckpt"),
    }


import datetime as _dt


def _ts(minute):
    return _dt.datetime(2024, 1, 1, 10, minute, 0)


BATCH1 = [(1, "click", _ts(0), 5), (1, "view", _ts(1), 3), (2, "click", _ts(2), 7)]
BATCH2 = [(1, "click", _ts(3), 2), (3, "view", _ts(40), 9)]


def test_streaming_index_matches_batch_recompute(spark, dirs):
    _write_batch(spark, dirs["src"], BATCH1)
    idx = StreamingIndex(
        spark,
        dirs["src"],
        SCHEMA,
        transform=lambda s: streaming_index_by(
            s, "user_id", {"n": F.count("*"), "total": F.sum("value")}
        ),
        mv_path=dirs["mv"],
        checkpoint_dir=dirs["ckpt"],
    )
    idx.refresh_available()
    got = {(r.user_id, r.n, r.total) for r in idx.read().collect()}
    assert got == {(1, 2, 8), (2, 1, 7)}

    # increment: only the new file is processed (checkpoint), MV must equal
    # a full batch recompute — the Δ(indexBy) ≡ recompute contract
    _write_batch(spark, dirs["src"], BATCH2)
    idx.refresh_available()
    got = {(r.user_id, r.n, r.total) for r in idx.read().collect()}
    want = {
        (r.user_id, r.n, r.total)
        for r in spark.read.parquet(dirs["src"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want == {(1, 3, 10), (2, 1, 7), (3, 1, 9)}


def test_windowed_aggregate_tumbling(spark, dirs):
    _write_batch(spark, dirs["src"], BATCH1 + BATCH2)
    stream = spark.readStream.schema(SCHEMA).parquet(dirs["src"])
    agg = windowed_aggregate(
        stream,
        "ts",
        "5 minutes",
        {"n": F.count("*"), "total": F.sum("value")},
        watermark="1 minute",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("complete")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.window_start.minute, r.n, r.total)
        for r in spark.sql("SELECT * FROM win_sink").collect()
    }
    # 10:00-10:05 → 4 events (17); 10:40-10:45 → 1 event (9)
    assert rows == {(0, 4, 17), (40, 1, 9)}


def test_stateful_running_totals_across_microbatches(spark, dirs):
    # two files + maxFilesPerTrigger=1 → two micro-batches; state must
    # carry (count, sum, max) across them (FoldOperators.scala:58-72
    # semantics, live via applyInPandasWithState)
    from linqonsteroids_spark.streaming import stateful_running_totals

    _write_batch(spark, dirs["src"], BATCH1)
    _write_batch(spark, dirs["src"], BATCH2)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["src"])
    )
    out = stateful_running_totals(stream, key="user_id", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per key per batch; the LAST row per key is
    # the cumulative state — must equal the batch recompute over all data
    rows = spark.sql(
        """SELECT user_id, n_events, total, max_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
                                          ORDER BY n_events DESC) AS rn
             FROM state_sink) WHERE rn = 1"""
    ).collect()
    got = {(r.user_id, r.n_events, r.total, r.max_value) for r in rows}
    assert got == {(1, 3, 10.0, 5.0), (2, 1, 7.0, 7.0), (3, 1, 9.0, 9.0)}


def test_stateful_typed_totals_across_microbatches(spark, dirs):
    # transformWithStateInPandas successor of the test above: ValueState
    # totals + MapState per-kind counts must both carry across batches.
    # The runner speaks protobuf to the JVM — skip where the runtime is
    # absent (declared environment boundary, same pattern as PIL/PyAV);
    # the processor's update logic mirrors stateful_running_totals,
    # which runs everywhere.
    from linqonsteroids_spark.streaming import (
        ROCKSDB_PROVIDER,
        has_tws_runtime,
        stateful_typed_totals,
    )

    if not has_tws_runtime():
        pytest.skip("google.protobuf absent: TWS runner cannot start here")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        _write_batch(spark, dirs["src"], BATCH1)
        _write_batch(spark, dirs["src"], BATCH2)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(dirs["src"])
        )
        out = stateful_typed_totals(
            stream, key="user_id", value_col="value", type_col="kind"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("tws_sink")
            .outputMode("update")
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql(
            """SELECT user_id, n_events, total, max_value, n_types FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                                              ORDER BY n_events DESC) AS rn
                 FROM tws_sink) WHERE rn = 1"""
        ).collect()
        got = {
            (r.user_id, r.n_events, r.total, r.max_value, r.n_types)
            for r in rows
        }
        assert got == {
            (1, 3, 10.0, 5.0, 2),
            (2, 1, 7.0, 7.0, 1),
            (3, 1, 9.0, 9.0, 1),
        }
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_stream_join_across_microbatches(spark, dirs):
    # delta-join maintenance (Prototype.scala:56-61): a purchase arriving in
    # micro-batch 2 must join clicks buffered from micro-batch 1 (A⋈ΔB) as
    # well as clicks in its own batch (ΔA⋈ΔB).
    from linqonsteroids_spark.streaming import stream_stream_interval_join

    file1 = [
        (1, "click", _ts(0), 5),
        (1, "purchase", _ts(1), 0),
        (2, "click", _ts(2), 7),
    ]
    file2 = [
        (1, "purchase", _ts(30), 0),
        (2, "click", _ts(29), 8),
        (2, "purchase", _ts(31), 0),
    ]
    _write_batch(spark, dirs["src"], file1)
    _write_batch(spark, dirs["src"], file2)

    def _src():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(dirs["src"])
        )

    purchases = _src().filter(F.col("kind") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    clicks = _src().filter(F.col("kind") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("value")
    )
    joined = stream_stream_interval_join(
        purchases,
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("c_ts") < F.col("p_ts")),
        left_time="p_ts",
        right_time="c_ts",
        watermark="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_sink")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.p_user, r.p_ts.minute, r.c_ts.minute)
        for r in spark.sql("SELECT * FROM ssjoin_sink").collect()
    }
    # batch recompute over all data — includes the cross-batch pairs
    # (purchase@30 × click@0, purchase@31 × click@2)
    assert got == {(1, 1, 0), (1, 30, 0), (2, 31, 2), (2, 31, 29)}


def test_incremental_agg_mv_merges_across_batches(spark, dirs):
    # externalized-state IVM: each batch's partial aggregate merges into
    # the parquet MV; after every refresh the MV equals a full batch
    # recompute — without one (Δ merge is O(MV + batch), not O(history))
    from linqonsteroids_spark.streaming import IncrementalAggMV

    mv = IncrementalAggMV(
        spark,
        dirs["src"],
        SCHEMA,
        key="user_id",
        aggs={
            "n": ("sum", F.count("*")),
            "total": ("sum", F.sum("value")),
            "max_v": ("max", F.max("value")),
        },
        mv_path=dirs["mv"],
        checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(spark, dirs["src"], BATCH1)
    mv.refresh_available()
    got = {(r.user_id, r.n, r.total, r.max_v) for r in mv.read().collect()}
    assert got == {(1, 2, 8, 5), (2, 1, 7, 7)}

    _write_batch(spark, dirs["src"], BATCH2)
    mv.refresh_available()  # processes ONLY the new file (checkpoint)
    got = {(r.user_id, r.n, r.total, r.max_v) for r in mv.read().collect()}
    assert got == {(1, 3, 10, 5), (2, 1, 7, 7), (3, 1, 9, 9)}


def test_incremental_agg_mv_rewrites_only_touched_buckets(spark, dirs):
    # refresh I/O is O(batch), not O(MV): a batch touching one key
    # rewrites only that key's hash bucket; every other bucket directory
    # keeps its exact files (names, sizes, mtimes)
    from linqonsteroids_spark.streaming import IncrementalAggMV

    n_buckets = 8
    mv = IncrementalAggMV(
        spark,
        dirs["src"],
        SCHEMA,
        key="user_id",
        aggs={"n": ("sum", F.count("*")), "total": ("sum", F.sum("value"))},
        mv_path=dirs["mv"],
        checkpoint_dir=dirs["ckpt"],
        n_buckets=n_buckets,
    )
    # seed with many keys so several buckets exist
    _write_batch(spark, dirs["src"], [(k, "click", _ts(0), k) for k in range(1, 30)])
    mv.refresh_available()

    def snapshot():
        out = {}
        for b in os.listdir(dirs["mv"]):
            if not b.startswith("mv_bucket="):
                continue
            d = os.path.join(dirs["mv"], b)
            out[b] = sorted(
                (f, os.path.getsize(p), os.path.getmtime(p))
                for f in os.listdir(d)
                if not f.startswith(("_", "."))
                for p in [os.path.join(d, f)]
            )
        return out

    before = snapshot()
    assert len(before) > 2  # keys actually spread over buckets

    # second batch touches a single key → a single bucket
    touched_bucket = spark.sql(
        f"SELECT pmod(xxhash64(CAST(1 AS BIGINT)), {n_buckets}) AS b"
    ).collect()[0].b
    _write_batch(spark, dirs["src"], [(1, "click", _ts(5), 10)])
    mv.refresh_available()
    after = snapshot()

    for b, files in before.items():
        if b == f"mv_bucket={touched_bucket}":
            assert after[b] != files  # merged slice rewritten
        else:
            assert after[b] == files  # byte-identical, untouched on disk
    got = {(r.user_id, r.n, r.total) for r in mv.read().collect()}
    expect = {(k, 1, k) for k in range(2, 30)} | {(1, 2, 11)}
    assert got == expect


def test_incremental_agg_mv_rejects_layout_mismatch(spark, dirs):
    # n_buckets IS the physical layout: a merge configured with a
    # different modulus would compute `touched` with the new hash while a
    # key's old rows sit in never-read buckets — silent duplicates on
    # read. The persisted _mv_meta.json must make that a hard error.
    from linqonsteroids_spark.streaming import IncrementalAggMV

    def make(n_buckets, ckpt):
        return IncrementalAggMV(
            spark,
            dirs["src"],
            SCHEMA,
            key="user_id",
            aggs={"n": ("sum", F.count("*"))},
            mv_path=dirs["mv"],
            checkpoint_dir=os.path.join(dirs["ckpt"], ckpt),
            n_buckets=n_buckets,
        )

    _write_batch(spark, dirs["src"], BATCH1)
    make(8, "a").refresh_available()
    _write_batch(spark, dirs["src"], BATCH2)
    with pytest.raises(Exception) as exc_info:
        # fresh checkpoint so the second run re-reads source files and
        # actually reaches the merge
        make(16, "b").refresh_available()
    assert "n_buckets=8" in str(exc_info.value)
    # the original layout still merges fine — reusing checkpoint "a" so
    # only the unprocessed BATCH2 merges (the failed run "b" committed
    # neither checkpoint progress nor MV writes)
    make(8, "a").refresh_available()
    got = {(r.user_id, r.n) for r in mv_read_counts(spark, dirs["mv"])}
    assert got == {(1, 3), (2, 1), (3, 1)}


def mv_read_counts(spark, mv_path):
    return (
        spark.read.parquet(mv_path).drop("mv_bucket").select("user_id", "n").collect()
    )


def test_cdc_upsert_mv_cross_batch_supersession(spark, dirs):
    """Streaming MERGE semantics across micro-batches: newer changes
    supersede the MV, OUT-OF-ORDER older changes never do, tombstones
    delete — and a late older upsert cannot resurrect a tombstoned key."""
    from linqonsteroids_spark.streaming import CdcUpsertMV

    mv = CdcUpsertMV(
        spark,
        dirs["src"],
        SCHEMA,
        key="user_id",
        order=("ts", "value"),
        payload=("value",),
        op_col="kind",
        tombstone="del",
        mv_path=dirs["mv"],
        checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(
        spark,
        dirs["src"],
        [
            (1, "set", _ts(10), 100),
            (2, "set", _ts(10), 200),
            (3, "set", _ts(10), 300),
            (4, "del", _ts(10), 0),
        ],
    )
    mv.refresh_available()
    got = {(r.user_id, r.kind, r.value) for r in mv.read().collect()}
    assert got == {(1, "set", 100), (2, "set", 200), (3, "set", 300)}

    _write_batch(
        spark,
        dirs["src"],
        [
            (1, "set", _ts(20), 111),   # newer: supersedes
            (2, "set", _ts(5), 999),    # OLDER out-of-order: must NOT supersede
            (3, "del", _ts(20), 0),     # tombstone: deletes key 3
            (4, "set", _ts(5), 444),    # older than key 4's tombstone: stays dead
        ],
    )
    mv.refresh_available()
    rows = {r.user_id: r for r in mv.read().collect()}
    assert set(rows) == {1, 2}
    assert rows[1].value == 111 and rows[1].n_changes == 2
    assert rows[2].value == 200 and rows[2].n_changes == 2


def test_cdc_upsert_mv_batch_carving_invariance(spark, dirs):
    """max_by latest-wins is a semilattice: one batch with all changes and
    two batches carving the same changes yield byte-identical snapshots."""
    from linqonsteroids_spark.streaming import CdcUpsertMV

    changes = [
        (1, "set", _ts(1), 10),
        (1, "set", _ts(3), 30),
        (1, "del", _ts(2), 0),
        (2, "del", _ts(4), 0),
        (2, "set", _ts(2), 20),
    ]

    def run(tag, batches):
        base = dirs["src"] + tag
        mv = CdcUpsertMV(
            spark, base, SCHEMA, key="user_id", order=("ts", "value"),
            payload=("value",), op_col="kind", tombstone="del",
            mv_path=dirs["mv"] + tag, checkpoint_dir=dirs["ckpt"] + tag,
        )
        for b in batches:
            _write_batch(spark, base, b)
            mv.refresh_available()
        return sorted(
            (r.user_id, r.kind, r.value, r.n_changes) for r in mv.read().collect()
        )

    assert run("_one", [changes]) == run("_two", [changes[:2], changes[2:]])
    assert run("_one2", [changes]) == [(1, "set", 30, 3)]


def test_incremental_mv_compaction(spark, dirs):
    """compact() folds a multi-file bucket to ONE file without changing
    the data, and leaves below-threshold buckets byte-identical."""
    import glob
    import os

    from linqonsteroids_spark.streaming import IncrementalAggMV

    # pick users by their actual bucket: several keys in bucket 0 (their
    # partial-agg rows land in different groupBy tasks -> several files in
    # one merge), exactly one key in bucket 1 (one task -> one file)
    probe = spark.createDataFrame(
        [(u,) for u in range(1, 40)], "user_id long"
    ).selectExpr("user_id", "pmod(xxhash64(user_id), 2) AS b").collect()
    b0 = [r.user_id for r in probe if r.b == 0][:6]
    b1 = [r.user_id for r in probe if r.b == 1][:1]

    mv = IncrementalAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*")), "total": ("sum", F.sum("value"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"], n_buckets=2,
    )
    _write_batch(
        spark, dirs["src"], [(u, "a", _ts(1), 10) for u in b0 + b1]
    )
    mv.refresh_available()

    # AQE coalesces this tiny merge to one task, so fabricate the
    # multi-generation state a long-lived MV accumulates: split bucket 0's
    # file into two valid halves (same rows, two files)
    import shutil

    b0_dir = os.path.join(dirs["mv"], "mv_bucket=0")
    split_dir = os.path.join(dirs["mv"], "_split_tmp")
    (
        spark.read.parquet(dirs["mv"])
        .filter("mv_bucket = 0")
        .drop("mv_bucket")
        .repartition(2)
        .write.parquet(split_dir)
    )
    for f in glob.glob(os.path.join(b0_dir, "*.parquet")):
        os.remove(f)
    for i, f in enumerate(sorted(glob.glob(os.path.join(split_dir, "*.parquet")))):
        shutil.copy(f, os.path.join(b0_dir, f"gen{i}-{os.path.basename(f)}"))
    shutil.rmtree(split_dir)

    def census():
        out = {}
        for f in glob.glob(os.path.join(dirs["mv"], "mv_bucket=*", "*.parquet")):
            b = os.path.basename(os.path.dirname(f))
            out.setdefault(b, []).append((os.path.basename(f), os.path.getsize(f)))
        return {b: sorted(v) for b, v in out.items()}

    before_rows = sorted(map(tuple, mv.read().collect()))
    before_files = census()
    assert len(before_files["mv_bucket=0"]) >= 2  # the small-file problem
    assert len(before_files["mv_bucket=1"]) == 1

    assert mv.compact(min_files=2) == [0]
    after_files = census()
    assert len(after_files["mv_bucket=0"]) == 1          # folded to one file
    assert after_files["mv_bucket=1"] == before_files["mv_bucket=1"]  # untouched
    assert sorted(map(tuple, mv.read().collect())) == before_rows
    assert mv.compact(min_files=2) == []  # idempotent: nothing left to do


def test_versioned_mv_time_travel_and_immutability(spark, dirs):
    """Copy-on-write versioning: committing v2 must not touch any file v1
    references (snapshot isolation by construction), and read(version=1)
    must return exactly the pre-merge state afterward."""
    import os

    from linqonsteroids_spark.streaming import VersionedAggMV

    mv = VersionedAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*")), "total": ("sum", F.sum("value"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(spark, dirs["src"], BATCH1)
    mv.refresh_available()
    assert mv.versions() == [1]
    v1_rows = sorted(map(tuple, mv.read().collect()))
    v1_files = {
        f: os.path.getmtime(f)
        for fl in mv._read_manifest(1).values()
        for f in fl
    }

    _write_batch(spark, dirs["src"], BATCH2)
    mv.refresh_available()
    assert mv.versions() == [1, 2]
    # v1 files untouched on disk, v1 read identical post-commit
    for f, mt in v1_files.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mt
    assert sorted(map(tuple, mv.read(version=1).collect())) == v1_rows
    # latest equals the base-class contract (full recompute of all batches)
    got = {(r.user_id, r.n, r.total) for r in mv.read().collect()}
    assert got == {(1, 3, 10), (2, 1, 7), (3, 1, 9)}


def test_versioned_mv_change_feed_types(spark, dirs):
    """The derived change feed classifies inserts vs updates and skips
    buckets whose manifest file lists did not change."""
    from linqonsteroids_spark.streaming import VersionedAggMV

    mv = VersionedAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*")), "total": ("sum", F.sum("value"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(spark, dirs["src"], BATCH1)   # users 1, 2
    mv.refresh_available()
    _write_batch(spark, dirs["src"], BATCH2)   # user 1 again + new user 3
    mv.refresh_available()
    feed = {r.user_id: r for r in mv.changes_between(1, 2).collect()}
    assert feed[1].change_type == "update" and feed[1].n_old == 2 and feed[1].n_new == 3
    assert feed[3].change_type == "insert" and feed[3].n_new == 1
    # user 2's bucket may or may not share a bucket with changed keys; if
    # present it must be classified as unchanged-filtered (absent) since
    # its values are identical
    assert 2 not in feed or feed[2].change_type == "update"


def test_versioned_mv_concurrent_commit_rejected(spark, dirs):
    """Publishing an already-committed version must fail loudly (link
    put-if-absent), leaving the committed snapshot untouched."""
    import pytest as _pytest

    from linqonsteroids_spark.streaming import VersionedAggMV

    mv = VersionedAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(spark, dirs["src"], BATCH1)
    mv.refresh_available()
    committed = mv._read_manifest(1)
    with _pytest.raises(RuntimeError, match="concurrent commit"):
        mv._commit_manifest(1, {"0": ["/tmp/fake.parquet"]})
    assert mv._read_manifest(1) == committed  # loser cannot clobber


def test_versioned_mv_commit_through_plug_point(spark, dirs):
    """The commit protocol's ONLY storage dependency is the pluggable
    ``put_if_absent`` conditional put (the object-store port seam): a
    fake primitive that simulates another committer winning the race at
    the storage layer must make THIS writer's commit fail loudly, with
    the racer's manifest — not ours — the surviving version."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from linqonsteroids_spark.streaming import VersionedAggMV
    from linqonsteroids_spark.streaming.incremental import local_put_if_absent

    mv = VersionedAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    racer_manifest = {"0": ["/elsewhere/racer.parquet"]}
    calls = []

    def racing_put(path: str, payload: str) -> bool:
        # another committer sneaks in just before our conditional put —
        # the storage primitive must then report our put as lost
        calls.append(path)
        local_put_if_absent(path, _json.dumps(racer_manifest))
        return local_put_if_absent(path, payload)

    mv.put_if_absent = racing_put  # instance-level override: the seam
    _write_batch(spark, dirs["src"], BATCH1)
    with _pytest.raises(Exception, match="concurrent commit"):
        mv.refresh_available()
    # exactly one conditional-put attempt; the racer's snapshot survives
    assert len(calls) == 1
    with open(_os.path.join(mv._manifest_dir(), "v1.json")) as f:
        assert _json.load(f) == racer_manifest


def test_versioned_mv_expire_versions(spark, dirs):
    """Retention: after expiring to the last version, v1-only files are
    deleted, shared files survive, v1 is unreadable, latest is identical."""
    import os

    from linqonsteroids_spark.streaming import VersionedAggMV

    mv = VersionedAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*")), "total": ("sum", F.sum("value"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(spark, dirs["src"], BATCH1)
    mv.refresh_available()
    _write_batch(spark, dirs["src"], BATCH2)
    mv.refresh_available()
    latest_rows = sorted(map(tuple, mv.read().collect()))
    m1 = {f for fl in mv._read_manifest(1).values() for f in fl}
    m2 = {f for fl in mv._read_manifest(2).values() for f in fl}
    only_v1 = m1 - m2
    shared = m1 & m2
    assert only_v1, "v2 must have replaced at least one bucket"

    stats = mv.expire_versions(keep_last=1)
    assert stats["versions_removed"] == 1
    assert stats["files_removed"] == len(only_v1)
    assert all(not os.path.exists(f) for f in only_v1)
    assert all(os.path.exists(f) for f in shared)  # refcounted, not aged
    assert mv.versions() == [2]
    assert sorted(map(tuple, mv.read().collect())) == latest_rows


def test_versioned_cdc_snapshot_as_of(spark, dirs):
    """CDC time travel: read(version=1) is the snapshot as of the first
    refresh — including a key tombstoned LATER (v1 still shows it alive,
    v2 does not), and out-of-order older upserts never resurrect."""
    from linqonsteroids_spark.streaming import VersionedCdcMV

    mv = VersionedCdcMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        order=("ts", "value"), payload=("value",), op_col="kind",
        tombstone="del", mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(
        spark, dirs["src"],
        [(1, "set", _ts(10), 100), (2, "set", _ts(10), 200)],
    )
    mv.refresh_available()
    _write_batch(
        spark, dirs["src"],
        [(1, "del", _ts(20), 0), (2, "set", _ts(5), 999), (3, "set", _ts(20), 300)],
    )
    mv.refresh_available()

    as_of_1 = {(r.user_id, r.value) for r in mv.read(version=1).collect()}
    assert as_of_1 == {(1, 100), (2, 200)}
    latest = {(r.user_id, r.value) for r in mv.read().collect()}
    assert latest == {(2, 200), (3, 300)}  # 1 deleted; 2's stale upsert lost
    feed = {r.user_id: r for r in mv.changes_between(1, 2).collect()}
    # CDC classification: the transition TO the tombstone is a delete (the
    # _new columns carry the tombstone record), not an update
    assert feed[1].change_type == "delete" and feed[1].kind_new == "del"
    assert feed[3].change_type == "insert"


def test_versioned_mv_compaction_commits_snapshot(spark, dirs):
    """Versioned OPTIMIZE: compaction rewrites fragmented buckets into a
    NEW version — data identical, pre-compaction time travel intact, and
    the fragments reclaimable by expire_versions."""
    import glob
    import os
    import shutil

    from linqonsteroids_spark.streaming import VersionedAggMV

    mv = VersionedAggMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        aggs={"n": ("sum", F.count("*")), "total": ("sum", F.sum("value"))},
        mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(
        spark, dirs["src"], [(u, "a", _ts(1), 10 * u) for u in range(1, 13)]
    )
    mv.refresh_available()
    # fabricate fragmentation: split a multi-row bucket's file into two
    # halves and commit that layout as v2 (the manifest is the source of
    # truth)
    m1 = mv._read_manifest(1)
    snap = spark.read.option(
        "basePath", os.path.join(dirs["mv"], "data", "g1")
    ).parquet(*[f for fl in m1.values() for f in fl])
    counts = {
        str(r.mv_bucket): r.n_rows
        for r in snap.groupBy("mv_bucket").agg(F.count("*").alias("n_rows")).collect()
    }
    frag_bucket = max(counts, key=lambda b: counts[b])
    assert counts[frag_bucket] >= 2
    split_dir = os.path.join(dirs["mv"], "data", "gsplit")
    (
        spark.read.option(
            "basePath", os.path.dirname(os.path.dirname(m1[frag_bucket][0]))
        )
        .parquet(*m1[frag_bucket])
        .where(f"mv_bucket = {frag_bucket}")
        .repartition(2)
        .write.partitionBy("mv_bucket")
        .parquet(split_dir)
    )
    m2 = dict(m1)
    m2[frag_bucket] = sorted(
        glob.glob(os.path.join(split_dir, f"mv_bucket={frag_bucket}", "*.parquet"))
    )
    assert len(m2[frag_bucket]) == 2
    mv._commit_manifest(2, m2)

    rows_before = sorted(map(tuple, mv.read().collect()))
    assert mv.compact(min_files=2) == [int(frag_bucket)]
    assert mv.versions() == [1, 2, 3]
    assert len(mv._read_manifest(3)[frag_bucket]) == 1
    assert sorted(map(tuple, mv.read().collect())) == rows_before
    # pre-compaction snapshot still time-travels
    assert sorted(map(tuple, mv.read(version=2).collect())) == rows_before
    # retention reclaims the fragments
    stats = mv.expire_versions(keep_last=1)
    assert stats["versions_removed"] == 2
    assert all(not os.path.exists(f) for f in m2[frag_bucket])
    assert sorted(map(tuple, mv.read().collect())) == rows_before


def test_change_feed_delta_apply_equals_recompute(spark, dirs):
    """The IVM equation through the change feed: a downstream per-group
    (count, sum) aggregate maintained by delta-applying the v1→v2 feed
    equals the aggregate recomputed from the v2 snapshot — including a
    group MIGRATION (a key whose group changes) and a delete."""
    from linqonsteroids_spark.streaming import (
        VersionedCdcMV,
        apply_change_feed_to_group_sum,
    )

    mv = VersionedCdcMV(
        spark, dirs["src"], SCHEMA, key="user_id",
        order=("ts", "value"), payload=("value",), op_col="kind",
        tombstone="del", mv_path=dirs["mv"], checkpoint_dir=dirs["ckpt"],
    )
    _write_batch(
        spark, dirs["src"],
        [(1, "red", _ts(10), 100), (2, "red", _ts(10), 200), (3, "blue", _ts(10), 300)],
    )
    mv.refresh_available()
    _write_batch(
        spark, dirs["src"],
        [
            (1, "blue", _ts(20), 150),   # migration: red → blue, value change
            (2, "del", _ts(20), 0),      # delete
            (4, "red", _ts(20), 400),    # insert
        ],
    )
    mv.refresh_available()

    def recompute(version):
        return (
            mv.read(version=version)
            .groupBy(F.col("kind").alias("grp"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        )

    downstream_v1 = recompute(1)
    feed = mv.changes_between(1, 2)
    maintained = apply_change_feed_to_group_sum(
        downstream_v1, feed,
        group_old="kind_old", group_new="kind_new",
        value_old="value_old", value_new="value_new",
    )
    got = sorted(map(tuple, maintained.collect()))
    want = sorted(map(tuple, recompute(2).collect()))
    assert got == want
    want_dict = dict((g, (n, t)) for g, n, t in want)
    assert want_dict == {"blue": (2, 450.0), "red": (1, 400.0)}


def test_statestore_reader_matches_batch_truth(spark):
    # the raw checkpoint state must decode to exactly the batch GROUP BY
    # result — one row per key, counts and integer-cents sums identical
    from pyspark.sql import functions as F

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.queries.scale import statestore_reader_counts
    from tests.conftest import SF_SMOKE

    state = {
        r.event_type: (r.n_events, r.value_cents)
        for r in statestore_reader_counts(spark, SF_SMOKE).collect()
    }
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    truth = {
        r.event_type: (r.n, r.c)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("c"))
        .collect()
    }
    assert state == truth


def test_streaming_expectations_split_and_redelivery_idempotent(
    spark, tmp_path
):
    """streaming/expectations.py: (a) the row-wise split is exact — no
    silent drops, every violator tagged with ALL failed expectation
    names; (b) a NULL-valued expectation is a violation (the WAP
    three-valued-logic rule); (c) redelivering the same batch id
    rewrites its batch=<id> subdir byte-identically instead of
    duplicating rows — the foreachBatch at-least-once contract."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    from linqonsteroids_spark.streaming.expectations import (
        StreamingExpectations,
    )

    out, quar = str(tmp_path / "t"), str(tmp_path / "q")
    sink = StreamingExpectations(
        {"pos": F.col("x") > 0, "small": F.col("x") < 100},
        out,
        quar,
    )
    schema = StructType([StructField("x", IntegerType(), True)])
    batch = spark.createDataFrame(
        [(5,), (-3,), (500,), (None,), (-200,)], schema
    )
    sink(batch, 0)
    clean = [r["x"] for r in spark.read.parquet(out).collect()]
    bad = {
        (r["x"], r["_violated"], r["_batch_id"])
        for r in spark.read.parquet(quar).collect()
    }
    assert clean == [5]
    assert bad == {
        (-3, "pos", 0),
        (500, "small", 0),
        (None, "pos,small", 0),  # NULL fails BOTH: NULL>0 and NULL<100
        (-200, "pos", 0),  # fails pos only (it IS small)
    }
    # redelivery: same batch id again -> identical state, no duplicates
    sink(batch, 0)
    assert [r["x"] for r in spark.read.parquet(out).collect()] == [5]
    assert spark.read.parquet(quar).count() == 4
    # a second batch lands beside the first
    sink(spark.createDataFrame([(7,), (0,)], schema), 1)
    assert sorted(
        r["x"] for r in spark.read.parquet(out).collect()
    ) == [5, 7]
    assert spark.read.parquet(quar).count() == 5


def test_expectations_rate_threshold_circuit_breaker(spark, tmp_path):
    """fail_thresholds: a check whose per-batch violation RATE crosses
    its limit aborts the WHOLE batch before either sink is written (a
    broken upstream deploy must not silently fill the quarantine);
    under the limit the normal row-wise split proceeds; unknown
    threshold names refuse at construction."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StructField, StructType

    from linqonsteroids_spark.streaming.expectations import (
        ExpectationBreach,
        StreamingExpectations,
    )

    out, quar = str(tmp_path / "t"), str(tmp_path / "q")
    checks = {"pos": F.col("x") > 0, "small": F.col("x") < 100}
    schema = StructType([StructField("x", IntegerType(), True)])
    batch = spark.createDataFrame([(5,), (-3,), (500,), (7,)], schema)
    # 'pos' violation rate is 1/4; a 0.2 ceiling breaches, batch aborts
    strict = StreamingExpectations(
        checks, out, quar, fail_thresholds={"pos": 0.2}
    )
    with pytest.raises(ExpectationBreach) as e:
        strict(batch, 0)
    assert e.value.report == [("pos", 1, 0.25, 0.2)]
    assert not os.path.exists(out) and not os.path.exists(quar)
    # a 0.5 ceiling tolerates it: normal split, both sinks written
    lenient = StreamingExpectations(
        checks, out, quar, fail_thresholds={"pos": 0.5, "small": 0.5}
    )
    lenient(batch, 0)
    assert sorted(
        r["x"] for r in spark.read.parquet(out).collect()
    ) == [5, 7]
    assert spark.read.parquet(quar).count() == 2
    with pytest.raises(ValueError, match="unknown checks"):
        StreamingExpectations(
            checks, out, quar, fail_thresholds={"typo": 0.1}
        )


def test_quarantine_replay_releases_only_now_passing_rows(
    spark, tmp_path
):
    """replay_quarantine closes the loop: after relaxing a check,
    exactly the now-passing quarantined rows append to the table under
    a replay batch dir (original quarantine dirs stay immutable as the
    audit trail); re-running the same replay_id is idempotent, and a
    SECOND replay releases nothing it already released."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StructField, StructType

    from linqonsteroids_spark.streaming.expectations import (
        StreamingExpectations,
        replay_quarantine,
    )

    out, quar = str(tmp_path / "t"), str(tmp_path / "q")
    strict = {"pos": F.col("x") > 0, "small": F.col("x") < 100}
    sink = StreamingExpectations(strict, out, quar)
    schema = StructType([StructField("x", IntegerType(), True)])
    sink(spark.createDataFrame([(5,), (-3,), (500,), (70,)], schema), 0)
    assert spark.read.parquet(out).count() == 2  # 5, 70

    # ops relaxes the 'small' ceiling; 500 should now release, -3 not
    relaxed = {"pos": F.col("x") > 0, "small": F.col("x") < 1000}
    r1 = replay_quarantine(spark, quar, relaxed, out, replay_id="fix1")
    assert r1 == {"released": 1, "retained": 1}
    vals = sorted(r["x"] for r in spark.read.parquet(out).collect())
    assert vals == [5, 70, 500]
    # the replay file carries the TABLE schema, not the quarantine's
    # discovered `batch` partition column with the original batch id
    # baked in as a false physical value (r13 verdict finding 1): a
    # replay batch dir's file schema must equal a normal batch dir's
    import os

    def _leaf_schema(d):
        return spark.read.parquet(os.path.join(out, d)).schema

    assert _leaf_schema("batch=replay-fix1") == _leaf_schema("batch=0")
    # idempotent re-run of the same replay id
    r1b = replay_quarantine(spark, quar, relaxed, out, replay_id="fix1")
    assert sorted(
        r["x"] for r in spark.read.parquet(out).collect()
    ) == [5, 70, 500]
    assert r1b["released"] == 1  # same dir rewritten, not duplicated
    # a DIFFERENT later replay must not re-release 500; `retained`
    # counts rows still stuck AFTER accounting for prior replays'
    # releases (-3 is the only genuinely unreleased row here)
    r2 = replay_quarantine(spark, quar, relaxed, out, replay_id="fix2")
    assert r2 == {"released": 0, "retained": 1}
    assert sorted(
        r["x"] for r in spark.read.parquet(out).collect()
    ) == [5, 70, 500]
