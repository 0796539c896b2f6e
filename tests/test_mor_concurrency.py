"""r15 MOR multi-writer + timestamp-travel + crash-recovery pins.

The r14 verdict's capstone ask: appends allocate their version through
the commit seam (``publish_dir_if_absent`` + retry), maintenance ops
serialize under the table ``commit_lock``, and meta writes are FENCED on
leased backends so a zombie compactor loses. Every test here runs on
BOTH seam backends where the behavior differs.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.operators.mor import MorTable
from linqonsteroids_spark.sources.commitlog import (
    ConditionalPutBackend,
    use_backend,
)


def _mk(spark, path, rows=((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))):
    t = MorTable(spark, str(path), "k")
    t.write_base(spark.createDataFrame(list(rows), ["k", "s", "x"]))
    return t


def test_allocate_mode_assigns_increasing_versions(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor")
    v1 = t.append_delta(
        upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"])
    )
    v2 = t.append_delta(
        delete_keys=spark.createDataFrame([(2,)], ["k"])
    )
    assert (v1, v2) == (1, 2)
    assert {r["k"]: r["s"] for r in t.read().collect()} == {1: "a1", 3: "c"}
    # allocation skips burned numbers: compact then append
    t.compact()
    v3 = t.append_delta(
        upserts=spark.createDataFrame([(9, "n", 90.0)], ["k", "s", "x"])
    )
    assert v3 == 3  # horizon is 2; next allocation clears it


def test_explicit_version_collision_is_loud_and_atomic(spark, tmp_path):
    """Two writers claiming the SAME explicit version: exactly one wins,
    the loser raises, and the winner's committed bytes are untouched."""
    t = _mk(spark, tmp_path / "mor")
    t.append_delta(
        1, upserts=spark.createDataFrame([(1, "win", 1.0)], ["k", "s", "x"])
    )
    t2 = MorTable(spark, t.path, "k")  # a second writer handle
    # the advisory versions-must-increase precheck would catch this in
    # the sequential case; the ATOMIC CLAIM is the real decider when two
    # writers race past each other's prechecks — drive it directly
    out = spark.createDataFrame(
        [(1, "lose", 2.0, "U")], ["k", "s", "x", "_op"]
    )
    with pytest.raises(ValueError, match="already exists"):
        t2._publish_delta(out, 1)
    assert {r["s"] for r in t.read().where("k = 1").collect()} == {"win"}


@pytest.mark.parametrize("backend", ["posix", "condput"])
def test_concurrent_allocating_appenders_both_land(spark, tmp_path, backend):
    """Two threads, each with its OWN table handle, both append in
    allocate mode: both deltas land under DISTINCT versions and read()
    equals the serial application (disjoint keys make the final state
    order-independent)."""
    path = str(tmp_path / f"mor_{backend}")
    ctx = (
        use_backend(ConditionalPutBackend())
        if backend == "condput"
        else _null_ctx()
    )
    with ctx:
        t = _mk(spark, path)
        results: dict[str, int] = {}
        errors: list[BaseException] = []
        barrier = threading.Barrier(2)

        def writer(tag: str, key: int):
            try:
                h = MorTable(spark, path, "k")
                df = spark.createDataFrame(
                    [(key, tag, float(key))], ["k", "s", "x"]
                )
                barrier.wait(timeout=30)
                results[tag] = h.append_delta(upserts=df)
            except BaseException as e:  # surfaced below
                errors.append(e)

        th1 = threading.Thread(target=writer, args=("w1", 101))
        th2 = threading.Thread(target=writer, args=("w2", 102))
        th1.start(), th2.start()
        th1.join(60), th2.join(60)
        assert not errors, errors
        assert sorted(results.values()) == [1, 2]  # distinct, dense
        state = {r["k"]: r["s"] for r in t.read().collect()}
        assert state[101] == "w1" and state[102] == "w2"
        assert state[1] == "a"  # base untouched


class _null_ctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_lost_allocation_race_restages_at_next_number(spark, tmp_path):
    """Deterministic race: the backend's race_hook stages a competitor
    claim at the exact candidate name between the appender's check and
    publish — the appender must lose cleanly and land at the next
    number, never tear or overwrite."""
    path = str(tmp_path / "mor_race")
    be = ConditionalPutBackend()
    with use_backend(be):
        t = _mk(spark, path)
        fired = {"n": 0}

        def hook(op, final):
            if op == "publish_dir_if_absent" and final.endswith(
                "mor_v=1"
            ) and fired["n"] == 0:
                fired["n"] = 1
                be.race_hook = None  # the competitor claims v1 below
                t2 = MorTable(spark, path, "k")
                t2.append_delta(
                    1,
                    upserts=spark.createDataFrame(
                        [(50, "racer", 5.0)], ["k", "s", "x"]
                    ),
                )
                be.race_hook = hook

        be.race_hook = hook
        v = t.append_delta(
            upserts=spark.createDataFrame(
                [(60, "loser-retries", 6.0)], ["k", "s", "x"]
            )
        )
        assert fired["n"] == 1
        assert v == 2  # lost v1 to the racer, landed at 2
        state = {r["k"]: r["s"] for r in t.read().collect()}
        assert state[50] == "racer" and state[60] == "loser-retries"
        assert be.stats["conditional_losses"] >= 1


def test_fenced_meta_write_refuses_stale_token(spark, tmp_path):
    """A holder whose lease was taken over carries a permanently stale
    fencing token: its meta publish must FAIL LOUDLY, leaving the new
    holder's meta untouched — expiry alone is not safe, the fence is
    what makes takeover correct."""
    path = str(tmp_path / "mor_fence")
    be = ConditionalPutBackend(lease_ttl_s=30)
    with use_backend(be):
        t = _mk(spark, path)
        with t._locked() as fence_a:
            pass  # fence_a issued and released
        with t._locked() as fence_b:
            assert fence_b == fence_a + 1
            # zombie: writes with the SUPERSEDED token while B holds
            with pytest.raises(RuntimeError, match="fence lost"):
                t._write_meta_dict({"compacted_through": 99}, fence=fence_a)
            # current holder's token still works
            t._write_meta_dict(
                {**t._read_meta(), "marker": "b"}, fence=fence_b
            )
        assert t._read_meta().get("marker") == "b"
        assert t._compacted_through() != 99


def test_compact_under_lease_backend_passes_fence_to_meta(spark, tmp_path):
    """compact() on a leased backend routes its horizon write through
    fenced_put — pin by spying the backend call."""
    path = str(tmp_path / "mor_cfence")
    be = ConditionalPutBackend(lease_ttl_s=30)
    calls = []
    orig = be.fenced_put

    def spy(p, payload, lock, fence):
        calls.append((os.path.basename(p), fence))
        return orig(p, payload, lock, fence)

    be.fenced_put = spy
    with use_backend(be):
        t = _mk(spark, path)
        t.append_delta(
            1, upserts=spark.createDataFrame([(1, "z", 1.0)], ["k", "s", "x"])
        )
        calls.clear()
        t.compact()
    assert any(
        name == "_mor_meta.json" and fence is not None
        for name, fence in calls
    )
    assert t._compacted_through() == 1


def test_digest_manifest_appends_serialize_and_stay_consistent(
    spark, tmp_path
):
    """The r14 advice hazard: two concurrent appends on a digest table
    touching OVERLAPPING keys. r15 serializes digest appends under the
    commit lock by construction, so the manifest must audit clean
    afterwards — no permanently XOR-inconsistent state."""
    from linqonsteroids_spark.operators.tablediff import (
        audit_against_manifest,
    )

    path = str(tmp_path / "mor_digest")
    t = MorTable(spark, path, "k", digest_manifest=True, manifest_buckets=8)
    t.write_base(
        spark.createDataFrame(
            [(i, f"s{i}", float(i)) for i in range(20)], ["k", "s", "x"]
        )
    )
    barrier = threading.Barrier(2)
    errors: list[BaseException] = []

    def writer(tag: str):
        try:
            h = MorTable(spark, path, "k", digest_manifest=True,
                         manifest_buckets=8)
            df = spark.createDataFrame(
                [(5, f"{tag}-5", 55.0), (6, f"{tag}-6", 66.0)],
                ["k", "s", "x"],
            )
            barrier.wait(timeout=30)
            h.append_delta(upserts=df)
        except BaseException as e:
            errors.append(e)

    ths = [threading.Thread(target=writer, args=(w,)) for w in ("A", "B")]
    [th.start() for th in ths]
    [th.join(120) for th in ths]
    assert not errors, errors
    report = audit_against_manifest(t.read(), path)
    assert report["clean"] and report["row_delta"] == 0
    assert not report["changed_buckets"]


# --- timestamp time travel ----------------------------------------------------


def test_timestamp_travel_resolves_to_version_watermark(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor_ts")
    t.append_delta(
        upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"]),
        commit_timestamp="2026-01-01T00:00:00",
    )
    t.append_delta(
        delete_keys=spark.createDataFrame([(2,)], ["k"]),
        commit_timestamp="2026-02-01T00:00:00",
    )
    # probe between the commits → v1 state
    mid = {r["k"]: r["s"] for r in t.read(
        as_of_timestamp="2026-01-15T00:00:00").collect()}
    assert mid == {1: "a1", 2: "b", 3: "c"}
    # probe exactly AT a commit includes it
    at1 = {r["k"]: r["s"] for r in t.read(
        as_of_timestamp="2026-01-01T00:00:00").collect()}
    assert at1 == mid
    # probe after everything = latest
    assert sorted(
        r["k"] for r in t.read(as_of_timestamp="2027-01-01").collect()
    ) == [1, 3]
    # probe before everything = the original base snapshot
    base = {r["k"]: r["s"] for r in t.read(
        as_of_timestamp="2025-12-31").collect()}
    assert base == {1: "a", 2: "b", 3: "c"}
    # version-based and timestamp-based reads agree bit-for-bit
    v1 = sorted(map(tuple, t.read(as_of_version=1).collect()))
    ts1 = sorted(map(tuple, t.read(
        as_of_timestamp="2026-01-20T12:00:00").collect()))
    assert v1 == ts1


def test_timestamp_travel_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor_tsref")
    t.append_delta(
        upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"]),
        commit_timestamp=1000.0,
    )
    t.append_delta(
        upserts=spark.createDataFrame([(1, "a2", 12.0)], ["k", "s", "x"]),
        commit_timestamp=2000.0,
    )
    with pytest.raises(ValueError, match="not both"):
        t.read(as_of_version=1, as_of_timestamp=1500.0)
    # explicit timestamps must be non-decreasing
    with pytest.raises(ValueError, match="non-decreasing"):
        t.append_delta(
            upserts=spark.createDataFrame([(9, "x", 9.0)], ["k", "s", "x"]),
            commit_timestamp=500.0,
        )
    t.compact()  # horizon = 2
    # probe inside the folded era resolves to a folded version → horizon
    # refusal, never a silent read of the (later-state) base
    with pytest.raises(ValueError, match="compaction horizon"):
        t.read(as_of_timestamp=1500.0)
    # probe before every commit with a folded base: refused too
    with pytest.raises(ValueError, match="predates every"):
        t.read(as_of_timestamp=10.0)
    # probe after the horizon commit = latest state, still readable
    assert t.read(as_of_timestamp=99999.0).count() == t.read().count()


def test_changes_by_timestamp_window(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor_tschg")
    t.append_delta(
        upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"]),
        commit_timestamp=1000.0,
    )
    t.append_delta(
        upserts=spark.createDataFrame([(4, "d", 40.0)], ["k", "s", "x"]),
        delete_keys=spark.createDataFrame([(3,)], ["k"]),
        commit_timestamp=2000.0,
    )
    feed = {
        r["k"]: r["_change_type"]
        for r in t.changes(
            from_timestamp=1500.0, to_timestamp=2500.0
        ).collect()
    }
    assert feed == {4: "insert", 3: "delete"}
    # hash-equal to the version-window feed it resolves to
    by_v = sorted(map(tuple, t.changes(1, 2).collect()))
    by_ts = sorted(
        map(tuple, t.changes(from_timestamp=1000.0, to_timestamp=2000.0)
            .collect())
    )
    assert by_v == by_ts
    # from before every commit = the full feed from the base state
    full = t.changes(from_timestamp=10.0)
    assert {r["k"]: r["_change_type"] for r in full.collect()} == {
        1: "update", 4: "insert", 3: "delete"
    }


def test_unstamped_version_refused_then_healed(spark, tmp_path):
    """A crash between a delta's publish and its meta stamp leaves the
    version live-but-unstamped: timestamp resolution refuses loudly,
    and the NEXT append's stamp heals it."""
    t = _mk(spark, tmp_path / "mor_heal")
    t.append_delta(
        upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"]),
        commit_timestamp=1000.0,
    )
    # simulate the crash: drop v1's stamp from the meta
    m = t._read_meta()
    del m["version_timestamps"]["1"]
    t._write_meta_dict(m)
    with pytest.raises(ValueError, match="no recorded commit"):
        t.read(as_of_timestamp=1500.0)
    t.append_delta(
        upserts=spark.createDataFrame([(9, "z", 9.0)], ["k", "s", "x"]),
        commit_timestamp=3000.0,
    )  # heals: v1 inherits this stamp (conservative)
    assert t._read_meta()["version_timestamps"]["1"] == 3000.0
    assert t.read(as_of_timestamp=3000.0).count() == 4


# --- crash-window roll-forward + horizon pre-state ---------------------------


def _freeze_crash_window(spark, path):
    """Build the exact r14-advice crash state: compact wrote its meta
    (horizon advanced) and staged the merged snapshot, then died BEFORE
    any rename — old base live, full delta log live, staged complete."""
    t = _mk(spark, path)
    t.append_delta(
        1, upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"])
    )
    t.append_delta(2, delete_keys=spark.createDataFrame([(2,)], ["k"]))
    t.read().write.parquet(t._staged)  # staged snapshot (with _SUCCESS)
    t._write_meta(2)  # horizon advanced; crash here
    return t


def test_recovery_rolls_forward_interrupted_compact(spark, tmp_path):
    path = str(tmp_path / "mor_rollfwd")
    _freeze_crash_window(spark, path)
    t2 = MorTable(spark, path, "k")  # recovery in __init__
    # the compact FINISHED: staged promoted, subsumed versions swept,
    # no retired copy stranded
    assert not os.path.isdir(t2._staged)
    assert not any(
        d.startswith("_retired_base") for d in os.listdir(t2.path)
    )
    assert t2._existing_versions() == []
    assert {r["k"]: r["s"] for r in t2.read().collect()} == {
        1: "a1", 3: "c"
    }
    # idempotent on repeat
    t3 = MorTable(spark, path, "k")
    assert {r["k"]: r["s"] for r in t3.read().collect()} == {
        1: "a1", 3: "c"
    }


def test_changes_horizon_prestate_in_crash_window(spark, tmp_path):
    """INSIDE the crash window (no recovery ran — the handle is the
    crashed process's own), changes(from_version=horizon) must build
    its pre-state as base + still-live subsumed versions, not the raw
    base: key 2 was deleted in v2, so a v3 upsert of key 2 is an
    INSERT relative to the horizon state, and key 1's pre-image must
    carry v1's value, not the base's."""
    path = str(tmp_path / "mor_prestate")
    t = _freeze_crash_window(spark, path)
    t.append_delta(
        3,
        upserts=spark.createDataFrame(
            [(2, "back", 22.0), (1, "a3", 13.0)], ["k", "s", "x"]
        ),
    )
    feed = t.changes(2, 3, include_preimages=True)
    rows = {
        (r["k"], r["_change_type"]): r["s"] for r in feed.collect()
    }
    assert rows[(2, "insert")] == "back"  # NOT an update: deleted at v2
    assert rows[(1, "update_preimage")] == "a1"  # v1's value, not 'a'
    assert rows[(1, "update_postimage")] == "a3"


# --- schema cache -------------------------------------------------------------


def test_table_schema_served_from_meta_cache(spark, tmp_path):
    """After r15 the evolved schema rides _mor_meta.json: once every
    live version is covered by the cache, _table_schema needs NO Spark
    access at all (poisoned handle proves it) — one footer read per
    append instead of O(versions)."""
    t = _mk(spark, tmp_path / "mor_schema")
    for i in range(1, 7):
        cols = ["k", "s", "x"] + ([f"extra_{i}"] if i % 2 == 0 else [])
        row = [(100 + i, f"v{i}", float(i)) + ((i,) if i % 2 == 0 else ())]
        t.append_delta(i, upserts=spark.createDataFrame(row, cols))
    m = t._read_meta()
    assert m["schema_through"] == 6
    poisoned = MorTable(spark, t.path, "k")
    poisoned.spark = None  # any footer/base read would blow up
    names = [f.name for f in poisoned._table_schema()]
    assert names == ["k", "s", "x", "extra_2", "extra_4", "extra_6"]
    # and the cache self-heals: wipe it, next _table_schema falls back
    # to footers (needs spark), next append re-persists it
    m.pop("schema"), m.pop("schema_through")
    t._write_meta_dict(m)
    assert [f.name for f in t._table_schema()] == names
    t.append_delta(
        7, upserts=spark.createDataFrame([(200, "z", 0.0)], ["k", "s", "x"])
    )
    assert t._read_meta()["schema_through"] == 7


# --- multi-clause MERGE --------------------------------------------------------


def test_merge_into_multi_clause_first_match_wins(spark, tmp_path):
    """The r15 clause surface: WHEN MATCHED AND cond THEN UPDATE /
    WHEN MATCHED THEN DELETE / WHEN NOT MATCHED AND cond THEN INSERT —
    ordered, first-match-wins, compiled to ONE delta append, stats from
    one job. Conditions see target columns as _t_<name>."""
    t = _mk(
        spark,
        tmp_path / "mor_mc",
        rows=((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)),
    )
    source = spark.createDataFrame(
        [
            (1, "newer", 50.0),   # matched, x > target's 10 → update
            (2, "older", 5.0),    # matched, x <= target's 20 → delete
            (7, "big", 99.0),     # not matched, x > 50 → insert
            (8, "small", 1.0),    # not matched, x <= 50 → no clause → drop
        ],
        ["k", "s", "x"],
    )
    stats = t.merge_into(
        source=source,
        clauses=[
            ("matched", "x > _t_x", "update"),
            ("matched", None, "delete"),
            ("not_matched", F.col("x") > 50, "insert"),
        ],
    )
    assert stats == {
        "updated": 1, "deleted": 1, "inserted": 1, "version": 1
    }
    state = {r["k"]: (r["s"], r["x"]) for r in t.read().collect()}
    assert state == {
        1: ("newer", 50.0), 3: ("c", 30.0), 7: ("big", 99.0)
    }
    # exactly ONE delta version holds the whole merge
    assert t._existing_versions() == [1]


def test_merge_into_clause_order_matters(spark, tmp_path):
    """Swapping the two matched clauses flips every matched row's fate:
    first-match-wins is positional, exactly SQL MERGE."""
    t = _mk(spark, tmp_path / "mor_order")
    source = spark.createDataFrame([(1, "z", 99.0)], ["k", "s", "x"])
    t.merge_into(
        source=source,
        clauses=[
            ("matched", None, "delete"),
            ("matched", "x > _t_x", "update"),  # unreachable
        ],
    )
    assert sorted(r["k"] for r in t.read().collect()) == [2, 3]


def test_merge_into_ignore_and_unclaimed_rows(spark, tmp_path):
    """'ignore' claims a row and does nothing (blocking later clauses);
    a row NO clause claims is also untouched; an all-ignored merge
    commits nothing and burns no version."""
    t = _mk(spark, tmp_path / "mor_ign")
    source = spark.createDataFrame(
        [(1, "u", 100.0), (9, "n", 9.0)], ["k", "s", "x"]
    )
    stats = t.merge_into(
        source=source,
        clauses=[
            ("matched", None, "ignore"),
            ("matched", None, "update"),  # shadowed by the ignore
        ],
    )
    assert stats == {
        "updated": 0, "deleted": 0, "inserted": 0, "version": None
    }
    assert t._existing_versions() == []
    assert {r["k"]: r["s"] for r in t.read().collect()} == {
        1: "a", 2: "b", 3: "c"
    }


def test_merge_into_clause_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor_val")
    src = spark.createDataFrame([(1, "x", 1.0)], ["k", "s", "x"])
    with pytest.raises(ValueError, match="branch"):
        t.merge_into(source=src, clauses=[("sideways", None, "update")])
    with pytest.raises(ValueError, match="invalid for branch"):
        t.merge_into(source=src, clauses=[("not_matched", None, "delete")])
    with pytest.raises(ValueError, match="no clauses"):
        t.merge_into(source=src, clauses=[])


# --- MIN/MAX MV maintenance under deletes -------------------------------------


def _minmax_fixture(spark, tmp_path, name):
    from linqonsteroids_spark.operators.mor import MorTable

    t = MorTable(spark, str(tmp_path / name), "k")
    base = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 20), (3, "a", 30),
            (4, "b", 40), (5, "b", 50),
        ],
        ["k", "grp", "x"],
    )
    t.write_base(base)
    mv0 = base.groupBy("grp").agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count("*").cast("bigint").alias("n"),
    )
    return t, mv0


def _fresh_minmax(t):
    return {
        r["grp"]: (r["mn"], r["mx"], r["n"])
        for r in t.read()
        .groupBy("grp")
        .agg(
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
            F.count("*").cast("bigint").alias("n"),
        )
        .collect()
    }


def test_minmax_mv_rescans_only_retracted_extremum_groups(spark, tmp_path):
    """Deleting group a's MAX forces a rescan OF GROUP a ONLY; group b
    (touched, but not at an extremum) merges from the feed alone. The
    result is hash-equal to a from-scratch aggregate."""
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_minmax_mv,
    )

    t, mv0 = _minmax_fixture(spark, tmp_path, "mm1")
    # delete a's current max (k=3, x=30); update b's NON-extremum
    # interior... b has only extrema (40=min, 50=max) so insert an
    # interior first, then retract it — no rescan needed for b
    t.append_delta(
        1,
        upserts=spark.createDataFrame([(6, "b", 45)], ["k", "grp", "x"]),
    )
    mv1 = apply_cdf_to_minmax_mv(
        mv0,
        t.changes(0, 1, include_preimages=True),
        ["grp"],
        {"mn": ("min", "x"), "mx": ("max", "x")},
        table=None,  # pure insert: MUST not need the table
    )
    t.append_delta(
        2,
        delete_keys=spark.createDataFrame([(3,), (6,)], ["k"]),
    )
    feed2 = t.changes(1, 2, include_preimages=True)
    # k=3 retracts a's max (rescan a); k=6 retracts b's interior 45
    # (no rescan: 45 ties neither 40 nor 50)
    mv2 = apply_cdf_to_minmax_mv(
        mv1, feed2, ["grp"],
        {"mn": ("min", "x"), "mx": ("max", "x")},
        table=t.read(),
    )
    assert {
        r["grp"]: (r["mn"], r["mx"], r["n"]) for r in mv2.collect()
    } == _fresh_minmax(t)
    # cost pin: the same call with table=None raises ONLY because group
    # a needs a rescan — and names it
    with pytest.raises(ValueError, match="needs `table`"):
        apply_cdf_to_minmax_mv(
            mv1, feed2, ["grp"],
            {"mn": ("min", "x"), "mx": ("max", "x")},
            table=None,
        )


def test_minmax_mv_no_extremum_retraction_never_touches_table(
    spark, tmp_path
):
    """The fast path: inserts + interior retractions — table=None works
    end-to-end, proving untouched groups (and the table) are never
    read."""
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_minmax_mv,
    )

    t, mv0 = _minmax_fixture(spark, tmp_path, "mm2")
    # improve extrema (inserts can only improve) + retract an interior
    t.append_delta(
        1,
        upserts=spark.createDataFrame(
            [(7, "a", 5), (8, "b", 99)], ["k", "grp", "x"]
        ),
        delete_keys=spark.createDataFrame([(2,)], ["k"]),  # a's 20
    )
    mv1 = apply_cdf_to_minmax_mv(
        mv0,
        t.changes(0, 1, include_preimages=True),
        ["grp"],
        {"mn": ("min", "x"), "mx": ("max", "x")},
        table=None,
    )
    assert {
        r["grp"]: (r["mn"], r["mx"], r["n"]) for r in mv1.collect()
    } == _fresh_minmax(t)


def test_minmax_mv_group_moves_drains_and_new_groups(spark, tmp_path):
    """A group-moving update retracts from the old group (its extremum
    — rescan) and adds to the new; a drained group vanishes; a
    brand-new group is built from the feed alone."""
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_minmax_mv,
    )

    t, mv0 = _minmax_fixture(spark, tmp_path, "mm3")
    t.append_delta(
        1,
        upserts=spark.createDataFrame(
            [(4, "c", 40), (5, "c", 50)], ["k", "grp", "x"]  # b -> c
        ),
    )
    mv1 = apply_cdf_to_minmax_mv(
        mv0,
        t.changes(0, 1, include_preimages=True),
        ["grp"],
        {"mn": ("min", "x"), "mx": ("max", "x")},
        table=t.read(),
    )
    got = {r["grp"]: (r["mn"], r["mx"], r["n"]) for r in mv1.collect()}
    assert got == _fresh_minmax(t)
    assert "b" not in got and got["c"] == (40, 50, 2)


def test_minmax_mv_refuses_postimage_only_protocol(spark, tmp_path):
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_minmax_mv,
    )

    t, mv0 = _minmax_fixture(spark, tmp_path, "mm4")
    t.append_delta(
        1, upserts=spark.createDataFrame([(1, "a", 11)], ["k", "grp", "x"])
    )
    with pytest.raises(ValueError, match="include_preimages"):
        apply_cdf_to_minmax_mv(
            mv0, t.changes(0, 1), ["grp"], {"mn": ("min", "x")}
        )


# --- retention compaction + NOT MATCHED BY SOURCE -----------------------------


def test_partial_compact_folds_only_through_boundary(spark, tmp_path):
    """compact(through_version=N) folds versions <= N into the base and
    KEEPS newer deltas live with their time travel — the production
    retention shape. State equals the full-log read before and after."""
    t = _mk(spark, tmp_path / "mor_ret")
    t.append_delta(
        1, upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"]),
        commit_timestamp=1000.0,
    )
    t.append_delta(
        2, delete_keys=spark.createDataFrame([(2,)], ["k"]),
        commit_timestamp=2000.0,
    )
    t.append_delta(
        3, upserts=spark.createDataFrame([(9, "n", 90.0)], ["k", "s", "x"]),
        commit_timestamp=3000.0,
    )
    before = sorted(map(tuple, t.read().collect()))
    folded = t.compact(through_version=2)
    assert folded == 2
    assert t._existing_versions() == [3]  # v3 survives
    assert t._compacted_through() == 2
    assert sorted(map(tuple, t.read().collect())) == before
    # v3 is still time-travelable; v1/v2 refuse with the horizon rule
    assert sorted(r["k"] for r in t.read(as_of_version=3).collect()) == [
        1, 3, 9
    ]
    with pytest.raises(ValueError, match="compaction horizon"):
        t.read(as_of_version=1)
    # base now holds the as-of-2 state: k=2 gone, k=1 at a1
    base = {r["k"]: r["s"] for r in spark.read.parquet(t._base).collect()}
    assert base == {1: "a1", 3: "c"}


def test_retention_compact_by_timestamp(spark, tmp_path):
    """compact(older_than_timestamp=t) resolves the boundary via the
    recorded commit wall-clocks, snapping DOWN to a live version; a
    boundary before every commit is a no-op."""
    t = _mk(spark, tmp_path / "mor_rett")
    t.append_delta(
        1, upserts=spark.createDataFrame([(1, "a1", 11.0)], ["k", "s", "x"]),
        commit_timestamp=1000.0,
    )
    t.append_delta(
        2, upserts=spark.createDataFrame([(9, "n", 90.0)], ["k", "s", "x"]),
        commit_timestamp=2000.0,
    )
    assert t.compact(older_than_timestamp=500.0) == 0  # nothing that old
    assert t._existing_versions() == [1, 2]
    folded = t.compact(older_than_timestamp=1500.0)  # resolves to v1
    assert folded == 1
    assert t._existing_versions() == [2]
    assert {r["k"]: r["s"] for r in t.read().collect()} == {
        1: "a1", 2: "b", 3: "c", 9: "n"
    }
    with pytest.raises(ValueError, match="not both"):
        t.compact(through_version=2, older_than_timestamp=1.0)


def test_merge_not_matched_by_source_deletes_gone_rows(spark, tmp_path):
    """The snapshot-sync branch: target rows absent from the source are
    deleted (optionally under a condition on the TARGET row), in the
    same single delta append as the other clauses."""
    t = _mk(spark, tmp_path / "mor_nbs")
    # source snapshot: k=1 (update), k=9 (insert); k=2 and k=3 are gone
    # from the snapshot — delete only the ones with x < 25
    source = spark.createDataFrame(
        [(1, "a1", 11.0), (9, "n", 90.0)], ["k", "s", "x"]
    )
    stats = t.merge_into(
        source=source,
        clauses=[
            ("matched", None, "update"),
            ("not_matched", None, "insert"),
            ("not_matched_by_source", "x < 25", "delete"),
        ],
    )
    assert stats == {
        "updated": 1, "deleted": 0, "inserted": 1,
        "deleted_by_source": 1, "version": 1,
    }
    # k=2 (x=20 < 25) deleted; k=3 (x=30) retained by the condition
    assert {r["k"]: r["s"] for r in t.read().collect()} == {
        1: "a1", 3: "c", 9: "n"
    }
    assert t._existing_versions() == [1]  # ONE delta for all legs


def test_merge_nbs_only_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor_nbs2")
    empty = spark.createDataFrame([], "k bigint, s string, x double")
    # full-sync delete against an empty snapshot clears the table
    stats = t.merge_into(
        source=empty,
        clauses=[("not_matched_by_source", None, "delete")],
    )
    assert stats["deleted_by_source"] == 3 and stats["version"] == 1
    assert t.read().count() == 0
    with pytest.raises(ValueError, match="invalid for branch"):
        t.merge_into(
            source=empty,
            clauses=[("not_matched_by_source", None, "insert")],
        )


def test_merge_update_set_expressions(spark, tmp_path):
    """('update', {col: expr}) — SQL's UPDATE SET: assigned columns
    evaluate over source (bare) + target (_t_) values, unassigned
    columns KEEP the target's current value. The increment-merge shape
    ledgers need, impossible with full-row replace."""
    t = _mk(spark, tmp_path / "mor_set")
    # source carries deltas to ADD to x; s should stay the target's
    source = spark.createDataFrame(
        [(1, "ignored", 5.0), (2, "ignored", 7.0), (9, "new", 90.0)],
        ["k", "s", "x"],
    )
    stats = t.merge_into(
        source=source,
        clauses=[
            ("matched", None, ("update", {"x": "_t_x + x"})),
            ("not_matched", None, "insert"),
        ],
    )
    assert stats == {
        "updated": 2, "deleted": 0, "inserted": 1, "version": 1
    }
    state = {r["k"]: (r["s"], r["x"]) for r in t.read().collect()}
    assert state == {
        1: ("a", 15.0),   # x incremented, s KEPT from target
        2: ("b", 27.0),
        3: ("c", 30.0),   # untouched
        9: ("new", 90.0),  # plain insert carries the source row
    }


def test_merge_update_set_validation_and_mixed_legs(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor_set2")
    src = spark.createDataFrame([(1, "z", 1.0)], ["k", "s", "x"])
    with pytest.raises(ValueError, match="unknown column"):
        t.merge_into(
            source=src,
            clauses=[("matched", None, ("update", {"nope": "1"}))],
        )
    with pytest.raises(ValueError, match="reassign the table key"):
        t.merge_into(
            source=src,
            clauses=[("matched", None, ("update", {"k": "k + 1"}))],
        )
    with pytest.raises(ValueError, match="matched branch"):
        t.merge_into(
            source=src,
            clauses=[("not_matched", None, ("update", {"x": "1"}))],
        )
    # two SET clauses with different assignments + a full-row update,
    # first-match-wins: %2 keys increment, %3 keys cap, rest replace
    src2 = spark.createDataFrame(
        [(1, "r", 100.0), (2, "r", 100.0), (3, "r", 100.0)],
        ["k", "s", "x"],
    )
    stats = t.merge_into(
        source=src2,
        clauses=[
            ("matched", "k % 2 = 0", ("update", {"x": "_t_x + 1"})),
            ("matched", "k % 3 = 0", ("update", {"s": F.lit("capped")})),
            ("matched", None, "update"),
        ],
    )
    assert stats["updated"] == 3
    state = {r["k"]: (r["s"], r["x"]) for r in t.read().collect()}
    assert state == {
        1: ("r", 100.0),      # full-row replace
        2: ("b", 21.0),       # x += 1, s kept
        3: ("capped", 30.0),  # s capped, x kept
    }


def test_concurrent_appenders_across_processes(spark, tmp_path):
    """Two OS processes (separate JVMs, separate Python interpreters)
    race allocate-mode appends on the same table path — the cross-
    process half of the multi-writer contract that thread tests cannot
    exercise (POSIX no-clobber rename and flock are per-process
    primitives). Both must land under distinct versions; the parent's
    read equals the serial application."""
    import subprocess
    import sys
    import time

    path = str(tmp_path / "mor_proc")
    t = _mk(spark, path)
    go = str(tmp_path / "go")  # start barrier: both wait for this file

    script = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
path, tag, key, go = sys.argv[1:5]
spark = (SparkSession.builder.master("local[2]")
         .appName(f"w{tag}")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from linqonsteroids_spark.operators.mor import MorTable
h = MorTable(spark, path, "k")
df = spark.createDataFrame([(int(key), tag, float(key))], ["k", "s", "x"])
df.collect()  # warm the session before the race
while not os.path.exists(go):
    time.sleep(0.02)
v = h.append_delta(upserts=df)
print(f"VERSION={v}", flush=True)
spark.stop()
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, path, tag, key, go],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for tag, key in (("P1", "201"), ("P2", "202"))
    ]
    time.sleep(20)  # let both sessions boot before releasing the race
    open(go, "w").write("go")
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    versions = sorted(
        int(line.split("=")[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("VERSION=")
    )
    assert versions == [1, 2], outs  # distinct and dense
    state = {r["k"]: r["s"] for r in t.read().collect()}
    assert state[201] == "P1" and state[202] == "P2"
    assert state[1] == "a"


def test_merge_bulk_mode_equals_broadcast_mode(spark, tmp_path):
    """broadcast_source=False (the bulk-merge escape hatch: no
    broadcast hints, no eager matched-set checkpoint — shuffle joins,
    two classification passes) must produce byte-identical state and
    stats to the default broadcast path."""
    src = spark.createDataFrame(
        [(1, "u", 99.0), (2, "d", 0.0), (9, "n", 9.0)], ["k", "s", "x"]
    )
    clauses = [
        ("matched", "x > _t_x", "update"),
        ("matched", None, "delete"),
        ("not_matched", None, "insert"),
        ("not_matched_by_source", "x > 25", "delete"),
    ]
    results = {}
    for mode in (True, False):
        t = _mk(spark, tmp_path / f"mor_bulk_{mode}")
        stats = t.merge_into(
            source=src, clauses=clauses, broadcast_source=mode
        )
        results[mode] = (
            stats,
            sorted(map(tuple, t.read().collect())),
        )
    assert results[True] == results[False]
    stats, state = results[True]
    # sanity on the fixture itself: k1 updated (99>10), k2 deleted,
    # k9 inserted, k3 (x=30>25) garbage-collected by source absence
    assert stats == {
        "updated": 1, "deleted": 1, "inserted": 1,
        "deleted_by_source": 1, "version": 1,
    }
    assert [r[0] for r in state] == [1, 9]


def test_orphaned_append_staging_is_swept_dead_pid_only(spark, tmp_path):
    """A crashed append strands its staged delta dir; the next handle
    construction reclaims it — but ONLY when the staging writer's pid
    is dead, so a live concurrent appender mid-publish is untouched."""
    import os

    t = _mk(spark, tmp_path / "mor_orphan")
    dead = os.path.join(t.path, "_delta_staged.999999999.deadbeef0000")
    live = os.path.join(
        t.path, f"_delta_staged.{os.getpid()}.cafecafe0000"
    )
    odd = os.path.join(t.path, "_delta_staged.not-a-pid")
    for d in (dead, live, odd):
        os.makedirs(d)
        open(os.path.join(d, "part-0.parquet"), "w").write("x")
    t2 = MorTable(spark, t.path, "k")  # sweep runs in __init__
    assert not os.path.isdir(dead), "dead writer's staging reclaimed"
    assert os.path.isdir(live), "live writer's staging untouched"
    assert os.path.isdir(odd), "unparseable layout left for a human"
    assert t2.read().count() == 3  # table itself unharmed


def test_zombie_merge_loses_after_lease_takeover(spark, tmp_path):
    """A merge whose lease expires mid-classification must ABORT before
    publishing (its classification is against a pre-takeover state) —
    the fence probe immediately before the append is what catches it,
    because fencing on meta writes alone would fire only AFTER the
    delta landed."""
    import threading
    import time

    path = str(tmp_path / "mor_zombie")
    be = ConditionalPutBackend(lease_ttl_s=0.05)
    with use_backend(be):
        t = _mk(spark, path)
        src = spark.createDataFrame([(1, "z", 99.0)], ["k", "s", "x"])

        taken = threading.Event()

        def usurper():
            h = MorTable(spark, path, "k")
            time.sleep(0.2)  # let the zombie's lease expire
            with h._locked():  # takeover bumps the fence
                taken.set()

        # simulate the zombie: hold the lock, let the TTL lapse and the
        # usurper take over, then attempt the guarded append path
        th = threading.Thread(target=usurper)
        with t._locked():
            th.start()
            assert taken.wait(30)
            with pytest.raises(RuntimeError, match="fence lost"):
                t._merge_into(
                    None,
                    src,
                    [("matched", None, "update")],
                    None,
                    True,
                )
        th.join(30)
        # nothing published: the table is untouched
        assert t._existing_versions() == []
        assert {r["s"] for r in t.read().where("k = 1").collect()} == {
            "a"
        }


def test_compact_zorder_by_restages_along_morton_curve(spark, tmp_path):
    """compact(zorder_by=[...]) — OPTIMIZE ZORDER BY as a compaction
    option: state identical to a plain compact, and the new base's
    parquet footers carry narrow per-file spans on BOTH z-ordered
    columns (the data-skipping property the rewrite buys)."""
    from linqonsteroids_spark.operators.mor import MorTable

    t = MorTable(spark, str(tmp_path / "mor_z"), "k")
    n = 4000
    base = spark.range(n).selectExpr(
        "id AS k",
        "CAST(id % 97 AS DOUBLE) AS x",
        "CAST((id * 37) % 89 AS DOUBLE) AS y",
    )
    t.write_base(base)
    t.append_delta(
        1, delete_keys=spark.createDataFrame([(7,), (8, )], ["k"])
    )
    before = sorted(map(tuple, t.read().collect()))
    t.compact(zorder_by=["x", "y"])
    assert t._existing_versions() == []
    assert sorted(map(tuple, t.read().collect())) == before
    # skipping property: per-file spans on each z column are a small
    # fraction of the domain for MOST files (a plain write gives every
    # file the full span)
    stats = (
        spark.read.parquet(t._base)
        .groupBy(F.col("_metadata.file_name"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(stats) > 4
    narrow = [r for r in stats if r["sx"] < 97 * 0.7 and r["sy"] < 89 * 0.7]
    assert len(narrow) >= len(stats) // 2, (
        [(round(r['sx']), round(r['sy'])) for r in stats]
    )


def test_compact_zorder_refuses_stats_manifest_conflict(spark, tmp_path):
    from linqonsteroids_spark.operators.mor import MorTable

    t = MorTable(spark, str(tmp_path / "mor_zc"), "k")
    t.write_base(
        spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS x"),
        stats_files=4,
    )
    t.append_delta(1, delete_keys=spark.createDataFrame([(5,)], ["k"]))
    with pytest.raises(ValueError, match="one physical order"):
        t.compact(zorder_by=["x"])
    t.compact()  # the stats-preserving path still works
    assert t._compacted_through() == 1
