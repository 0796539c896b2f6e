"""sources/commitlog.py: the commit-protocol seam (r12 verdict item 7).

Every lakehouse operator's atomic publish routes through the seam's
four primitives. The contract tests here run against BOTH in-tree
backends — POSIX (rename/link/flock) and the object-store-semantics
``ConditionalPutBackend`` (generation-checked conditional PUTs, lease
locks, injectable race windows) — so a real S3/GCS/ABFS port has an
executable conformance target, not just the docstring contract (the
r13 verdict's item 5).
"""

from __future__ import annotations

import os
import threading

import pytest

from linqonsteroids_spark.sources.commitlog import (
    ConditionalPutBackend,
    PosixBackend,
    atomic_replace,
    commit_lock,
    publish_dir_if_absent,
    put_if_absent,
    use_backend,
)


@pytest.fixture(params=["posix", "conditional-put"])
def backend(request):
    b = (
        PosixBackend()
        if request.param == "posix"
        else ConditionalPutBackend()
    )
    with use_backend(b):
        yield b


def test_atomic_replace_file_and_dir(tmp_path, backend):
    f = tmp_path / "final.json"
    f.write_text("old")
    tmp = tmp_path / "staged.json"
    tmp.write_text("new")
    atomic_replace(str(tmp), str(f))
    assert f.read_text() == "new" and not tmp.exists()
    # dir replace (the MOR staged->base swap shape; the object-store
    # equivalent is a manifest pointer flip, still one key update)
    d_old = tmp_path / "base"
    d_old.mkdir()
    d_new = tmp_path / "staged"
    d_new.mkdir()
    (d_new / "part").write_text("x")
    atomic_replace(str(d_new), str(d_old))
    assert (d_old / "part").read_text() == "x" and not d_new.exists()


def test_put_if_absent_single_winner(tmp_path, backend):
    path = str(tmp_path / "v_1.json")
    outcomes = []

    def racer(payload):
        outcomes.append((put_if_absent(path, payload), payload))

    threads = [
        threading.Thread(target=racer, args=(f"writer-{i}",))
        for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [p for ok, p in outcomes if ok]
    assert len(winners) == 1
    with open(path) as f:
        assert f.read() == winners[0]  # losers never touched the object
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]


def test_publish_dir_if_absent_loser_discards_staging(tmp_path, backend):
    final = str(tmp_path / "entry")

    def stage(tag):
        d = tmp_path / f"staged.{tag}"
        d.mkdir()
        (d / "data").write_text(tag)
        (d / "_SUCCESS").write_text("")
        return str(d)

    a, b = stage("a"), stage("b")
    won_a = publish_dir_if_absent(a, final)
    won_b = publish_dir_if_absent(b, final)
    assert won_a and not won_b
    assert (tmp_path / "entry" / "data").read_text() == "a"
    # the loser's staging is gone; the winner's entry is untouched
    assert not os.path.exists(b)
    assert os.path.exists(os.path.join(final, "_SUCCESS"))


def test_commit_lock_serializes_check_then_swap(tmp_path, backend):
    lock = str(tmp_path / ".lock")
    counter = {"v": 0}

    def bump():
        with commit_lock(lock):
            v = counter["v"]
            # a yield point wide enough that unserialized racers would
            # interleave and lose increments
            import time

            time.sleep(0.01)
            counter["v"] = v + 1

    threads = [threading.Thread(target=bump) for _ in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert counter["v"] == 10


def test_conditional_put_detects_injected_race(tmp_path):
    """The mock's reason to exist: a competing PUT landing INSIDE the
    check→publish window must lose the conditional operation — the
    generation precondition (If-None-Match / ifGenerationMatch=0)
    decides, not filesystem timing. An implementation that 'checked
    then wrote' unconditionally would silently clobber the competitor;
    the backend's loss counter proves the precondition fired."""
    b = ConditionalPutBackend()
    key = str(tmp_path / "commit.json")

    def competitor(op, path):
        b.race_hook = None  # one-shot: the competitor must not recurse
        assert b.put_if_absent(path, "competitor")

    b.race_hook = competitor
    with use_backend(b):
        assert not put_if_absent(key, "late-writer")
    assert open(key).read() == "competitor"
    assert b.stats["conditional_losses"] == 1

    # same window for the directory variant
    final = str(tmp_path / "entry")
    staged = tmp_path / "staged"
    staged.mkdir()
    (staged / "data").write_text("late")

    def dir_competitor(op, path):
        b.race_hook = None
        win = tmp_path / "competitor_staged"
        win.mkdir()
        (win / "data").write_text("competitor")
        assert b.publish_dir_if_absent(str(win), path)

    b.race_hook = dir_competitor
    with use_backend(b):
        assert not publish_dir_if_absent(str(staged), final)
    assert (tmp_path / "entry" / "data").read_text() == "competitor"
    assert not staged.exists()  # loser's staging reclaimed


def test_conditional_put_lease_lock_blocks_until_release(tmp_path):
    """commit_lock on an object store is a LEASE acquired by
    conditional-create: a second claimant spins on lost conditional
    PUTs until the holder deletes the lease — mutual exclusion without
    flock, visible in the lease_retries counter."""
    b = ConditionalPutBackend()
    lock = str(tmp_path / ".lock")
    order = []

    def worker(tag, hold_s):
        with b.commit_lock(lock):
            order.append(f"{tag}-in")
            import time

            time.sleep(hold_s)
            order.append(f"{tag}-out")

    t1 = threading.Thread(target=worker, args=("a", 0.05))
    t1.start()
    import time

    time.sleep(0.01)  # ensure a holds the lease first
    t2 = threading.Thread(target=worker, args=("b", 0.0))
    t2.start()
    t1.join()
    t2.join()
    assert order == ["a-in", "a-out", "b-in", "b-out"]
    assert b.stats["lease_retries"] >= 1  # b really spun on the lease
    assert not os.path.exists(lock + ".lease")  # released


def test_conditional_put_lease_ttl_takeover_and_fencing(tmp_path):
    """With lease_ttl_s set, a CRASHED holder's lease expires and the
    next claimant takes it over; fencing makes the takeover SAFE: the
    zombie's token is permanently stale, so its late fenced_put loses
    while the new holder's succeeds — expiry alone would let the
    zombie corrupt state mid-write."""
    import time

    b = ConditionalPutBackend(lease_ttl_s=0.05)
    lock = str(tmp_path / ".lock")
    key = str(tmp_path / "commit.json")

    # crashed holder: enter the lock and never exit
    crashed = b.commit_lock(lock)
    f1 = crashed.__enter__()
    assert os.path.exists(lock + ".lease")

    # a new claimant waits out the TTL, takes the lease over, and
    # receives a STRICTLY HIGHER fencing token
    t0 = time.time()
    with b.commit_lock(lock) as f2:
        assert time.time() - t0 >= 0.04  # really waited for expiry
        assert f2 > f1
        assert b.stats["lease_takeovers"] == 1
        # the zombie wakes up and tries to publish: stale fence loses
        assert not b.fenced_put(key, "zombie", lock, f1)
        assert b.fenced_put(key, "current-holder", lock, f2)
    assert open(key).read() == "current-holder"
    # the zombie's late release must NOT destroy state it no longer
    # owns: the new holder already released; a fresh claimant works
    crashed.__exit__(None, None, None)
    with b.commit_lock(lock) as f3:
        assert f3 > f2
    assert not os.path.exists(lock + ".lease")


def test_lakehouse_operators_green_on_conditional_put_backend(
    spark, tmp_path
):
    """WAP, MOR (incl. compact's swaps), and the ResultCache commit
    through the seam only — swapping in the object-store-semantics
    backend must leave every one of them functionally green, and the
    backend's generation table must show their commits actually routed
    through it (no operator secretly bypasses the seam)."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.operators.wap import WapTable
    from linqonsteroids_spark.plans.result_cache import ResultCache

    b = ConditionalPutBackend()
    with use_backend(b):
        # MOR lifecycle: base -> delta -> compact -> read
        t = MorTable(spark, str(tmp_path / "mor"), "k")
        t.write_base(
            spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
        )
        t.append_delta(
            1, upserts=spark.createDataFrame([(1, "a1")], ["k", "s"])
        )
        t.compact()
        assert {r["k"]: r["s"] for r in t.read().collect()} == {
            1: "a1",
            2: "b",
        }

        # WAP: stage -> audit -> publish -> read
        w = WapTable(spark, str(tmp_path / "wap"))
        sid = w.stage(spark.createDataFrame([(1, 10.0)], ["k", "x"]))
        w.publish(sid, {"pos": F.col("x") > 0}, expect=None)
        assert w.read().count() == 1

        # ResultCache: miss materializes, hit reuses
        rc = ResultCache(spark, str(tmp_path / "rc"))
        df = spark.createDataFrame([(1, 2)], ["a", "b"])
        _, hit1 = rc.get_or_materialize(df.groupBy("a").count())
        _, hit2 = rc.get_or_materialize(df.groupBy("a").count())
        assert (hit1, hit2) == (False, True)
    assert len(b.generations) >= 3  # commits really went through the mock
