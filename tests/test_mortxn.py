"""Multi-table atomic transactions (operators/mortxn.py).

The protocol's whole point is the crash matrix: every test that
matters here kills the writer at a different point and asserts both
tables move TOGETHER or not at all — the decision-record CAS is the
single commit point, everything after it is idempotent finalize.
"""

import os

import pytest


def _two_tables(spark, tmp_path):
    from linqonsteroids_spark.operators.mor import MorTable

    corpus = MorTable(spark, str(tmp_path / "corpus"), "doc_id")
    index = MorTable(spark, str(tmp_path / "index"), "doc_id")
    corpus.write_base(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "gamma")], ["doc_id", "text"]
        )
    )
    index.write_base(
        spark.createDataFrame(
            [(1, "f1"), (2, "f2"), (3, "f3")], ["doc_id", "fp"]
        )
    )
    return corpus, index


def _takedown(txn, corpus, index, spark, doc_id):
    dk = spark.createDataFrame([(doc_id,)], ["doc_id"])
    corpus.append_delta(delete_keys=dk, txn=txn)
    index.append_delta(delete_keys=dk, txn=txn)


def test_txn_invisible_until_commit_then_atomic(spark, tmp_path):
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 2)
    # both version dirs exist on disk, neither is readable anywhere
    assert corpus._all_claimed_versions() == [1]
    assert corpus._existing_versions() == []
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 2, 3}
    assert {r["doc_id"] for r in index.read().collect()} == {1, 2, 3}
    txn.commit()
    # one decision CAS flipped BOTH tables
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3}
    assert {r["doc_id"] for r in index.read().collect()} == {1, 3}
    # finalize retired the markers and stamped the commits
    assert not os.path.exists(
        os.path.join(corpus._delta_root, "mor_v=1", "_TXN")
    )
    assert "1" in corpus._read_meta()["version_timestamps"]


def test_txn_abort_sweeps_and_preserves_state(spark, tmp_path):
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 3)
    txn.abort()
    assert corpus._all_claimed_versions() == []
    assert index._all_claimed_versions() == []
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 2, 3}
    with pytest.raises(RuntimeError, match="aborted"):
        txn.commit()  # the decision is permanent


def test_txn_crashed_writer_recovery_paths(spark, tmp_path):
    """Crash BEFORE the decision: versions stay invisible across new
    constructions (the writer might still be alive) until an explicit
    force_abort, after which the next construction sweeps the debris.
    Crash AFTER the decision but before finalize: the decision alone
    makes the versions visible; the next construction replays the
    idempotent finalize."""
    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))

    # -- crash before decision ------------------------------------------------
    t1 = log.begin()
    _takedown(t1, corpus, index, spark, 1)
    fresh = MorTable(spark, str(tmp_path / "corpus"), "doc_id")
    assert fresh._all_claimed_versions() == [1]  # NOT swept: undecided
    assert fresh._existing_versions() == []
    log.force_abort(t1.id)
    fresh = MorTable(spark, str(tmp_path / "corpus"), "doc_id")
    assert fresh._all_claimed_versions() == []  # aborted debris swept
    with pytest.raises(RuntimeError, match="force_abort"):
        t1.commit()  # the late writer loses the race, loudly

    # -- crash after decision, before finalize --------------------------------
    t2 = log.begin()
    _takedown(t2, corpus, index, spark, 2)
    log._decide(t2.id, "commit")  # the CAS landed; finalize "crashed"
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3}
    assert {r["doc_id"] for r in index.read().collect()} == {1, 3}
    healed = MorTable(spark, str(tmp_path / "corpus"), "doc_id")
    v = healed._existing_versions()
    assert len(v) == 1
    assert not os.path.exists(
        os.path.join(
            healed._delta_root, f"mor_v={v[0]}", "_TXN"
        )
    )


def test_txn_decision_race_single_winner(spark, tmp_path):
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 2)
    txn.commit()
    with pytest.raises(RuntimeError, match="already committed"):
        log.force_abort(txn.id)
    with pytest.raises(RuntimeError, match="already committed"):
        txn.abort()
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3}


def test_txn_concurrent_normal_append_interleaves(spark, tmp_path):
    """A normal append during an in-flight transaction allocates past
    the claimed version and is visible immediately; the later commit
    slots the transactional version in below it, and the read result
    equals applying both."""
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 2)  # claims v1, in-flight
    v = corpus.append_delta(
        upserts=spark.createDataFrame(
            [(4, "delta")], ["doc_id", "text"]
        )
    )
    assert v == 2  # allocation saw the in-flight claim
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 2, 3, 4}
    txn.commit()
    assert corpus._existing_versions() == [1, 2]
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3, 4}


def test_txn_inflight_blocks_compaction(spark, tmp_path):
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 2)  # in-flight v1
    corpus.append_delta(
        upserts=spark.createDataFrame([(4, "d")], ["doc_id", "text"])
    )  # visible v2
    corpus.append_delta(
        upserts=spark.createDataFrame([(5, "e")], ["doc_id", "text"])
    )  # visible v3
    with pytest.raises(ValueError, match="in-flight transactional"):
        corpus.compact()
    with pytest.raises(ValueError, match="in-flight transactional"):
        corpus.compact_log()
    txn.commit()
    assert corpus.compact() == 3
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3, 4, 5}


def test_txn_restrictions_refuse_loudly(spark, tmp_path):
    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, _ = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    with pytest.raises(ValueError, match="may not add new columns"):
        corpus.append_delta(
            upserts=spark.createDataFrame(
                [(1, "x", 9)], ["doc_id", "text", "brand_new"]
            ),
            txn=txn,
        )
    digest = MorTable(
        spark, str(tmp_path / "digest"), "doc_id", digest_manifest=True
    )
    with pytest.raises(ValueError, match="digest_manifest"):
        digest.append_delta(
            delete_keys=spark.createDataFrame([(1,)], ["doc_id"]),
            txn=txn,
        )


def test_txn_commit_stamps_timestamp_travel(spark, tmp_path):
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 2)
    txn.commit(commit_timestamp="2026-06-01T00:00:00")
    got = {
        r["doc_id"]
        for r in corpus.read(
            as_of_timestamp="2026-06-30T00:00:00"
        ).collect()
    }
    assert got == {1, 3}


@pytest.mark.parametrize("backend", ["posix", "condput"])
def test_txn_lifecycle_on_both_seam_backends(spark, tmp_path, backend):
    """The decision CAS is a plain seam put_if_absent, so the whole
    protocol must conform on the object-store-semantics backend too —
    commit flips both tables together, the decision race has one
    winner, and a double-resolve refuses."""
    from linqonsteroids_spark.operators.mortxn import MorTxnLog
    from linqonsteroids_spark.sources.commitlog import (
        ConditionalPutBackend,
        PosixBackend,
        use_backend,
    )

    b = (
        PosixBackend()
        if backend == "posix"
        else ConditionalPutBackend()
    )
    with use_backend(b):
        corpus, index = _two_tables(spark, tmp_path)
        log = MorTxnLog(str(tmp_path / "txnlog"))
        txn = log.begin()
        _takedown(txn, corpus, index, spark, 2)
        assert corpus._existing_versions() == []
        txn.commit()
        assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3}
        assert {r["doc_id"] for r in index.read().collect()} == {1, 3}
        with pytest.raises(RuntimeError, match="already committed"):
            log.force_abort(txn.id)
        t2 = log.begin()
        _takedown(t2, corpus, index, spark, 3)
        log.force_abort(t2.id)
        with pytest.raises(RuntimeError, match="force_abort"):
            t2.commit()
        assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3}


def test_txn_commit_serializes_under_table_locks(spark, tmp_path):
    """commit() CASes the decision while holding every enlisted
    table's commit lock: a maintenance op inside its own locked window
    delays the flip (no write skew against merge/compact decision
    windows), and enlisting two HANDLES of one table path must not
    self-deadlock (path-level dedup)."""
    import threading
    import time

    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    corpus, index = _two_tables(spark, tmp_path)
    log = MorTxnLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    _takedown(txn, corpus, index, spark, 2)
    # a second handle of the SAME corpus path enlists one more delta —
    # commit must dedup the lock by path or deadlock against itself
    corpus2 = MorTable(spark, str(tmp_path / "corpus"), "doc_id")
    corpus2.append_delta(
        upserts=spark.createDataFrame(
            [(4, "delta")], ["doc_id", "text"]
        ),
        txn=txn,
    )

    order = []

    def hold_lock():
        with corpus._locked():
            order.append("locked")
            time.sleep(1.0)
            order.append("released")

    t = threading.Thread(target=hold_lock)
    t.start()
    while not order:  # wait until the maintenance window is open
        time.sleep(0.01)
    txn.commit()
    order.append("committed")
    t.join()
    assert order == ["locked", "released", "committed"]
    assert {r["doc_id"] for r in corpus.read().collect()} == {1, 3, 4}
    assert {r["doc_id"] for r in index.read().collect()} == {1, 3}
