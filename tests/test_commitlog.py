"""sources/commitlog.py: the commit-protocol seam (r12 verdict item 7).

Every lakehouse operator's atomic publish routes through these four
primitives; these tests pin their semantics directly so a future
object-store backend has an executable contract to match.
"""

from __future__ import annotations

import os
import threading

from linqonsteroids_spark.sources.commitlog import (
    atomic_replace,
    commit_lock,
    publish_dir_if_absent,
    put_if_absent,
)


def test_atomic_replace_file_and_dir(tmp_path):
    f = tmp_path / "final.json"
    f.write_text("old")
    tmp = tmp_path / "staged.json"
    tmp.write_text("new")
    atomic_replace(str(tmp), str(f))
    assert f.read_text() == "new" and not tmp.exists()
    # empty-dir replace (the MOR staged->base swap shape)
    d_old = tmp_path / "base"
    d_old.mkdir()
    d_new = tmp_path / "staged"
    d_new.mkdir()
    (d_new / "part").write_text("x")
    atomic_replace(str(d_new), str(d_old))
    assert (d_old / "part").read_text() == "x" and not d_new.exists()


def test_put_if_absent_single_winner(tmp_path):
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


def test_publish_dir_if_absent_loser_discards_staging(tmp_path):
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


def test_commit_lock_serializes_check_then_swap(tmp_path):
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
