"""Multi-table atomic transactions across merge-on-read tables.

The serving tier's missing cross-table guarantee: a takedown must
delete a document from the corpus table AND its rows from the band
index (dedup/minhash.py::maintain_band_index stores the index AS a
MorTable) — readers must never observe one without the other. Single
-table MOR commits are atomic (one directory CAS through the commit
seam), but two tables mean two CAS points, and no ordering of two
renames is atomic. This module adds the classic solution: make the
commit point a SINGLE compare-and-create of a decision record, and
make readers resolve any undecided version against it.

Protocol (presumed-abort, decision-by-CAS — the shape of Iceberg's
REST-catalog multi-table commits and of every write-ahead decision
log since Gray's presumed-abort 2PC, re-expressed on the commit
seam's ``put_if_absent``):

1. ``txn = MorTxnLog(path).begin()`` mints a transaction id.
2. ``table.append_delta(..., txn=txn)`` publishes the delta version
   dir exactly as a normal append (seam-allocated CAS name), except
   the staged dir carries a ``_TXN`` marker file naming the txn and
   its log. The marker travels atomically WITH the directory rename,
   so there is no window where a reader can see the version without
   knowing it is transactional.
3. Readers (``MorTable._existing_versions``) treat a marked version
   as visible ONLY if the log holds a ``commit`` decision for its
   txn: no decision = in-flight = invisible, ``abort`` = invisible
   (and sweepable). Unmarked versions are unconditionally visible —
   the normal append path pays nothing.
4. ``txn.commit()`` — the SINGLE commit point — CAS-creates the
   decision record with verdict ``commit``. The instant that file
   exists, every enlisted version on every table becomes visible
   TOGETHER; a crash one nanosecond earlier leaves all of them
   invisible together. Everything after (marker removal, timestamp
   stamping) is idempotent finalize that any later construction
   replays.
5. ``txn.abort()`` CAS-creates verdict ``abort`` and sweeps the
   enlisted dirs. A crashed writer that never decided is aborted by
   ``MorTxnLog.force_abort`` (an operator/maintenance action): the
   CAS race between a late ``commit()`` and a ``force_abort`` has
   exactly one winner — the loser observes the existing decision and
   complies, which is what makes the decision file a real commit
   point rather than a hint.

Scale shape: the decision probe costs one metadata stat per MARKED
version per listing — zero for tables with no in-flight transactions
(the common case; finalize removes markers), and markers below the
compaction horizon are swept by recovery. No data is rewritten
anywhere: begin/commit/abort are O(1) metadata operations regardless
of table or delta size.

Restrictions (v1, enforced loudly): transactional appends may not
ADD new columns (a committed-late version numbered below the schema
cache's watermark would evade the catch-up scan), and may not target
``digest_manifest=True`` tables (the manifest applies each append's
images at append time; an aborted txn would leave them applied).

Reference parity note: the reference engine (Scala expression trees,
``src/main/scala/ivm``) has no table/transaction tier at all — this
is part of the engine's own north-star serving story, patterned on
public Iceberg/Delta commit-protocol documentation.
"""

from __future__ import annotations

import json
import os
import uuid

from linqonsteroids_spark.sources.commitlog import put_if_absent

_MARKER = "_TXN"


def txn_marker_path(version_dir: str) -> str:
    return os.path.join(version_dir, _MARKER)


def read_marker(version_dir: str) -> dict | None:
    """The ``_TXN`` marker of a version dir, or None for a normal
    (non-transactional) version."""
    p = txn_marker_path(version_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def txn_decision(log_path: str, txn_id: str) -> str | None:
    """'commit', 'abort', or None (in-flight / unknown)."""
    p = os.path.join(log_path, f"txn_{txn_id}.decision")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip() or None


def version_visibility(version_dir: str) -> str:
    """'visible' | 'in-flight' | 'aborted' for one version dir."""
    marker = read_marker(version_dir)
    if marker is None:
        return "visible"
    dec = txn_decision(marker["log"], marker["txn"])
    if dec == "commit":
        return "visible"
    if dec == "abort":
        return "aborted"
    return "in-flight"


class MorTxnLog:
    """The decision log — one directory of ``txn_<id>.decision``
    files, each created exactly once through the commit seam's
    compare-and-create. Shareable by any number of tables; a
    deployment typically has one per catalog."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def begin(self) -> "MorTxn":
        return MorTxn(self, uuid.uuid4().hex[:16])

    def decision(self, txn_id: str) -> str | None:
        return txn_decision(self.path, txn_id)

    def _decide(self, txn_id: str, verdict: str) -> str:
        """CAS the decision; returns the verdict that actually holds
        (the racing winner's, when this call lost)."""
        p = os.path.join(self.path, f"txn_{txn_id}.decision")
        if put_if_absent(p, verdict):
            return verdict
        existing = txn_decision(self.path, txn_id)
        assert existing in ("commit", "abort"), existing
        return existing

    def force_abort(self, txn_id: str) -> None:
        """Maintenance: decide ``abort`` for a transaction whose
        writer appears dead (e.g. compact refused on its in-flight
        versions). Safe against a writer that is actually alive and
        racing toward commit: exactly one CAS wins — if the writer
        already committed, this refuses loudly instead of lying."""
        if self._decide(txn_id, "abort") == "commit":
            raise RuntimeError(
                f"transaction {txn_id} already committed: force_abort "
                "lost the decision race — its versions are visible"
            )


class MorTxn:
    """One transaction: enlist versions via
    ``MorTable.append_delta(..., txn=self)``, then ``commit()`` or
    ``abort()``. Instances are single-use."""

    def __init__(self, log: MorTxnLog, txn_id: str):
        self.log = log
        self.id = txn_id
        self._enlisted: list[tuple[object, int]] = []

    def marker_payload(self) -> str:
        return json.dumps({"txn": self.id, "log": self.log.path})

    def enlist(self, table, version: int) -> None:
        self._enlisted.append((table, version))

    def commit(self, commit_timestamp=None) -> None:
        """The commit point: one CAS on the decision record flips
        every enlisted version on every table visible ATOMICALLY.
        The finalize loop after it (marker removal + timestamp stamp
        per version) is idempotent; a crash inside it leaves versions
        visible-by-decision, and each table's next construction
        replays the finalize (``_sweep_txn_markers``).

        The CAS runs while HOLDING every enlisted table's commit lock
        (acquired in sorted-path order — the global ordering plus
        single-lock maintenance holders makes this deadlock-free), so
        a concurrent ``merge_into``/``compact`` on any enlisted table
        either sees the whole transaction or none of it inside its own
        locked read→decide→publish window — without this, a merge
        classifying during the visibility flip could lose the
        transaction's rows (write skew). Readers need no lock: the
        decision file is the atomic point for them regardless."""
        import contextlib

        # dedup by PATH: two handles of one table must not acquire its
        # lock twice (reentrancy is per-instance, the second acquire
        # would self-deadlock)
        uniq = {os.path.abspath(t.path): t for t, _v in self._enlisted}
        with contextlib.ExitStack() as stack:
            for path in sorted(uniq):
                stack.enter_context(uniq[path]._locked())
            verdict = self.log._decide(self.id, "commit")
            if verdict != "commit":
                raise RuntimeError(
                    f"transaction {self.id} was aborted (a force_abort "
                    "won the decision race): nothing committed"
                )
            for table, version in self._enlisted:
                # route through the handle HOLDING the lock — a second
                # handle of the same path would re-acquire and
                # self-deadlock (reentrancy is per-instance)
                uniq[os.path.abspath(table.path)]._finalize_txn_version(
                    version, commit_timestamp
                )

    def abort(self) -> None:
        """Decide ``abort`` and sweep the enlisted dirs. Refuses if a
        commit already won the decision race."""
        verdict = self.log._decide(self.id, "abort")
        if verdict != "abort":
            raise RuntimeError(
                f"transaction {self.id} already committed: abort is "
                "too late — its versions are visible"
            )
        import shutil

        for table, version in self._enlisted:
            d = os.path.join(table._delta_root, f"mor_v={version}")
            if os.path.isdir(d):
                shutil.rmtree(d)
