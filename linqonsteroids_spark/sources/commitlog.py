"""The commit-protocol seam: every atomic-publish idiom in one module.

The lakehouse tier commits state transitions through exactly four
primitives, and until r13 each operator inlined its own POSIX
implementation (the r12 verdict's "object-store commit seam" gap —
``operators/wap.py``, ``operators/mor.py``,
``streaming/incremental.py``'s VersionedAggMV, ``sources/fileindex.py``,
``plans/result_cache.py``). They are factored here so a deployment
targeting an object store implements the contract ONCE.

Contract a backend must provide (:class:`PosixBackend` is the default;
:class:`ConditionalPutBackend` is an in-tree second implementation that
exercises the OBJECT-STORE side of the contract — generation-checked
conditional PUTs, no rename/hard-link/flock in its decision logic — so
the contract suite in ``tests/test_commitlog.py`` runs against both and
a real S3/GCS/ABFS port has an executable conformance target):

- ``atomic_replace`` — last-writer-wins atomic publish of a single
  object (POSIX ``os.replace``). Object-store equivalent: a plain PUT —
  single-key PUTs are atomic on S3/GCS/ABFS; readers see old or new
  bytes, never a torn mix. For DIRECTORY arguments (MOR's staged→base
  swap) the equivalent is a manifest pointer flip: publish a new
  manifest naming the staged files, which is again a single-key PUT.
- ``put_if_absent`` — atomic compare-and-create: publish iff the
  key does not exist, losing racers told apart from winners. POSIX:
  hard-link creation (EEXIST on loss). Object store: conditional PUT
  with ``If-None-Match: *`` (S3 since 2024, GCS ``ifGenerationMatch=0``,
  ABFS ``If-None-Match``).
- ``commit_lock`` — a short critical section serializing
  check-then-swap pairs (WAP's ``expect=`` CAS). POSIX: ``flock``.
  Object store: there is no lock — implement the CAS directly with a
  conditional PUT on a generation/ETag (``If-Match``), acquire a lease
  key via conditional-create (what :class:`ConditionalPutBackend`
  does), or delegate to a log store (DynamoDB-style) as Delta does on
  S3.
- ``publish_dir_if_absent`` — ``put_if_absent`` extended to
  Spark-written directories: stage under a private name, then
  atomically claim the final name. POSIX: ``os.rename`` without
  clobber fails with ENOTEMPTY/EEXIST when a complete entry already
  exists, which IS the lost-race signal. Object store: conditional PUT
  of the directory's manifest key.

Operators call the MODULE-LEVEL functions below, which delegate to the
active backend — :func:`use_backend` swaps it for a scope, which is how
the conformance tests drive WAP/MOR/ResultCache through the mock.
"""

from __future__ import annotations

import contextlib
import errno
import os
import threading


class PosixBackend:
    """The default backend: POSIX rename/link/flock atomicity."""

    def atomic_replace(self, tmp: str, final: str) -> None:
        os.replace(tmp, final)

    def put_if_absent(self, path: str, payload: str) -> bool:
        # POSIX hard-link creation fails with EEXIST if the target
        # exists, making the publish a single atomic compare-and-create.
        # The temp name is unique PER CALL (pid alone is not enough: two
        # threads in one process share it, so a racing thread could
        # overwrite the temp between another thread's write and link —
        # the winner would then publish the LOSER's payload; caught by
        # the seam's own thread-race test on a loaded machine).
        import uuid

        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def publish_dir_if_absent(self, staged_dir: str, final_dir: str) -> bool:
        # os.rename (no-clobber, unlike os.replace) fails with ENOTEMPTY
        # or EEXIST when the destination exists — the atomic decider
        # between winner and loser.
        try:
            os.rename(staged_dir, final_dir)
            return True
        except OSError as e:
            if e.errno not in (errno.ENOTEMPTY, errno.EEXIST, errno.ENOTDIR):
                raise
            import shutil

            shutil.rmtree(staged_dir, ignore_errors=True)
            return False

    @contextlib.contextmanager
    def commit_lock(self, lock_path: str):
        import fcntl

        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            yield


class ConditionalPutBackend:
    """Object-store-semantics backend: every commit DECISION is a
    generation-checked conditional operation under the store's internal
    single-key atomicity — no rename-as-decider, no hard links, no
    flock. Local files are only the byte transport (Spark still reads
    real paths); ``self._mutex`` stands in for the store's internal
    atomicity guarantee on a single conditional PUT, and
    ``self.generations`` for the per-key generation/ETag the store
    maintains.

    Race simulation: ``race_hook`` (if set) fires INSIDE the window
    between a conditional operation's check and its publish, letting a
    test inject a competing PUT exactly where an implementation that
    "checked then wrote" without the store's conditional primitive
    would corrupt state — the generation re-check after the hook is
    what a real ``If-None-Match``/``ifGenerationMatch=0`` precondition
    does server-side.
    """

    def __init__(self, lease_ttl_s: float | None = None):
        self._mutex = threading.Lock()
        self.generations: dict[str, int] = {}
        self.race_hook = None  # callable fired between check and publish
        self.stats = {
            "conditional_losses": 0,
            "lease_retries": 0,
            "lease_takeovers": 0,
        }
        #: lease expiry: None = leases never expire (a crashed holder
        #: deadlocks the lock — the POSIX-flock behavior); a float
        #: enables takeover of expired leases with FENCING (below)
        self.lease_ttl_s = lease_ttl_s
        #: per-lock monotonic fencing counter — bumps on every
        #: acquisition and NEVER resets, so a taken-over holder's
        #: token is permanently stale
        self._fences: dict[str, int] = {}

    # -- internals ------------------------------------------------------------
    def _exists(self, key: str) -> bool:
        return key in self.generations or os.path.exists(key)

    def _bump(self, key: str) -> None:
        self.generations[key] = self.generations.get(key, 0) + 1

    # -- contract -------------------------------------------------------------
    def atomic_replace(self, tmp: str, final: str) -> None:
        # a plain PUT: unconditional last-writer-wins, atomic per key.
        # For directories this models the manifest pointer flip (the
        # new file set becomes visible in one key update).
        import shutil

        with self._mutex:
            if os.path.isdir(tmp):
                if os.path.isdir(final):
                    shutil.rmtree(final)
                os.replace(tmp, final)  # byte transport only — the
                # DECISION (no precondition) already happened above
            else:
                os.replace(tmp, final)
            self._bump(final)

    def put_if_absent(self, path: str, payload: str) -> bool:
        # conditional PUT with If-None-Match: * — the precondition and
        # the write are one atomic server-side step. The race_hook
        # fires before the atomic step to let tests stage a competitor;
        # the step itself then observes the competitor's key and loses
        # cleanly, exactly as the store's precondition would.
        if self.race_hook is not None:
            self.race_hook("put_if_absent", path)
        with self._mutex:
            if self._exists(path):
                self.stats["conditional_losses"] += 1
                return False
            with open(path, "w") as f:
                f.write(payload)
            self._bump(path)
            return True

    def publish_dir_if_absent(self, staged_dir: str, final_dir: str) -> bool:
        import shutil

        if self.race_hook is not None:
            self.race_hook("publish_dir_if_absent", final_dir)
        with self._mutex:
            if self._exists(final_dir):
                self.stats["conditional_losses"] += 1
                shutil.rmtree(staged_dir, ignore_errors=True)
                return False
            os.replace(staged_dir, final_dir)  # byte transport
            self._bump(final_dir)
            return True

    def _try_takeover(self, lease: str) -> bool:
        """Reclaim an EXPIRED lease (one atomic conditional step, like
        GCS's ifGenerationMatch delete): returns True when the caller
        should retry its conditional create. A live lease is never
        touched."""
        import json
        import time

        with self._mutex:
            try:
                with open(lease) as f:
                    payload = json.loads(f.read())
            except (FileNotFoundError, ValueError):
                return True  # released (or torn) since we lost — retry
            expires = payload.get("expires")
            if expires is None or time.time() < expires:
                return False  # live holder — keep waiting
            os.unlink(lease)
            self.generations.pop(lease, None)
            self.stats["lease_takeovers"] += 1
            return True

    @contextlib.contextmanager
    def commit_lock(self, lock_path: str):
        # no flock on an object store: acquire a LEASE key via
        # conditional-create, retry on loss, delete to release. With
        # lease_ttl_s set, a CRASHED holder's lease expires and is
        # taken over — and every acquisition gets a monotonically
        # increasing FENCING token (yielded to the holder), so a
        # zombie that wakes up after its lease was reclaimed carries a
        # permanently stale token and `fenced_put` refuses its writes:
        # expiry alone is not safe (the zombie may still be mid-write);
        # the fence is what makes takeover correct.
        import json
        import time
        import uuid

        lease = lock_path + ".lease"
        me = uuid.uuid4().hex
        while True:
            expires = (
                time.time() + self.lease_ttl_s
                if self.lease_ttl_s is not None
                else None
            )
            if self.put_if_absent(
                lease, json.dumps({"owner": me, "expires": expires})
            ):
                break
            if self.lease_ttl_s is not None and self._try_takeover(lease):
                continue
            self.stats["lease_retries"] += 1
            time.sleep(0.005)
        with self._mutex:
            fence = self._fences.get(lock_path, 0) + 1
            self._fences[lock_path] = fence
        try:
            yield fence
        finally:
            with self._mutex:
                # release only OUR lease: a post-takeover zombie's
                # release must not destroy the new holder's lease
                try:
                    with open(lease) as f:
                        if json.loads(f.read()).get("owner") == me:
                            os.unlink(lease)
                            self.generations.pop(lease, None)
                except (FileNotFoundError, ValueError):
                    pass

    def fenced_put(
        self, path: str, payload: str, lock_path: str, fence: int
    ) -> bool:
        """Publish ``payload`` iff ``fence`` is the lock's CURRENT
        fencing token — the write-side half of lease takeover (what a
        production port implements as an If-Match precondition keyed on
        the fence, or a log-store conditional write). A zombie holder
        whose lease was reclaimed carries a stale token and loses here
        instead of corrupting the new holder's state."""
        with self._mutex:
            if self._fences.get(lock_path) != fence:
                self.stats["conditional_losses"] += 1
                return False
            with open(path, "w") as f:
                f.write(payload)
            self._bump(path)
            return True


_BACKEND = PosixBackend()


@contextlib.contextmanager
def use_backend(backend):
    """Swap the active backend for a scope (conformance tests drive
    WAP/MOR/ResultCache through :class:`ConditionalPutBackend` this
    way). Not for concurrent use from multiple scopes."""
    global _BACKEND
    prev = _BACKEND
    _BACKEND = backend
    try:
        yield backend
    finally:
        _BACKEND = prev


def atomic_replace(tmp: str, final: str) -> None:
    """Atomically publish ``tmp`` (file or directory) at ``final``,
    replacing what was there. Readers observe old-or-new, never torn."""
    _BACKEND.atomic_replace(tmp, final)


def put_if_absent(path: str, payload: str) -> bool:
    """Atomically publish ``payload`` at ``path`` iff nothing exists
    there yet; returns False (existing object untouched) on a lost race."""
    return _BACKEND.put_if_absent(path, payload)


def publish_dir_if_absent(staged_dir: str, final_dir: str) -> bool:
    """Atomically claim ``final_dir`` with ``staged_dir``'s contents iff
    no entry exists; on a lost race the staged dir is removed and the
    winner's complete entry is left untouched (returns False)."""
    return _BACKEND.publish_dir_if_absent(staged_dir, final_dir)


def commit_lock(lock_path: str):
    """Exclusive critical section for check-then-swap commit sequences.
    Held for metadata operations and for maintenance decision windows
    (compaction, MERGE classification) — never across bulk data writes
    on the hot append path. Yields the backend's fencing token where
    one exists (:class:`ConditionalPutBackend`), else ``None``."""
    return _BACKEND.commit_lock(lock_path)


def fenced_put(path: str, payload: str, lock_path: str, fence) -> bool:
    """Publish ``payload`` at ``path`` iff ``fence`` is still the
    current fencing token for ``lock_path`` — False means the caller is
    a zombie whose lease was taken over and MUST abort its commit. On a
    backend without fencing (POSIX flock cannot be lost while held) or
    with ``fence=None`` this degrades to a plain atomic publish."""
    if fence is not None and hasattr(_BACKEND, "fenced_put"):
        return _BACKEND.fenced_put(path, payload, lock_path, fence)
    import uuid

    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    _BACKEND.atomic_replace(tmp, path)
    return True
