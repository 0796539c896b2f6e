"""The commit-protocol seam: every atomic-publish idiom in one module.

The lakehouse tier commits state transitions through exactly three
primitives, and until r13 each operator inlined its own POSIX
implementation (the r12 verdict's "object-store commit seam" gap —
``operators/wap.py``, ``operators/mor.py``,
``streaming/incremental.py``'s VersionedAggMV, ``sources/fileindex.py``,
``plans/result_cache.py``). They are factored here so a deployment
targeting an object store implements the contract ONCE.

Contract an object-store backend must provide:

- :func:`atomic_replace` — last-writer-wins atomic publish of a single
  object (POSIX ``os.replace``). Object-store equivalent: a plain PUT —
  single-key PUTs are atomic on S3/GCS/ABFS; readers see old or new
  bytes, never a torn mix. For DIRECTORY arguments (MOR's staged→base
  swap) the equivalent is a manifest pointer flip: publish a new
  manifest naming the staged files, which is again a single-key PUT.
- :func:`put_if_absent` — atomic compare-and-create: publish iff the
  key does not exist, losing racers told apart from winners. POSIX:
  hard-link creation (EEXIST on loss). Object store: conditional PUT
  with ``If-None-Match: *`` (S3 since 2024, GCS ``ifGenerationMatch=0``,
  ABFS ``If-None-Match``).
- :func:`commit_lock` — a short critical section serializing
  check-then-swap pairs (WAP's ``expect=`` CAS). POSIX: ``flock``.
  Object store: there is no lock — implement the CAS directly with a
  conditional PUT on a generation/ETag (``If-Match``), or delegate to a
  log store (DynamoDB-style) as Delta does on S3.

Directory variants (:func:`publish_dir_if_absent`) extend
``put_if_absent`` to Spark-written directories: stage under a private
name, then atomically claim the final name — ``os.rename`` without
clobber fails with ENOTEMPTY/EEXIST when a complete entry already
exists, which IS the lost-race signal.
"""

from __future__ import annotations

import contextlib
import errno
import os


def atomic_replace(tmp: str, final: str) -> None:
    """Atomically publish ``tmp`` (file or directory) at ``final``,
    replacing what was there. Readers observe old-or-new, never torn."""
    os.replace(tmp, final)


def put_if_absent(path: str, payload: str) -> bool:
    """Atomically publish ``payload`` at ``path`` iff nothing exists
    there yet; returns False (existing object untouched) on a lost race.

    POSIX hard-link creation fails with EEXIST if the target exists,
    making the publish a single atomic compare-and-create. The temp
    name is unique PER CALL (pid alone is not enough: two threads in
    one process share it, so a racing thread could overwrite the temp
    between another thread's write and link — the winner would then
    publish the LOSER's payload; caught by the seam's own thread-race
    test on a loaded machine)."""
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


def publish_dir_if_absent(staged_dir: str, final_dir: str) -> bool:
    """Atomically claim ``final_dir`` with ``staged_dir``'s contents iff
    no entry exists; on a lost race the staged dir is removed and the
    winner's complete entry is left untouched (returns False).

    ``os.rename`` (no-clobber, unlike ``os.replace``) fails with
    ENOTEMPTY or EEXIST when the destination exists — the atomic
    decider between winner and loser."""
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
def commit_lock(lock_path: str):
    """Exclusive critical section for check-then-swap commit sequences
    (held only for metadata operations — never while writing data)."""
    import fcntl

    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        yield
