"""Shared single-writer lock for evidence tools (r10 verdict item 6).

bench.py, tools/double_sweep.py, tools/check_correctness.py and
tools/plan_audit.py all drive gates through one shared spark-warehouse
and one set of cached scratch artifacts; running two of them
concurrently has produced corrupted evidence before (the r10 sweep's
spurious failure under parallel pytest, and a 34.7 s bench at 10.9%
steal). The lock makes the contention FAIL FAST with a clear message
instead of silently distorting medians or tripping gates.

Mechanics: ``flock(LOCK_EX | LOCK_NB)`` on a well-known file in the
system temp dir. The kernel releases the lock when the holder exits —
crashed runs cannot wedge the next one, and there is no
read-pid/unlink steal window for two waiters to race through (the
failure mode of lockfile-existence schemes). The file's content names
the current holder for the error message only. Set
``SPARK_GRAFT_NO_LOCK=1`` to bypass (e.g. when intentionally running a
tool against a different SPARK_GRAFT_SCRATCH / warehouse).
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import tempfile

LOCK_PATH = os.path.join(tempfile.gettempdir(), "spark_graft_evidence.lock")


def _acquire_cli(tool: str) -> None:
    """Process-lifetime acquire for CLI tools whose main() exits via
    sys.exit: take the lock now (or exit 3 with the holder's identity)
    and let the kernel release it at process exit."""
    import atexit

    cm = evidence_lock(tool)
    cm.__enter__()
    atexit.register(cm.__exit__, None, None, None)


@contextlib.contextmanager
def evidence_lock(tool: str):
    """Hold the evidence lock for the duration of a tool run, or exit(3)
    with a message naming the current holder."""
    if os.environ.get("SPARK_GRAFT_NO_LOCK") == "1":
        yield
        return
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        try:
            with open(LOCK_PATH) as fh:
                owner = fh.read().strip() or "<unknown>"
        except OSError:
            owner = "<unreadable>"
        os.close(fd)
        print(
            f"evidence lock held by {owner!r} ({LOCK_PATH}): refusing to "
            f"run {tool} concurrently — shared spark-warehouse contention "
            "corrupts evidence. Wait for it, or set SPARK_GRAFT_NO_LOCK=1 "
            "if the runs are genuinely isolated.",
            file=sys.stderr,
        )
        sys.exit(3)
    try:
        os.ftruncate(fd, 0)
        os.write(fd, f"{os.getpid()} {tool}".encode())
        os.fsync(fd)
        yield
    finally:
        # content is advisory; the flock itself dies with the fd/process
        with contextlib.suppress(OSError):
            os.ftruncate(fd, 0)
        os.close(fd)
