"""Shared single-writer lock for evidence tools (r10 verdict item 6).

bench.py, tools/double_sweep.py, tools/check_correctness.py and
tools/plan_audit.py all drive gates through one shared spark-warehouse
and one set of cached scratch artifacts; running two of them
concurrently has produced corrupted evidence before (the r10 sweep's
spurious failure under parallel pytest, and a 34.7 s bench at 10.9%
steal). The lock makes the contention FAIL FAST with a clear message
instead of silently distorting medians or tripping gates.

Mechanics: an O_CREAT|O_EXCL lockfile in the system temp dir holding
the owner's pid + tool name. A lockfile whose pid is dead is stale and
is stolen (crashed runs must not wedge the next one). Set
``SPARK_GRAFT_NO_LOCK=1`` to bypass (e.g. when intentionally running a
tool against a different SPARK_GRAFT_SCRATCH / warehouse).
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile

LOCK_PATH = os.path.join(tempfile.gettempdir(), "spark_graft_evidence.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _acquire_cli(tool: str) -> None:
    """Process-lifetime acquire for CLI tools whose main() exits via
    sys.exit: take the lock now (or exit 3 with the holder's identity)
    and release it at interpreter exit."""
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
    while True:
        try:
            fd = os.open(LOCK_PATH, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                with open(LOCK_PATH) as fh:
                    owner = fh.read().strip()
                pid = int(owner.split()[0])
            except (OSError, ValueError, IndexError):
                owner, pid = "<unreadable>", -1
            if pid > 0 and _pid_alive(pid):
                print(
                    f"evidence lock held by {owner!r} ({LOCK_PATH}): "
                    f"refusing to run {tool} concurrently — shared "
                    "spark-warehouse contention corrupts evidence. "
                    "Wait for it, or set SPARK_GRAFT_NO_LOCK=1 if the "
                    "runs are genuinely isolated.",
                    file=sys.stderr,
                )
                sys.exit(3)
            # stale lock from a dead process: steal it
            with contextlib.suppress(OSError):
                os.unlink(LOCK_PATH)
    try:
        os.write(fd, f"{os.getpid()} {tool}".encode())
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(LOCK_PATH)
