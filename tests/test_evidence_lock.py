"""The evidence lock covers pytest itself (r11 verdict item 3).

The r10 incident was a sweep corrupted under parallel pytest; the lock
wired into the CLI tools left pytest as the one unlocked writer. These
pins prove the closure from INSIDE a locked pytest session: while this
session holds the lock, a locked tool refuses (exit 3, naming pytest as
holder), a child pytest refuses, and the documented bypass still works.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _locked_session() -> bool:
    # this very session holds the lock unless the user bypassed
    return os.environ.get("SPARK_GRAFT_NO_LOCK") != "1"


def test_locked_tool_fails_fast_while_pytest_holds():
    if not _locked_session():
        import pytest

        pytest.skip("lock bypassed for this session")
    p = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); "
            "from tools.evidence_lock import _acquire_cli; "
            "_acquire_cli('bench')" % REPO,
        ],
        capture_output=True,
        text=True,
    )
    assert p.returncode == 3, (p.returncode, p.stderr[-400:])
    assert "pytest" in p.stderr


def test_child_pytest_fails_fast_while_parent_holds():
    if not _locked_session():
        import pytest

        pytest.skip("lock bypassed for this session")
    p = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_oracle_types.py",
            "--co",
            "-q",
            "--no-header",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert p.returncode == 3, (p.returncode, p.stderr[-400:])


def test_bypass_env_still_works():
    env = dict(os.environ, SPARK_GRAFT_NO_LOCK="1")
    p = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_oracle_types.py",
            "--co",
            "-q",
            "--no-header",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    assert p.returncode == 0, p.stderr[-400:]
