"""Determinism under task retries (tools/retry_determinism_probe.py).

Retries are routine at cluster scale; a kernel whose output depends on
the attempt produces silent drift no local differential can see. The
probe needs its own process: spark.task.maxFailures is fixed at
SparkContext start, and the shared session's local[*] master allows
exactly one attempt.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_minhash_kernel_deterministic_under_task_retry():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "retry_determinism_probe.py"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PASS retry-deterministic" in proc.stdout, proc.stdout[-2000:]
