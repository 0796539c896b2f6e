"""Catalyst-extension JAR (SURVEY §4.3 stretch): the JVM twin of the
Python-side index rewrite, injected via ``spark.sql.extensions``.

The extension must be on the driver classpath at JVM startup, so the
check runs in a SUBPROCESS with its own SparkSession rather than the
shared session fixture. The subprocess asserts value parity, that the
physical scan reads the index table instead of the base path, that the
equality predicate becomes a directory-pruning PartitionFilter, and
that unregistered paths/columns are untouched (tools/catalyst_ext_smoke.py).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "linqonsteroids_spark", "ext", "linq-ext.jar")


def test_catalyst_index_substitution_end_to_end():
    if not os.path.exists(JAR):
        # the Scala compiler ships inside pyspark's jars, so the build is
        # hermetic — ~60s, once
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_catalyst_ext.sh")],
            check=True,
            capture_output=True,
            timeout=600,
        )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "catalyst_ext_smoke.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    for pin in (
        "PASS values",
        "PASS scans-index-not-base",
        "PASS partition-pruned",
        "PASS in-list-pruned",
        "PASS range-pruned",
        "PASS repository-bridge",
        "PASS cast-widened-partition-column",
        "PASS project-interposed-shapes",
        "PASS stale-registry-fallback",
        "PASS relation-load-cached",
        "PASS cache-epoch-invalidation",
        "PASS join-mv-substituted",
        "PASS join-mv-ambiguous-name-untouched",
        "PASS join-mv-no-false-rewrites",
        "PASS join-mv-repository-bridge",
        "PASS agg-mv-substituted",
        "PASS agg-mv-key-filter",
        "PASS agg-mv-sql-surface",
        "PASS agg-mv-having",
        "PASS agg-mv-no-false-rewrites",
        "PASS agg-mv-refresh-loop",
        "PASS mv-staleness-veto",
        "PASS no-false-rewrites",
    ):
        assert pin in proc.stdout, proc.stdout[-3000:]
