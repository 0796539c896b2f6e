"""Determinism-under-task-retry probe (run in its own process).

At 1000-executor scale task retries are routine, not exceptional; a
kernel whose output depends on the attempt (hidden per-process state,
attempt-seeded randomness, partial side effects) produces silent drift
the oracle differential can never see locally. This probe runs a real
Arrow kernel (the MinHash signature stage — the engine's most
state-tempting kernel: per-partition codebook caches, accumulators)
under a master that ALLOWS retries (``local[4, 3]``), injects exactly
one failure into the first attempt of one partition UPSTREAM of the
kernel, and asserts the post-retry output is bit-identical to the
no-failure run.

Needs its own process because spark.task.maxFailures is fixed at
SparkContext start (the shared test session runs local[*] = 1 attempt).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4, 3]")
        .appName("retry_probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.dedup.minhash import minhash_signatures

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )

    clean = sorted(tuple(r) for r in minhash_signatures(docs).collect())

    def fail_once(batches):
        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected failure: attempt 0, partition 0")
        for pdf in batches:
            yield pdf

    flaky_docs = docs.repartition(4).mapInPandas(
        fail_once, schema="doc_id long, text string"
    )
    retried = sorted(
        tuple(r) for r in minhash_signatures(flaky_docs).collect()
    )
    assert retried == clean, (
        f"retry changed the output: {len(retried)} vs {len(clean)} rows"
    )
    print(f"PASS retry-deterministic ({len(clean)} signatures identical)")
    spark.stop()


if __name__ == "__main__":
    main()
