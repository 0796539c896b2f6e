"""Small-file compaction — the table-maintenance operator every
long-lived pipeline runs.

Incremental writers (streaming sinks, per-batch merges, dynamic
partition overwrites) accumulate many small files; at scale the
listing/open overhead and lost row-group locality dominate scan cost
long before data size does (the measured partitionBy trap in this
repo's own perf notes was exactly this leak). Compaction bin-packs a
directory into ~target-size files.

Scale discipline: compaction must NOT shuffle — ``coalesce`` merges
input partitions without an exchange (each output task concatenates
whole input splits), so a 100 TB compaction moves every byte exactly
once, reader-side. ``repartition`` would add a full shuffle of the
same bytes for marginally better size balance; that trade is wrong for
maintenance jobs and this module deliberately doesn't offer it.
Output-count sizing uses the actual on-disk bytes (post-compression),
not row estimates.
"""

from __future__ import annotations

import glob
import math
import os
import shutil

from pyspark.sql import SparkSession


def directory_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory, RECURSIVE —
    a hive-partitioned layout keeps its data files in key=value
    subdirectories, and sizing from the top level alone would read the
    whole dataset as zero bytes."""
    files = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".crc") or n.startswith(("_", ".")):
                continue
            if n.endswith(".parquet") or n.startswith("part-"):
                files.append(os.path.join(root, n))
    files = sorted(set(files))
    return len(files), sum(os.path.getsize(f) for f in files)


def _partition_dirs(path: str) -> list[str]:
    """Immediate ``key=value`` subdirectories (hive partition layout)."""
    try:
        return [
            d
            for d in os.listdir(path)
            if "=" in d and os.path.isdir(os.path.join(path, d))
        ]
    except OSError:
        return []


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Rewrite the FLAT parquet directory ``src`` into ``dst`` as
    ``min(ceil(bytes/target), read-partitions)`` files.

    Shuffle-free (coalesce); values are preserved exactly — the caller
    gates that, tests pin it. Returns before/after stats so a
    maintenance job can log its effect.

    ``coalesce`` can only MERGE read partitions, so the bin count is
    bounded by how Spark splits the scan. To make that bound
    environment-independent (not a function of ``defaultParallelism``
    on the machine that happens to run maintenance), the read is
    planned and executed under a pinned ``maxPartitionBytes =
    target_bytes`` / ``openCostInBytes = 0``: ``maxSplitBytes =
    min(maxPartitionBytes, max(openCost, bytes/cores))`` then never
    exceeds the target, so the scan yields at least ceil(bytes/target)
    partitions even on a 1-core host. ``n_out`` is still capped by the
    actual scan partition count as a belt-and-braces guard.

    Hive-partitioned inputs are REFUSED rather than silently flattened:
    a blind read-and-coalesce would drop the partition columns from the
    layout (and a whole-dataset coalesce would defeat per-partition
    maintenance anyway). Compact each leaf partition directory — where
    the small files actually accumulate — with its own call."""
    from linqonsteroids_spark.session import conf_guard

    parts = _partition_dirs(src)
    if parts:
        raise ValueError(
            f"{src} is hive-partitioned ({parts[0]}, ...): compact each "
            "leaf partition directory separately — a flat rewrite would "
            "silently drop the partition layout"
        )
    n_before, bytes_before = directory_stats(src)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    with conf_guard(
        spark, "spark.sql.files.maxPartitionBytes", str(target_bytes)
    ), conf_guard(spark, "spark.sql.files.openCostInBytes", "0"):
        df = spark.read.parquet(src)
        # coalesce cannot split: cap by input files and by what the scan
        # actually planned (empty under the pinned confs only if the
        # directory itself is empty)
        n_out = min(n_out, max(1, n_before))
        n_out = min(n_out, max(1, df.rdd.getNumPartitions()))
        df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    n_after, bytes_after = directory_stats(dst)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }


def compact_partitions_in_place(
    spark: SparkSession,
    table_path: str,
    partitions: list[str] | None = None,
    target_bytes: int = 128 << 20,
) -> dict[str, dict]:
    """Per-partition compaction of a hive-partitioned parquet table, IN
    PLACE — the ``OPTIMIZE ... WHERE`` maintenance shape, and the tool
    ``compact_parquet``'s refusal of partitioned inputs points at.

    Each selected ``key=value`` leaf bin-packs independently through
    ``compact_parquet`` into a hidden staging sibling, then replaces the
    leaf by rename swap. The partition column never moves — it lives in
    the directory NAME, not the files. Unselected partitions are not
    read, not rewritten, not listed below the top level: at 100 TB the
    maintenance cost is proportional to the partitions you touch (the
    streaming sink's last hour), never to the table.

    ``partitions`` selects leaves by directory name (``None`` = all);
    unknown names are an error, not a skip — a maintenance job that
    silently no-ops on a typo leaves the small-file leak in place with
    a green log. Multi-level layouts: a leaf that itself contains
    ``key=value`` directories is refused by ``compact_parquet``; pass
    the deeper leaves explicitly (``"a=1/b=2"`` works — selection is a
    relative path).

    Single-writer discipline: the swap is two renames (leaf →
    ``.leaf.old``, staging → leaf), so a reader racing the pass on a
    plain filesystem sees either the old or the new layout, never a
    half-written one (dot-prefixed siblings are hidden from listing).
    Coordinating concurrent WRITERS is a table-format commit protocol's
    job (see sources/pydatasource.py's manifest writer), not a
    directory-layout pass's. Debris from an interrupted earlier pass is
    reclaimed on entry.
    """
    leaves = set(_partition_dirs(table_path))
    if not leaves:
        raise ValueError(
            f"{table_path} has no key=value partition directories: use "
            "compact_parquet for flat layouts"
        )
    if partitions is None:
        selected = sorted(leaves)
    else:
        known = {
            p for p in partitions
            if os.path.isdir(os.path.join(table_path, p)) and "=" in p
        }
        missing = sorted(set(partitions) - known)
        if missing:
            raise ValueError(f"partitions not in layout: {missing}")
        selected = sorted(known)
    report: dict[str, dict] = {}
    for leaf in selected:
        leaf_dir = os.path.join(table_path, leaf)
        parent = os.path.dirname(leaf_dir)
        base = os.path.basename(leaf_dir)
        staging = os.path.join(parent, f".{base}.compacting")
        retired = os.path.join(parent, f".{base}.old")
        for debris in (staging, retired):
            if os.path.exists(debris):
                shutil.rmtree(debris)
        report[leaf] = compact_parquet(spark, leaf_dir, staging, target_bytes)
        os.rename(leaf_dir, retired)
        os.rename(staging, leaf_dir)
        shutil.rmtree(retired)
    return report
