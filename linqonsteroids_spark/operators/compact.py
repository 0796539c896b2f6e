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


def _recover_leaf(parent: str, base: str) -> bool:
    """Finish (or roll back) an interrupted swap for ``parent/base``.

    The swap in :func:`compact_partitions_in_place` is two renames; a
    crash between them leaves the leaf absent with its only copies in
    the hidden ``.base.old`` / ``.base.compacting`` siblings. Recovery
    on entry makes the window harmless: if the staged replacement exists
    it is complete (it was fully written before the first rename), so
    finish the swap with it; otherwise restore the retired original.
    Returns True when a recovery happened."""
    leaf = os.path.join(parent, base)
    staging = os.path.join(parent, f".{base}.compacting")
    retired = os.path.join(parent, f".{base}.old")
    if os.path.isdir(leaf):
        return False
    if os.path.isdir(staging):
        os.rename(staging, leaf)
        if os.path.isdir(retired):
            shutil.rmtree(retired)
        return True
    if os.path.isdir(retired):
        os.rename(retired, leaf)
        return True
    return False


def _recover_interrupted(table_path: str, partitions: list[str] | None) -> None:
    """Entry-point recovery sweep: restore any leaf stranded by a crash
    mid-swap, so listing/selection see the full layout again. Scans only
    the top level plus the parents of explicitly selected leaves — cost
    stays proportional to the partitions touched, never the table."""
    parents = {table_path}
    for p in partitions or ():
        parents.add(os.path.dirname(os.path.join(table_path, p)))
    for parent in parents:
        try:
            names = os.listdir(parent)
        except OSError:
            continue
        for n in names:
            for suffix in (".compacting", ".old"):
                if n.startswith(".") and n.endswith(suffix):
                    _recover_leaf(parent, n[1 : -len(suffix)])


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
    ``.leaf.old``, staging → leaf). A reader racing the pass on a plain
    filesystem sees the old layout, the new layout, or — in the instant
    between the two renames — the leaf briefly absent; each rename is
    atomic, so it never sees a half-written leaf. A crash inside that
    window is repaired on the NEXT entry: the recovery sweep restores a
    stranded leaf from its hidden siblings (finishing the swap when the
    staged replacement exists, rolling back otherwise) before any
    listing, selection, or debris reclaim happens. Coordinating
    concurrent WRITERS is a table-format commit protocol's job (see
    sources/pydatasource.py's manifest writer), not a directory-layout
    pass's.
    """
    _recover_interrupted(table_path, partitions)
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
