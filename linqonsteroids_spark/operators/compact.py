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

from pyspark.sql import SparkSession


def directory_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    files = [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        + glob.glob(os.path.join(path, "part-*"))
        if os.path.isfile(f) and not f.endswith(".crc")
    ]
    files = sorted(set(files))
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Rewrite ``src`` into ``dst`` as ceil(bytes/target) files.

    Shuffle-free (coalesce); values are preserved exactly — the caller
    gates that, tests pin it. Returns before/after stats so a
    maintenance job can log its effect."""
    n_before, bytes_before = directory_stats(src)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    df = spark.read.parquet(src)
    n_out = min(n_out, max(1, n_before))  # coalesce cannot split files
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    n_after, bytes_after = directory_stats(dst)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }
