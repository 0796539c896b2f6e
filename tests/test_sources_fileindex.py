"""sources/fileindex.py: external file-stats manifest pruning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.sources.fileindex import (
    prune_files,
    read_pruned,
    write_with_stats,
)


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fidx") / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    write_with_stats(df, path, ["k"], n_files=8)
    return path


def test_manifest_covers_every_file_and_prunes_disjoint_ranges(
    spark, layout
):
    stats = json.load(open(os.path.join(layout, "_FILE_STATS.json")))
    parts = [
        f
        for f in os.listdir(layout)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert set(stats["files"]) == set(parts)
    # range clustering on k: a narrow box keeps few files, never zero
    keep, total = prune_files(layout, "k", 10, 20)
    assert total == len(parts)
    assert 1 <= len(keep) < total / 2
    # the kept set must be exactly the files whose true span intersects
    truth = {
        os.path.join(layout, f)
        for f, cols in stats["files"].items()
        if not (float(cols["k"][1]) < 10 or float(cols["k"][0]) > 20)
    }
    assert set(keep) == truth


def test_pruned_read_equals_full_scan_filter(spark, layout):
    df, n_read, n_total = read_pruned(spark, layout, "k", 100, 333)
    full = (
        spark.read.parquet(layout)
        .filter(F.col("k").between(100, 333))
        .collect()
    )
    assert n_read < n_total
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, full))


def test_empty_selection_returns_typed_empty_frame(spark, layout):
    df, n_read, n_total = read_pruned(spark, layout, "k", 10_000, 20_000)
    assert n_read == 0 and n_total > 0
    assert df.count() == 0
    assert set(df.columns) == {"k", "g"}


def test_false_positive_manifest_entries_cannot_corrupt_results(
    spark, layout, tmp_path
):
    """The manifest only EXCLUDES files — a lying entry that is too WIDE
    admits an extra file whose rows the re-applied predicate then drops,
    so results stay exact (correctness never rests on the sidecar)."""
    import shutil

    copy = str(tmp_path / "wide")
    shutil.copytree(layout, copy)
    p = os.path.join(copy, "_FILE_STATS.json")
    stats = json.load(open(p))
    for cols in stats["files"].values():
        cols["k"] = [0, 10_000]  # every file claims the full span
    json.dump(stats, open(p, "w"))
    df, n_read, n_total = read_pruned(spark, copy, "k", 100, 120)
    assert n_read == n_total  # pruning lost, nothing skipped
    got = sorted(r[0] for r in df.select("k").collect())
    assert got == list(range(100, 121))  # ...but results exact


def test_unknown_stat_column_is_refused(layout):
    with pytest.raises(KeyError, match="no stats"):
        prune_files(layout, "g2", 0, 1)


def test_null_stats_never_exclude_a_file(layout, tmp_path):
    """A file whose (min, max) is unknown cannot be pruned — the
    manifest proves absence, never presence."""
    import shutil

    copy = str(tmp_path / "nullstats")
    shutil.copytree(layout, copy)
    p = os.path.join(copy, "_FILE_STATS.json")
    stats = json.load(open(p))
    victim = sorted(stats["files"])[0]
    stats["files"][victim]["k"] = [None, None]
    json.dump(stats, open(p, "w"))
    keep, total = prune_files(copy, "k", 10, 20)
    assert os.path.join(copy, victim) in keep


def test_date_stat_column_prunes_natively_end_to_end(spark, tmp_path):
    """r12 verdict item 6: a date-typed stat column must work end-to-end
    — stats compare in the column's native string/ISO domain (ISO text
    order == chronological order), never via float() coercion which used
    to raise ValueError at plan time."""
    import datetime

    path = str(tmp_path / "dated")
    df = spark.range(365).select(
        F.date_add(F.lit("2024-01-01"), F.col("id").cast("int")).alias("d"),
        F.col("id").alias("v"),
    )
    write_with_stats(df, path, ["d"], n_files=6)
    lo, hi = datetime.date(2024, 3, 1), datetime.date(2024, 3, 31)
    from linqonsteroids_spark.sources.fileindex import read_pruned as rp

    got, n_read, n_total = rp(spark, path, "d", lo, hi)
    assert 1 <= n_read < n_total
    full = sorted(
        r[0]
        for r in spark.read.parquet(path)
        .filter(F.col("d").between(F.lit(str(lo)), F.lit(str(hi))))
        .select("v")
        .collect()
    )
    assert sorted(r["v"] for r in got.collect()) == full


def test_non_orderable_stat_column_fails_loudly_at_write(spark, tmp_path):
    """The other side of the r12 pin: a stat column with no meaningful
    range (array type) is refused at WRITE time, not with a confusing
    ValueError when someone probes the manifest months later."""
    df = spark.range(10).select(
        F.col("id").alias("k"), F.array(F.col("id")).alias("a")
    )
    with pytest.raises(TypeError, match="not range-prunable"):
        write_with_stats(df, str(tmp_path / "bad"), ["a"])


def test_bigint_point_pruning_is_exact_above_2_53(spark, tmp_path):
    """r14 advice: point pruning used to normalize numeric stats through
    float(), so bigint keys above 2^53 could alias across a file
    boundary and wrongly EXCLUDE the file that truly holds the probed
    key — and unlike range scans, lookup() reads ONLY the kept files,
    silently dropping the row. Ints must compare as ints."""
    from linqonsteroids_spark.sources.fileindex import (
        prune_files_for_points,
    )

    base = 2**53  # above here, float(n) == float(n + 1)
    path = str(tmp_path / "big")
    df = spark.range(8).select(
        (F.lit(base) + F.col("id")).alias("k"), F.col("id").alias("v")
    )
    write_with_stats(df, path, ["k"], n_files=4)
    # every key must resolve to a non-empty kept set containing it
    for probe in range(base, base + 8):
        keep, total = prune_files_for_points(path, "k", [probe])
        assert total == 4
        got = (
            spark.read.parquet(*keep)
            .filter(F.col("k") == probe)
            .count()
        )
        assert got == 1, f"key {probe} lost by pruning"
    # and pruning still prunes: one key should not keep all files
    keep, _ = prune_files_for_points(path, "k", [base])
    assert len(keep) < 4
