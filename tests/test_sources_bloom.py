"""Write-time parquet bloom filters (sources/bloomfilters.py).

Pins, in dependency order: the writer stamps every file/row group; the
stamped filter has NO false negatives and a bounded false-positive rate;
the py4j hash-overload trap is refused rather than silently mis-probed;
and — the point of the feature — Spark's scan reads FEWER rows on a
point lookup over a bloom'd scattered layout than over the identical
plain layout, where min/max statistics cannot prune anything.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.sources.bloomfilters import (
    bloom_columns_per_file,
    bloom_probe_int64,
    scan_output_rows,
    write_with_bloom,
)
from tests.conftest import SF_SMOKE

#: keys live above 2^33 so probes always select parquet-mr's hash(long)
KEY_BASE = 1 << 33
N_ROWS = 20_000


@pytest.fixture(scope="module")
def bloom_layout(spark, tmp_path_factory):
    """A 4-file layout whose int64 keys are hash-scattered: every file
    spans the whole key range, so footer min/max statistics prune nothing
    and any scan reduction is attributable to the bloom filter alone."""
    base = str(tmp_path_factory.mktemp("bloomsrc"))
    df = spark.range(N_ROWS).selectExpr(
        f"id + {KEY_BASE} as k", "id % 100 as v"
    )
    paths = {
        "bloom": os.path.join(base, "bloom"),
        "plain": os.path.join(base, "plain"),
    }
    scattered = df.repartition(4, "v")  # k scatters across all 4 files
    write_with_bloom(scattered, paths["bloom"], {"k": N_ROWS})
    scattered.write.mode("overwrite").parquet(paths["plain"])
    return paths


def test_writer_stamps_every_file_only_on_requested_column(spark, bloom_layout):
    report = bloom_columns_per_file(spark, bloom_layout["bloom"])
    assert len(report) == 4
    for cols in report.values():
        assert "k" in cols
        assert "v" not in cols
    plain = bloom_columns_per_file(spark, bloom_layout["plain"])
    assert all(not cols for cols in plain.values())


def test_probe_has_no_false_negatives_and_bounded_fp(spark, bloom_layout):
    path = bloom_layout["bloom"]
    first = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )[0]
    fpath = os.path.join(path, first)
    # ground truth: which keys are actually in this file
    present = {
        r["k"]
        for r in spark.read.parquet(fpath).select("k").collect()
    }
    some_present = sorted(present)[:200]
    absent = [KEY_BASE + N_ROWS + 7 * i for i in range(1, 201)]
    verdicts = bloom_probe_int64(spark, fpath, "k", some_present + absent)
    # no false negatives — the hard guarantee row-group skipping rests on
    assert all(verdicts[k] for k in some_present)
    # bounded false positives (sized for ~1% fpp; allow generous slack)
    fp = sum(1 for k in absent if verdicts[k])
    assert fp <= 20, f"false-positive rate too high: {fp}/200"


def test_probe_refuses_32bit_values(spark, bloom_layout):
    path = bloom_layout["bloom"]
    first = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )[0]
    with pytest.raises(ValueError, match="32 bits"):
        bloom_probe_int64(
            spark, os.path.join(path, first), "k", [12345]
        )


def test_bloom_layout_skips_row_groups_plain_does_not(spark, bloom_layout):
    key = KEY_BASE + 17
    per_file = N_ROWS // 4

    def rows_read(path):
        q = (
            spark.read.parquet(path)
            .filter(F.col("k") == key)
            .agg(F.sum("v").alias("s"))
        )
        return scan_output_rows(q)

    bloom_rows = rows_read(bloom_layout["bloom"])
    plain_rows = rows_read(bloom_layout["plain"])
    # plain: statistics can't prune a scattered key — every row surfaces
    assert plain_rows == N_ROWS
    # bloom: only the one matching row group (plus rare fp groups) is read
    assert bloom_rows <= 2 * per_file, (bloom_rows, plain_rows)


def test_bloom_layout_lookup_matches_raw_filter(spark):
    from linqonsteroids_spark.queries.scale import bloom_layout_lookup

    out = {
        tuple(r)
        for r in bloom_layout_lookup(spark, SF_SMOKE).collect()
    }
    orders = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    key = orders.agg(F.min("o_orderkey")).collect()[0][0]
    expect = {
        tuple(r)
        for r in orders.filter(F.col("o_orderkey") == key)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("price_cents"),
        )
        .collect()
    }
    assert out == expect and out


def test_file_listing_walks_partitioned_layouts_and_refuses_empty(
    spark, tmp_path
):
    """r12 ADVICE: the footer verifier must see hive-partitioned data
    files (they live in key=value subdirectories) and must RAISE on a
    directory with no parquet at all — a promotion job iterating an
    empty report would pass vacuously, the silent degradation the
    verifier exists to prevent."""
    part = str(tmp_path / "part")
    spark.range(100).selectExpr("id as k", "id % 2 as p").write.partitionBy(
        "p"
    ).parquet(part)
    report = bloom_columns_per_file(spark, part)
    assert len(report) >= 2  # one+ data file per partition dir, all seen
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        bloom_columns_per_file(spark, empty)
