"""Round-10 modern-SQL-surface gates (queries/modern.py): plan-shape
pins for the properties the oracle differential can't see — analyzer
sugar must cost nothing, SQL UDFs must inline, the lateral API must
decorrelate, and TVF parameters must reach the scan as pushed filters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lateral_api_decorrelates_to_window_group_limit(spark):
    # the correlated limit-1 subquery must become a ranked join — a
    # WindowGroupLimit (with a map-side partial pass before the
    # exchange) feeding a plain LeftOuter hash join — never a
    # per-customer rescan (BNLJ/CartesianProduct)
    from linqonsteroids_spark.queries.modern import lateral_api_latest_order

    plan = _plan(lateral_api_latest_order(spark, SF))
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "LeftOuter" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sql_udf_inlines_into_the_plan(spark):
    # the SQL-defined function is analyzer-inlined: the physical plan
    # has no Python eval node of any tier, and the CASE body lands
    # directly in the aggregate/scan stage (full codegen through it)
    from linqonsteroids_spark.queries.modern import sql_udf_price_tiers

    plan = _plan(sql_udf_price_tiers(spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, plan[:2000]
    assert "CASE WHEN" in plan, plan[:2000]


def test_sql_table_udf_parameter_reaches_the_scan(spark):
    # the TVF body inlines with the argument bound as a literal, so the
    # predicate must appear in the parquet scan's PushedFilters
    from linqonsteroids_spark.queries.modern import sql_table_udf_big_orders

    plan = _plan(sql_table_udf_big_orders(spark, SF))
    assert "GreaterThan(o_totalprice,150000" in plan, plan[:2500]


def test_groupby_all_plans_like_the_explicit_form(spark):
    # GROUP BY ALL / ORDER BY ALL are pure resolution sugar: grouping
    # keys resolved from the select list, ordering from the output row,
    # and the ORDER BY ALL + LIMIT collapses to TakeOrderedAndProject —
    # the same physical strategy the explicit query gets
    from linqonsteroids_spark.queries.modern import groupby_all_pricing

    plan = _plan(groupby_all_pricing(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert plan.count("Exchange") <= 1, plan[:2000]


def test_mode_deterministic_breaks_ties_to_lowest(spark):
    # mode(x, true): ties broken to the LOWEST value — the only mode a
    # cross-engine differential can gate on
    df = spark.createDataFrame(
        [("b",), ("a",), ("b",), ("a",), ("c",)], ["x"]
    )
    got = df.agg(F.expr("mode(x, true)").alias("m")).collect()[0].m
    assert got == "a"


def test_bitmap_merge_equals_direct_distinct(spark):
    # bitmap_or_agg over per-group segments is LOSSLESS: the global
    # row the gate derives from per-flag bitmaps equals a direct
    # count(DISTINCT) — exactness is the whole point vs the HLL rollup
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.queries.modern import bitmap_exact_distinct

    rows = {
        r.l_returnflag: r.nd_parts
        for r in bitmap_exact_distinct(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    exact = li.agg(F.countDistinct("l_partkey").alias("nd")).collect()[0].nd
    assert rows["_ALL"] == exact


def test_incremental_lsh_index_side_never_shuffles(spark):
    # the persisted band index must feed the candidate join directly —
    # a BroadcastHashJoin building on the (tiny) batch side, with NO
    # Exchange between the index FileScan and the join. At 100 TB the
    # corpus index is the big side by construction; shuffling it per
    # arriving batch would be the bug this pin exists to catch.
    from linqonsteroids_spark.queries.dedup import dedup_incremental_lsh

    plan = _plan(dedup_incremental_lsh(spark, SF))
    assert "BroadcastHashJoin [band" in plan, plan[:3000]
    idx_scan = None
    for i, line in enumerate(plan.splitlines()):
        if "FileScan parquet [doc_id" in line and "band_key" in line:
            idx_scan = i
            break
    assert idx_scan is not None, plan[:3000]
    # walk UP from the index scan to its join: no Exchange in between
    lines = plan.splitlines()
    for j in range(idx_scan - 1, max(idx_scan - 4, -1), -1):
        if "BroadcastHashJoin" in lines[j]:
            break
        assert "Exchange" not in lines[j], lines[j]


def test_compaction_bins_files_and_preserves_values(spark, tmp_path):
    # compaction contract: ceil(bytes/target) output files, zero value
    # drift, and NO shuffle in the rewrite (coalesce, not repartition)
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_parquet,
        directory_stats,
    )

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "packed")
    events = load_table(spark, SF, "events")
    events.repartition(16).write.parquet(src)
    n_before, bytes_before = directory_stats(src)
    assert n_before == 16
    stats = compact_parquet(spark, src, dst, target_bytes=bytes_before)
    assert stats["files_after"] == 1
    before = sorted(map(tuple, spark.read.parquet(src).collect()))
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert before == after
    # shuffle-free: the compaction read->write plan has no Exchange
    plan = (
        spark.read.parquet(src)
        .coalesce(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]


def test_compaction_refuses_partitioned_layout(spark, tmp_path):
    # a hive-partitioned input must be REFUSED, not silently flattened —
    # and directory_stats must size it recursively (the data files live
    # in key=value subdirs; a top-level glob reads the dataset as 0 B)
    import pytest

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_parquet,
        directory_stats,
    )

    src = str(tmp_path / "by_type")
    events = load_table(spark, SF, "events")
    events.repartition("event_type").write.partitionBy(
        "event_type"
    ).parquet(src)
    n, b = directory_stats(src)
    assert n > 0 and b > 0  # recursive sizing sees the leaf files
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, src, str(tmp_path / "out"))
    # the supported path: compact one leaf partition directory
    import os

    leaf = next(
        os.path.join(src, d) for d in os.listdir(src) if "=" in d
    )
    stats = compact_parquet(
        spark, leaf, str(tmp_path / "leaf_out"), target_bytes=1 << 30
    )
    assert stats["files_after"] == 1


def test_compaction_bins_to_ceil_bytes_over_target(spark, tmp_path):
    # the multi-bin contract: ceil(bytes/target) outputs, not just 1
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_parquet,
        directory_stats,
    )

    src = str(tmp_path / "frag")
    load_table(spark, SF, "events").repartition(16).write.parquet(src)
    _, bytes_before = directory_stats(src)
    target = bytes_before // 3 + 1  # => ceil = 3 bins
    stats = compact_parquet(
        spark, src, str(tmp_path / "packed"), target_bytes=target
    )
    assert stats["files_after"] == 3, stats
    assert (
        spark.read.parquet(str(tmp_path / "packed")).count()
        == spark.read.parquet(src).count()
    )


def _leaf_listing(table: str, leaf: str) -> list[tuple[str, int]]:
    import os

    d = os.path.join(table, leaf)
    return sorted(
        (f, os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if not f.startswith((".", "_"))
    )


def test_in_place_compaction_touches_only_selected_partitions(
    spark, tmp_path
):
    import os

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_partitions_in_place,
    )

    table = str(tmp_path / "by_type")
    events = load_table(spark, SF, "events")
    events.repartition(8).write.partitionBy("event_type").parquet(table)
    leaves = sorted(d for d in os.listdir(table) if "=" in d)
    assert len(leaves) >= 4
    selected, untouched = leaves[::2], leaves[1::2]
    before_vals = sorted(map(tuple, spark.read.parquet(table).collect()))
    before_untouched = {l: _leaf_listing(table, l) for l in untouched}
    before_counts = {l: len(_leaf_listing(table, l)) for l in selected}

    report = compact_partitions_in_place(
        spark, table, selected, target_bytes=1 << 30
    )
    assert set(report) == set(selected)
    for leaf in selected:
        assert report[leaf]["files_before"] == before_counts[leaf]
        assert report[leaf]["files_after"] == 1
        assert len(_leaf_listing(table, leaf)) == 1
    # untouched partitions are byte-identical: same names, same sizes
    for leaf in untouched:
        assert _leaf_listing(table, leaf) == before_untouched[leaf]
    # no staging/retired debris left behind (the table's own hidden
    # files — e.g. hadoop's ._SUCCESS.crc — are not the compactor's)
    assert sorted(d for d in os.listdir(table) if "=" in d) == leaves
    assert not [
        d
        for d in os.listdir(table)
        if d.endswith((".compacting", ".old"))
    ]
    # values preserved exactly, partition column included
    after_vals = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert after_vals == before_vals


def test_in_place_compaction_refuses_flat_layout_and_typos(spark, tmp_path):
    import pytest

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_partitions_in_place,
    )

    flat = str(tmp_path / "flat")
    load_table(spark, SF, "events").limit(10).write.parquet(flat)
    with pytest.raises(ValueError, match="no key=value"):
        compact_partitions_in_place(spark, flat)

    table = str(tmp_path / "by_type")
    load_table(spark, SF, "events").write.partitionBy("event_type").parquet(
        table
    )
    with pytest.raises(ValueError, match="not in layout"):
        compact_partitions_in_place(
            spark, table, ["event_type=does_not_exist"]
        )


def test_in_place_compaction_reclaims_interrupted_debris(spark, tmp_path):
    import os

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_partitions_in_place,
    )

    table = str(tmp_path / "by_type")
    load_table(spark, SF, "events").repartition(4).write.partitionBy(
        "event_type"
    ).parquet(table)
    leaf = sorted(d for d in os.listdir(table) if "=" in d)[0]
    # simulate a crash between staging write and swap
    stale = os.path.join(table, f".{leaf}.compacting")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-orphan.parquet"), "w") as fh:
        fh.write("debris")
    before = sorted(
        map(tuple, spark.read.parquet(table).collect())
    )
    report = compact_partitions_in_place(spark, table, [leaf])
    assert report[leaf]["files_after"] >= 1
    assert not os.path.exists(stale)
    after = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert after == before


def test_in_place_compaction_recovers_crash_between_renames(spark, tmp_path):
    """The r12 ADVICE window: a crash between rename(leaf->.old) and
    rename(staging->leaf) leaves the partition absent with its only
    copies in hidden dot-dirs. The next entry must restore it (finishing
    the swap with the complete staged layout) before selection — a
    reader then never permanently loses the partition."""
    import os
    import shutil

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_partitions_in_place,
    )

    table = str(tmp_path / "by_type")
    load_table(spark, SF, "events").repartition(4).write.partitionBy(
        "event_type"
    ).parquet(table)
    before = sorted(map(tuple, spark.read.parquet(table).collect()))
    leaf = sorted(d for d in os.listdir(table) if "=" in d)[0]
    leaf_dir = os.path.join(table, leaf)
    staging = os.path.join(table, f".{leaf}.compacting")
    retired = os.path.join(table, f".{leaf}.old")
    # stage a complete replacement (copy of the leaf), then simulate the
    # crash: leaf renamed away, staged layout never swapped in
    shutil.copytree(leaf_dir, staging)
    os.rename(leaf_dir, retired)
    assert not os.path.exists(leaf_dir)
    # selecting the stranded leaf works again after entry recovery
    report = compact_partitions_in_place(spark, table, [leaf])
    assert leaf in report
    assert not os.path.exists(staging) and not os.path.exists(retired)
    after = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert after == before


def test_in_place_compaction_recovers_retired_only_crash(spark, tmp_path):
    """Defensive variant: only the .old sibling survived (staging lost).
    Recovery rolls the original back into place."""
    import os

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.operators.compact import (
        compact_partitions_in_place,
    )

    table = str(tmp_path / "by_type")
    load_table(spark, SF, "events").repartition(4).write.partitionBy(
        "event_type"
    ).parquet(table)
    before = sorted(map(tuple, spark.read.parquet(table).collect()))
    leaf = sorted(d for d in os.listdir(table) if "=" in d)[0]
    leaf_dir = os.path.join(table, leaf)
    os.rename(leaf_dir, os.path.join(table, f".{leaf}.old"))
    report = compact_partitions_in_place(spark, table, [leaf])
    assert leaf in report
    after = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert after == before
