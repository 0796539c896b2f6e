"""Sources/sinks and skew-mitigation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.operators.skew import salted_aggregate, salted_join
from linqonsteroids_spark.sources import register_views, write_bucketed_table, write_parquet
from tests.conftest import SF_SMOKE


def test_sql_surface_via_views(spark):
    register_views(spark, SF_SMOKE)
    out = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    want = (
        load_table(spark, SF_SMOKE, "supplier")
        .join(
            load_table(spark, SF_SMOKE, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .count()
    )
    assert {(r[0], r[1]) for r in out.collect()} == {
        (r["n_name"], r["count"]) for r in want.collect()
    }


def test_write_parquet_partitioned_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_by_priority")
    write_parquet(orders, path, partition_by=["o_orderpriority"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: the filter becomes a PartitionFilter on the scan
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1-URGENT" in plan.split("PartitionFilters")[1][:200]
    assert one.count() == load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()


def test_bucketed_table_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed_table(orders, "b_orders", ["o_custkey"], n_buckets=8)
    write_bucketed_table(customer, "b_customer", ["c_custkey"], n_buckets=8)
    a = spark.table("b_orders")
    b = spark.table("b_customer")
    joined = a.join(b, a.o_custkey == b.c_custkey)
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-bucketed tables: SortMergeJoin with NO Exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(orders, customer, "o_custkey", "c_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_aggregate_equals_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    plain = {
        (r[0], r[1], round(r[2], 2))
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total"))
        .collect()
    }
    salted = {
        (r[0], r[1], round(r[2], 2))
        for r in salted_aggregate(
            orders,
            "o_orderpriority",
            {
                "n": ("sum", F.count("*")),
                "total": ("sum", F.sum("o_totalprice")),
            },
            n_salts=4,
        ).collect()
    }
    assert salted == plain


# --- Z-order layout (sources/zorder.py) --------------------------------------


def _file_spans(path, col):
    """Per-parquet-file (min, max) of `col` from the footer statistics —
    exactly the metadata a scan uses to skip files."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans


def test_zorder_narrows_both_columns_file_spans(spark, tmp_path):
    """The point of z-order: after laying out on morton(x, y), BOTH
    columns have narrow per-file min/max spans, so a filter on EITHER
    prunes most files from footer stats. A y-sorted layout gives y
    locality but leaves x spanning the full domain in every file."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.sources.zorder import write_zordered, zorder_code

    n = 1 << 14
    grid = spark.range(n).select(
        (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("long").alias("y")
    )
    z_path, y_path = str(tmp_path / "z"), str(tmp_path / "y")
    write_zordered(grid, z_path, ["x", "y"], n_files=16)
    (
        grid.repartitionByRange(16, F.col("y"))
        .sortWithinPartitions("y")
        .write.mode("overwrite")
        .parquet(y_path)
    )

    def mean_span(path, col, domain):
        spans = _file_spans(path, col)
        assert spans
        return sum(hi - lo for lo, hi in spans) / len(spans) / domain

    # y-sorted: y tight, x spans ~the whole domain in every file
    assert mean_span(y_path, "x", 127) > 0.9
    # z-ordered: BOTH columns' file spans cover a fraction of the domain
    assert mean_span(z_path, "x", 127) < 0.5
    assert mean_span(z_path, "y", 127) < 0.5
    # layout is a pure function of the data: codes reproduce exactly
    a = zorder_code(grid, ["x", "y"]).select("_zcode").collect()
    b = zorder_code(grid, ["x", "y"]).select("_zcode").collect()
    assert sorted(r[0] for r in a) == sorted(r[0] for r in b)
    # and the written relation is unchanged as a multiset
    back = spark.read.parquet(z_path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, grid.collect()))


def test_zorder_four_columns_never_hits_sign_bit(spark):
    """4 columns at the default 16 bits would shift a bit into position
    63 (the BIGINT sign bit), flipping codes negative and breaking the
    Morton ordering; zorder_code must auto-reduce per-column bits so
    every code stays non-negative, with extreme values still ordered
    after minimal ones."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.sources.zorder import zorder_code

    n = 1 << 10
    df = spark.range(n).select(
        F.col("id").alias("a"),
        (F.lit(n) - F.col("id")).alias("b"),
        (F.col("id") * 3 % n).alias("c"),
        (F.col("id") * 7 % n).alias("d"),
    )
    coded = zorder_code(df, ["a", "b", "c", "d"])  # default bits=16 -> 15
    stats = coded.agg(
        F.min("_zcode").alias("lo"), F.max("_zcode").alias("hi")
    ).collect()[0]
    assert stats["lo"] >= 0
    assert stats["hi"] < 1 << 60  # 4 cols x 15 bits
    # the all-max corner must carry the largest code, not a negative one
    corner = coded.orderBy(F.desc("_zcode")).limit(1).collect()[0]
    top = df.agg(*[F.max(c).alias(c) for c in "abcd"]).collect()[0]
    # highest code's quantized ranks are near the top of every dimension
    assert corner["a"] + corner["b"] + corner["c"] + corner["d"] > (
        top["a"] + top["b"] + top["c"] + top["d"]
    ) // 2


def test_aqe_splits_skewed_join_partition(spark):
    """Scale evidence beside the manual salting operator: with AQE skew
    handling on (session default), a sort-merge join whose shuffle has
    one dominant key gets its hot partition SPLIT at runtime
    (OptimizeSkewedJoin) — the executed plan's AQEShuffleRead reports
    skewed partition splits. Thresholds are lowered for toy sizes and
    restored afterward; at production sizes the defaults fire the same
    path."""
    from pyspark.sql import functions as F

    tweaked = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaked}
    try:
        for k, v in tweaked.items():
            spark.conf.set(k, v)
        # 400k fact rows, 95% on key 0; dim uniform over 100 keys
        fact = spark.range(400_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("dval")
        )
        # global agg, NOT groupBy(k): AQE declines to split a skewed join
        # partition when a downstream operator would reuse the join's hash
        # partitioning (splitting would force an extra shuffle)
        joined = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.max("payload").alias("mx")
        )
        joined.collect()  # AQE finalizes the plan only on execution
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:1500]
        assert "skew=true" in plan, "join not marked skew:\n" + plan[:3000]
        assert any(
            "AQEShuffleRead" in ln and "skewed" in ln
            for ln in plan.splitlines()
        ), "no skewed shuffle read:\n" + plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hotkey_salted_join_equals_plain_join(spark):
    """Partial salting must be result-invariant: crafted whale key (one
    key holds half the fact), plus uniform tail, plus fact keys with no
    dim match and dim keys with no fact rows."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.operators.skew import hotkey_salted_join

    fact = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(40).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    got = (
        hotkey_salted_join(fact, dim, "k", "dk", n_salts=4, max_hot_keys=3)
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    want = (
        fact.join(dim, fact.k == dim.dk)
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_hotkey_salted_join_all_null_keys_falls_back(spark):
    from pyspark.sql import functions as F

    from linqonsteroids_spark.operators.skew import hotkey_salted_join

    fact = spark.range(10).select(
        F.lit(None).cast("long").alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(3).select(F.col("id").alias("dk"))
    assert hotkey_salted_join(fact, dim, "k", "dk").count() == 0


def test_hotkey_salted_join_replicates_only_hot_keys(spark):
    """The efficiency contract partial salting exists for: the joined
    row multiplicity stays 1 per (fact row, dim match) — and internally
    the dim explode emits n_salts copies ONLY for hot keys. Pinned via
    the operator's own building blocks on a crafted frame."""
    from pyspark.sql import functions as F

    n_salts, hot = 4, [7]
    dim = spark.range(10).select(F.col("id").alias("dk"))
    hot_lit = F.lit(hot)
    rep = dim.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.array_contains(hot_lit, F.col("dk")),
                F.lit(list(range(n_salts))),
            ).otherwise(F.lit([0]))
        ),
    )
    # 10 dim rows; one hot key -> 10 + (4-1)*1 = 13, NOT 40 (blanket)
    assert rep.count() == 13


def test_hot_key_stats_default_samples_and_agrees_with_full_scan(spark):
    """r12: the statistics pass never full-scans the fact side by
    default. On the crafted skew fixture (one whale = half the rows) the
    sampled and exact hot sets must agree on the whale — sampling moves
    the tail ordering at most, never the keys salting exists for."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.operators.skew import measure_hot_keys

    fact = spark.range(4000).select(
        F.when(F.col("id") < 2000, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k")
    )
    sampled = measure_hot_keys(fact, "k", max_hot_keys=1)
    exact = measure_hot_keys(fact, "k", max_hot_keys=1, full_scan=True)
    assert sampled == exact == [7]
    # explicit fraction is honored; both modes at once are refused
    assert measure_hot_keys(fact, "k", 1, hot_fraction=0.5) == [7]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        measure_hot_keys(fact, "k", 1, hot_fraction=0.5, full_scan=True)
