"""plans/result_cache.py: plan-fingerprint memoization with snapshot keys.

The cache's whole contract is in its key: canonicalized plan x base-file
snapshot. These pin the four behaviors the gate
(queries/engine.py::result_cache_revenue) relies on — rebuilt-equivalent
queries collide, different queries don't, base mutation rotates the key,
and a hit never touches base files.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from linqonsteroids_spark.plans.result_cache import ResultCache


def _write_base(spark, path, n=100):
    spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    ).write.mode("overwrite").parquet(path)


def test_rebuilt_equivalent_query_shares_the_fingerprint(spark, tmp_path):
    base = str(tmp_path / "base")
    _write_base(spark, base)
    cache = ResultCache(spark, str(tmp_path / "cache"))

    def q(alias):
        # rebuilt from scratch each call: fresh read, fresh expression
        # IDs, a different intermediate alias — canonicalization must
        # erase all of it
        return (
            spark.read.parquet(base)
            .withColumn(alias, F.col("k") * 2)
            .groupBy("g")
            .agg(F.sum(alias).alias("s"))
        )

    assert cache.fingerprint(q("a")) == cache.fingerprint(q("a"))
    # a semantically different query must not collide
    assert cache.fingerprint(q("a")) != cache.fingerprint(
        spark.read.parquet(base).groupBy("g").agg(F.sum("k").alias("s"))
    )


def test_hit_serves_cache_files_and_misses_after_append(spark, tmp_path):
    base = str(tmp_path / "base")
    _write_base(spark, base)
    store = str(tmp_path / "cache")
    cache = ResultCache(spark, store)
    q = lambda: spark.read.parquet(base).groupBy("g").agg(  # noqa: E731
        F.count("*").alias("n")
    )
    r1, hit1 = cache.get_or_materialize(q())
    assert not hit1
    r2, hit2 = cache.get_or_materialize(q())
    assert hit2
    assert r2.inputFiles() and all(store in f for f in r2.inputFiles())
    assert sorted(map(tuple, r2.collect())) == sorted(map(tuple, r1.collect()))
    # append: fresh part files -> new snapshot -> miss, result reflects it
    spark.range(100, 107).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    ).write.mode("append").parquet(base)
    r3, hit3 = cache.get_or_materialize(q())
    assert not hit3
    assert sum(r[1] for r in r3.collect()) == 107


def test_sweep_reclaims_stale_entries(spark, tmp_path):
    base = str(tmp_path / "base")
    _write_base(spark, base)
    store = str(tmp_path / "cache")
    cache = ResultCache(spark, store)
    df = spark.read.parquet(base).groupBy("g").agg(F.count("*").alias("n"))
    cache.get_or_materialize(df)
    assert len(os.listdir(store)) == 1
    assert cache.sweep(older_than_s=3600) == 0  # fresh: kept
    entry = os.path.join(store, os.listdir(store)[0])
    os.utime(entry, (1, 1))  # age it out
    assert cache.sweep(older_than_s=3600) == 1
    assert os.listdir(store) == []


def test_lifted_value_cached_sink_memoizes_rebuilt_pipelines(
    spark, tmp_path
):
    """The API-level sink: two independently built but equivalent lifted
    pipelines share one cache entry; a base append recomputes."""
    from linqonsteroids_spark.api import lift

    base = str(tmp_path / "base")
    _write_base(spark, base)
    cache = ResultCache(spark, str(tmp_path / "cache"))

    def frame():
        return (
            lift(spark.read.parquet(base))
            .filter(lambda r: r.k < 50)
        )

    rows1, hit1 = frame().value_cached(cache)
    rows2, hit2 = frame().value_cached(cache)
    assert not hit1 and hit2
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    spark.range(200, 203).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    ).write.mode("append").parquet(base)
    rows3, hit3 = frame().value_cached(cache)
    assert not hit3
    assert len(rows3) == len(rows1)  # appended keys are >= 50, filtered

def test_wide_plans_past_truncation_point_do_not_collide(spark, tmp_path):
    """ADVICE r12 (medium): toString() truncates node argument lists at
    spark.sql.debug.maxToStringFields (default 25), so two wide selects
    differing only PAST the cutoff used to hash identically and serve
    each other's results. The key now uses the complete JSON form."""
    base = str(tmp_path / "base")
    _write_base(spark, base)
    cache = ResultCache(spark, str(tmp_path / "cache"))

    def wide(last_expr):
        cols = [(F.col("k") + i).alias(f"c{i}") for i in range(39)]
        return spark.read.parquet(base).select(*cols, last_expr.alias("c39"))

    a = wide(F.col("k") * 2)
    b = wide(F.col("k") * 3)  # differs only in the 40th projection
    # precondition: the truncated string form really does conflate them
    sa = a._jdf.queryExecution().analyzed().canonicalized().toString()
    sb = b._jdf.queryExecution().analyzed().canonicalized().toString()
    assert "more fields" in sa and sa == sb
    assert cache.fingerprint(a) != cache.fingerprint(b)
    ra, _ = cache.get_or_materialize(a)
    rb, _ = cache.get_or_materialize(b)
    assert ra.select(F.sum("c39")).first()[0] != rb.select(F.sum("c39")).first()[0]


def test_concurrent_misses_leave_one_complete_entry(spark, tmp_path):
    """r12 verdict item 5: two sessions missing on the same fingerprint
    used to race mode('overwrite') writes to the SAME path (delete-then-
    write interleavings corrupt the entry). Now each stages privately and
    claims via no-clobber rename: exactly one wins, the loser serves the
    winner's complete entry, and a full read always verifies."""
    import threading

    base = str(tmp_path / "base")
    _write_base(spark, base)
    store = str(tmp_path / "cache")
    results, errors = [], []

    def worker():
        try:
            cache = ResultCache(spark, store)
            q = spark.read.parquet(base).groupBy("g").agg(
                F.count("*").alias("n")
            )
            r, hit = cache.get_or_materialize(q)
            results.append((sorted(map(tuple, r.collect())), hit))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 4
    expected = results[0][0]
    assert all(r == expected for r, _ in results)
    # exactly one complete entry on disk, no staging debris
    entries = [d for d in os.listdir(store) if ".staged." not in d]
    staged = [d for d in os.listdir(store) if ".staged." in d]
    assert len(entries) == 1 and not staged
    assert os.path.exists(os.path.join(store, entries[0], "_SUCCESS"))
