"""Subprocess smoke for the Catalyst-extension JAR (run in its OWN JVM:
the extension must be on the driver classpath at session startup, so the
shared test SparkSession cannot host it).

Builds a base table and a same-rows index table partitioned by `seg`,
registers the index with the extension's runtime registry conf, and
checks that a Filter(seg = lit) query over the BASE path (1) returns
exactly the base-table answer and (2) physically scans the INDEX path
with a directory-pruning PartitionFilter. Prints PASS lines; any
assertion failure exits nonzero.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    jar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "linqonsteroids_spark",
        "ext",
        "linq-ext.jar",
    )
    assert os.path.exists(jar), f"missing {jar}; run tools/build_catalyst_ext.sh"
    tmp = tempfile.mkdtemp(prefix="linq_ext_")
    base_path = os.path.join(tmp, "base")
    idx_path = os.path.join(tmp, "idx")

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("catalyst_ext_smoke")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.extensions", "linqonsteroids.ext.LinqExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).alias("seg"),
        (F.col("id") * 3).alias("payload"),
    )
    df.write.mode("overwrite").parquet(base_path)
    df.repartition("seg").write.mode("overwrite").partitionBy("seg").parquet(idx_path)

    q = spark.read.parquet(base_path).filter(F.col("seg") == 5)
    baseline = sorted(tuple(r) for r in q.collect())

    # register the index; the SAME query must now route through it
    spark.conf.set("spark.linqonsteroids.indexes", f"{base_path},seg,{idx_path}")
    q2 = spark.read.parquet(base_path).filter(F.col("seg") == 5)
    rewritten = sorted(tuple(r) for r in q2.collect())
    assert rewritten == baseline and len(baseline) == 125, (
        len(rewritten),
        len(baseline),
    )
    print("PASS values")

    plan = q2._jdf.queryExecution().executedPlan().toString()
    assert "idx" in plan and os.path.basename(idx_path) in plan, plan[:2000]
    assert os.path.basename(base_path) not in plan, plan[:2000]
    print("PASS scans-index-not-base")
    assert "PartitionFilters" in plan, plan[:2000]
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "seg" in pf.group(1), plan[:2000]
    print("PASS partition-pruned")

    # IN-list predicates route through the index with multi-directory
    # pruning too
    q5 = spark.read.parquet(base_path).filter(F.col("seg").isin(2, 5))
    vals5 = sorted(tuple(r) for r in q5.collect())
    assert len(vals5) == 250 and all(v[1] in (2, 5) for v in vals5)
    p5 = q5._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(idx_path) in p5 and os.path.basename(base_path) not in p5
    assert "PartitionFilters" in p5
    print("PASS in-list-pruned")

    # RANGE predicates route through the index too (r10): the re-applied
    # filter becomes PartitionFilters on the directory-partitioned index,
    # so seg >= 6 reads exactly 2 of 8 directories
    q6 = spark.read.parquet(base_path).filter(F.col("seg") >= 6)
    vals6 = sorted(tuple(r) for r in q6.collect())
    assert len(vals6) == 250 and all(v[1] >= 6 for v in vals6)
    p6 = q6._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(idx_path) in p6 and os.path.basename(base_path) not in p6
    pf6 = re.search(r"PartitionFilters: \[([^\]]*)\]", p6)
    assert pf6 and ">= 6" in pf6.group(1), p6[:2000]
    # BETWEEN (two range conjuncts) prunes to the enclosed directories
    q7 = spark.read.parquet(base_path).filter(
        (F.col("seg") >= 3) & (F.col("seg") < 5)
    )
    vals7 = sorted(tuple(r) for r in q7.collect())
    assert len(vals7) == 250 and all(3 <= v[1] < 5 for v in vals7)
    p7 = q7._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(idx_path) in p7 and os.path.basename(base_path) not in p7
    # a range on a NON-indexed column must not reroute
    q8 = spark.read.parquet(base_path).filter(F.col("payload") > 2900)
    p8 = q8._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(idx_path) not in p8, p8[:2000]
    print("PASS range-pruned")

    # Python IndexRepository artifacts feed the JVM rule directly: build a
    # directory-partitioned index through the repository API and register
    # it via catalyst_conf — a RAW spark.read over the base path (no
    # Python-side rewriter anywhere) must route through it
    from linqonsteroids_spark.api import lift
    from linqonsteroids_spark.plans.registry import IndexRepository

    repo_dir = os.path.join(tmp, "repo")
    repo = IndexRepository(spark, repo_dir)
    base_df = spark.read.parquet(base_path)
    repo.add_partitioned_index(
        "seg_idx", lift(base_df, table="base").index_by(lambda t: t.seg)
    )
    spark.conf.set(
        "spark.linqonsteroids.indexes",
        repo.catalyst_conf({"base": base_path}),
    )
    q6 = spark.read.parquet(base_path).filter(F.col("seg") == 3)
    vals6 = sorted(tuple(r) for r in q6.collect())
    assert len(vals6) == 125 and all(v[1] == 3 for v in vals6)
    p6 = q6._jdf.queryExecution().executedPlan().toString()
    assert "seg_idx" in p6 and os.path.basename(base_path) not in p6
    assert "PartitionFilters" in p6
    print("PASS repository-bridge")

    # type-widening Cast path: spark.range's seg is BIGINT, but the
    # index's directory values (seg=0..7) partition-infer as INT — the
    # rewrite must keep the ORIGINAL schema (Cast back to bigint) while
    # pruning still fires on the int partition column (pinned above by
    # PASS partition-pruned on this very index).
    spark.conf.set("spark.linqonsteroids.indexes", f"{base_path},seg,{idx_path}")
    q7 = spark.read.parquet(base_path).filter(F.col("seg") == 5)
    assert dict(spark.read.parquet(idx_path).dtypes)["seg"] == "int"
    assert dict(q7.dtypes)["seg"] == "bigint", q7.dtypes
    assert q7.schema == spark.read.parquet(base_path).schema
    print("PASS cast-widened-partition-column")

    # column-pruned shapes: select-then-filter and filter-then-select
    # both interpose a Project between the Filter and the scan at some
    # point of optimization — the rule must still route to the index
    for qp in (
        spark.read.parquet(base_path).select("k", "seg").filter(F.col("seg") == 5),
        spark.read.parquet(base_path).filter(F.col("seg") == 5).select("k", "seg"),
    ):
        vals = sorted(tuple(r) for r in qp.collect())
        assert len(vals) == 125 and all(v[1] == 5 for v in vals)
        pp = qp._jdf.queryExecution().executedPlan().toString()
        assert os.path.basename(idx_path) in pp, pp[:2000]
        assert os.path.basename(base_path) not in pp, pp[:2000]
        assert "PartitionFilters" in pp, pp[:2000]
    print("PASS project-interposed-shapes")

    # stale registry entry (index directory does not exist): the query
    # must fall back to the base scan and still answer correctly
    spark.conf.set(
        "spark.linqonsteroids.indexes",
        f"{base_path},seg,{os.path.join(tmp, 'deleted_idx')}",
    )
    q8 = spark.read.parquet(base_path).filter(F.col("seg") == 5)
    assert sorted(tuple(r) for r in q8.collect()) == baseline
    p8 = q8._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(base_path) in p8, p8[:2000]
    print("PASS stale-registry-fallback")

    # relation-load caching: the analyzed index plan is built at most
    # once per path per JVM — repeated queries (and every optimizer
    # fixpoint iteration inside them) must not re-list the directory
    spark.conf.set("spark.linqonsteroids.indexes", f"{base_path},seg,{idx_path}")
    for _ in range(3):
        spark.read.parquet(base_path).filter(F.col("seg") == 1).collect()
    cls = spark._jvm.java.lang.Class.forName("linqonsteroids.ext.IndexSubstitution$")
    mod = cls.getField("MODULE$").get(None)
    loads = mod.loadCount()
    # exactly two successful loads this JVM: idx_path and the
    # repository-bridge index; the stale path must not count
    assert loads == 2, loads
    print("PASS relation-load-cached")

    # cache-epoch invalidation: rewrite the index directory IN-SESSION
    # (new payload values), bump spark.linqonsteroids.cacheEpoch, and the
    # rule must reload the relation — serving the NEW data, exactly one
    # extra load. Without the bump the rule would keep serving the
    # cached (now deleted) file listing.
    epoch_base = os.path.join(tmp, "epoch_base")
    epoch_idx = os.path.join(tmp, "epoch_idx")
    df.write.mode("overwrite").parquet(epoch_base)
    df.repartition("seg").write.mode("overwrite").partitionBy("seg").parquet(
        epoch_idx
    )
    spark.conf.set(
        "spark.linqonsteroids.indexes", f"{epoch_base},seg,{epoch_idx}"
    )
    qe = spark.read.parquet(epoch_base).filter(F.col("seg") == 5)
    assert sorted(r.payload for r in qe.collect())[0] == 15
    loads_before = mod.loadCount()
    # in-session rewrite: same directory, payload shifted by 1000
    df.withColumn("payload", F.col("payload") + 1000).repartition(
        "seg"
    ).write.mode("overwrite").partitionBy("seg").parquet(epoch_idx)
    from linqonsteroids_spark.plans.registry import (
        _bump_catalyst_epoch,
        catalyst_epoch,
    )

    _bump_catalyst_epoch()
    spark.conf.set("spark.linqonsteroids.cacheEpoch", catalyst_epoch())
    qe2 = spark.read.parquet(epoch_base).filter(F.col("seg") == 5)
    vals_e = sorted(r.payload for r in qe2.collect())
    assert vals_e[0] == 1015 and len(vals_e) == 125, vals_e[:3]
    pe = qe2._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(epoch_idx) in pe, pe[:2000]
    # one reload for epoch_idx, one for idx_path (both were evicted by
    # the clear; idx_path reloads lazily on its next use, not here)
    assert mod.loadCount() == loads_before + 1, (loads_before, mod.loadCount())
    # unchanged epoch: repeated queries stay cached
    spark.read.parquet(epoch_base).filter(F.col("seg") == 3).collect()
    assert mod.loadCount() == loads_before + 1
    print("PASS cache-epoch-invalidation")

    # --- join-MV substitution (spark.linqonsteroids.joinindexes) ---------
    dim_path = os.path.join(tmp, "dim")
    mv_path = os.path.join(tmp, "join_mv")
    dim = spark.range(8).select(
        F.col("id").alias("seg_id"),
        F.concat(F.lit("segment-"), F.col("id")).alias("seg_name"),
    )
    dim.write.mode("overwrite").parquet(dim_path)
    base_df2 = spark.read.parquet(base_path)
    dim_df = spark.read.parquet(dim_path)
    base_df2.join(dim_df, base_df2.seg == dim_df.seg_id).write.mode(
        "overwrite"
    ).parquet(mv_path)

    spark.conf.set("spark.linqonsteroids.indexes", "")
    jq = base_df2.join(dim_df, base_df2.seg == dim_df.seg_id).filter(
        F.col("seg_name") == "segment-5"
    )
    want_join = sorted(tuple(r) for r in jq.collect())
    assert len(want_join) == 125

    spark.conf.set(
        "spark.linqonsteroids.joinindexes",
        f"{base_path},seg,{dim_path},seg_id,{mv_path}",
    )
    jq2 = base_df2.join(dim_df, base_df2.seg == dim_df.seg_id).filter(
        F.col("seg_name") == "segment-5"
    )
    assert sorted(tuple(r) for r in jq2.collect()) == want_join
    pj = jq2._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(mv_path) in pj, pj[:2000]
    assert os.path.basename(base_path) not in pj, pj[:2000]
    assert os.path.basename(dim_path) not in pj, pj[:2000]
    assert "Join" not in pj, pj[:2000]  # the join itself is GONE
    # flipped orientation matches too (inner join commutes)
    jq3 = dim_df.join(base_df2, base_df2.seg == dim_df.seg_id)
    p3j = jq3._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(mv_path) in p3j and "Join" not in p3j
    assert jq3.count() == 1000
    print("PASS join-mv-substituted")

    # ambiguous column names across the two sides: a hand-written conf
    # pointing at tables that SHARE a column name must not rewrite —
    # name-based restoration would silently bind both sides to one MV
    # column (the Python repository rejects such MVs at registration)
    dim_amb_path = os.path.join(tmp, "dim_amb")
    spark.range(8).select(
        F.col("id").alias("seg_id"),
        (F.col("id") * 100).alias("payload"),  # clashes with base.payload
    ).write.mode("overwrite").parquet(dim_amb_path)
    amb_df = spark.read.parquet(dim_amb_path)
    spark.conf.set(
        "spark.linqonsteroids.joinindexes",
        f"{base_path},seg,{dim_amb_path},seg_id,{mv_path}",
    )
    jq_amb = base_df2.join(amb_df, base_df2.seg == amb_df.seg_id)
    p_amb = jq_amb._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(mv_path) not in p_amb, p_amb[:2000]
    print("PASS join-mv-ambiguous-name-untouched")
    spark.conf.set(
        "spark.linqonsteroids.joinindexes",
        f"{base_path},seg,{dim_path},seg_id,{mv_path}",
    )

    # non-registered join key / outer join: untouched
    jq4 = base_df2.join(dim_df, base_df2.payload == dim_df.seg_id)
    p4j = jq4._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(mv_path) not in p4j
    jq5 = base_df2.join(
        dim_df, base_df2.seg == dim_df.seg_id, "left_outer"
    )
    p5j = jq5._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(mv_path) not in p5j
    # a nondeterministic side-filter below the join must veto the strip:
    # re-applied above the join it would sample per JOINED row instead
    # of per base row (different semantics when the join fans out).
    # 0.5, not an always-true bound — Catalyst folds rand() < 2.0 away.
    jq6 = base_df2.filter(F.rand(11) < F.lit(0.5)).join(
        dim_df, base_df2.seg == dim_df.seg_id
    )
    p6j = jq6._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(mv_path) not in p6j, p6j[:2000]
    print("PASS join-mv-no-false-rewrites")

    # repository bridge: a join MV registered through the Python API
    # feeds the JVM rule via catalyst_join_conf
    repo.add_join_index(
        "base_dim_mv",
        lift(base_df2, table="base").join(
            lift(dim, table="dim"),
            lambda l: l.seg,
            lambda r: r.seg_id,
        ),
    )
    conf = repo.catalyst_join_conf({"base": base_path, "dim": dim_path})
    assert conf.count(",") == 4 and "base_dim_mv" in conf, conf
    spark.conf.set("spark.linqonsteroids.joinindexes", conf)
    jq6 = base_df2.join(dim_df, base_df2.seg == dim_df.seg_id)
    p6j = jq6._jdf.queryExecution().executedPlan().toString()
    assert "base_dim_mv" in p6j and "Join" not in p6j, p6j[:2000]
    assert jq6.count() == 1000
    print("PASS join-mv-repository-bridge")
    spark.conf.set("spark.linqonsteroids.joinindexes", "")

    # --- aggregate-MV substitution (spark.linqonsteroids.aggindexes) -----
    # the transparent rollup: a grouped count/sum/min/max over the raw
    # base path is answered by ONE scan of the pre-aggregated MV — the
    # physical plan contains NO aggregation operator at all
    repo.add_agg_index(
        "base_rollup",
        lift(base_df2, table="base").index_by(lambda t: t.seg),
        sums=["payload"],
        mins=["k"],
        maxs=["k"],
    )
    spark.conf.set("spark.linqonsteroids.aggindexes", "")

    def rollup_q():
        return (
            spark.read.parquet(base_path)
            .groupBy("seg")
            .agg(
                F.count("*").alias("n"),
                F.sum("payload").alias("psum"),
                F.min("k").alias("kmin"),
                F.max("k").alias("kmax"),
            )
        )

    want_agg = sorted(tuple(r) for r in rollup_q().collect())
    p_off = rollup_q()._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in p_off  # the conf-off baseline really aggregates
    agg_conf = repo.catalyst_agg_conf({"base": base_path})
    assert "base_rollup" in agg_conf, agg_conf
    spark.conf.set("spark.linqonsteroids.aggindexes", agg_conf)
    qa = rollup_q()
    assert sorted(tuple(r) for r in qa.collect()) == want_agg
    pa = qa._jdf.queryExecution().executedPlan().toString()
    assert "base_rollup" in pa, pa[:2000]
    # the base directory itself (not the rollup, whose name contains
    # "base") must be gone from the scan locations
    assert f"file:{base_path}]" not in pa, pa[:2000]
    assert "Aggregate" not in pa, pa[:2000]  # no HashAggregate anywhere
    print("PASS agg-mv-substituted")

    # group-key filter below the aggregate commutes and is re-applied
    # above the MV scan
    qf = (
        spark.read.parquet(base_path)
        .filter(F.col("seg") == 3)
        .groupBy("seg")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("psum"))
    )
    rows_f = qf.collect()
    assert len(rows_f) == 1 and rows_f[0].n == 125
    assert rows_f[0].psum == sum(i * 3 for i in range(1000) if i % 8 == 3)
    pf = qf._jdf.queryExecution().executedPlan().toString()
    assert "base_rollup" in pf and "Aggregate" not in pf, pf[:2000]
    print("PASS agg-mv-key-filter")

    # the SAME SQL text over a view of the base path routes too
    spark.read.parquet(base_path).createOrReplaceTempView("agg_base_v")
    qs = spark.sql(
        "SELECT seg, count(*) AS n, sum(payload) AS psum "
        "FROM agg_base_v GROUP BY seg"
    )
    assert sorted((r.seg, r.n, r.psum) for r in qs.collect()) == sorted(
        (w[0], w[1], w[2]) for w in want_agg
    )
    ps = qs._jdf.queryExecution().executedPlan().toString()
    assert "base_rollup" in ps and "Aggregate" not in ps, ps[:2000]
    print("PASS agg-mv-sql-surface")

    # HAVING composes: the post-aggregate Filter references the
    # substitution's aliased output (original exprIds preserved), so it
    # survives as a plain filter over the MV scan
    qh = spark.sql(
        "SELECT seg, count(*) AS n, sum(payload) AS psum "
        "FROM agg_base_v GROUP BY seg HAVING count(*) > 100"
    )
    rows_h = qh.collect()
    assert sorted((r.seg, r.n) for r in rows_h) == sorted(
        (w[0], w[1]) for w in want_agg if w[1] > 100
    )
    ph = qh._jdf.queryExecution().executedPlan().toString()
    assert "base_rollup" in ph and "Aggregate" not in ph, ph[:2000]
    print("PASS agg-mv-having")

    # shapes the rollup CANNOT answer must keep the base aggregate:
    # avg, count(col), distinct, expressions over aggregates, filters on
    # non-key columns, multi-key grouping
    base_sc = spark.read.parquet(base_path)
    for bad in (
        base_sc.groupBy("seg").agg(F.avg("payload").alias("x")),
        base_sc.groupBy("seg").agg(F.count("payload").alias("x")),
        base_sc.groupBy("seg").agg(F.countDistinct("payload").alias("x")),
        base_sc.groupBy("seg").agg((F.sum("payload") + 1).alias("x")),
        base_sc.filter(F.col("payload") > 100).groupBy("seg").count(),
        base_sc.groupBy("seg", "payload").count(),
        base_sc.groupBy("payload").count(),
        # a NONDETERMINISTIC filter has no column references, so the
        # key-only reference guard alone would vacuously admit it — but
        # re-applying it above the MV turns per-row sampling into
        # per-group sampling (wrong aggregates). Must keep the base agg.
        # (0.5, not an always-true bound: Catalyst knows rand() ∈ [0,1)
        # and folds e.g. rand() < 2.0 away entirely)
        base_sc.filter(F.rand(7) < F.lit(0.5))
        .groupBy("seg")
        .agg(F.count("*").alias("x")),
        # count(NULL) is 0 per group, NOT count(*): a foldable-but-null
        # child must not map to cnt_star
        base_sc.groupBy("seg").agg(F.count(F.lit(None)).alias("x")),
        base_sc.groupBy("seg").agg(
            F.count(F.lit(None).cast("int")).alias("x")
        ),
    ):
        pb = bad._jdf.queryExecution().executedPlan().toString()
        assert os.path.basename(base_path) in pb, pb[:2000]
        assert "base_rollup" not in pb, pb[:2000]
    print("PASS agg-mv-no-false-rewrites")
    spark.conf.set("spark.linqonsteroids.aggindexes", "")

    # --- refresh-through-substitution, end to end (r11) -------------------
    # The full advisor-refresh loop under the JVM rule: base append →
    # change feed (the appended files) → incremental MV refresh
    # (refresh_agg_index merges the delta rollup — O(|delta|+|MV|), the
    # base is never rescanned) → cacheEpoch bump → the SAME aggregate
    # query, still written against the raw base path, reads the
    # REFRESHED rollup through the rule and returns grown-base truth.
    from linqonsteroids_spark.plans.registry import catalyst_epoch

    rb = os.path.join(tmp, "refresh_base")
    df.write.mode("overwrite").parquet(rb)
    rbs = spark.read.parquet(rb)
    repo.add_agg_index(
        "refresh_rollup",
        lift(rbs, table="rbase").index_by(lambda t: t.seg),
        sums=["payload"],
    )
    spark.conf.set(
        "spark.linqonsteroids.aggindexes",
        repo.catalyst_agg_conf({"rbase": rb}),
    )
    spark.conf.set("spark.linqonsteroids.cacheEpoch", catalyst_epoch())

    def refresh_q():
        return (
            spark.read.parquet(rb)
            .groupBy("seg")
            .agg(F.count("*").alias("n"), F.sum("payload").alias("psum"))
        )

    q_pre = refresh_q()
    pre_vals = {r.seg: (r.n, r.psum) for r in q_pre.collect()}
    p_pre = q_pre._jdf.queryExecution().executedPlan().toString()
    assert "refresh_rollup" in p_pre and "Aggregate" not in p_pre, p_pre[:2000]
    pre_files = set(spark.read.parquet(rb).inputFiles())
    delta_df = spark.range(1000, 1200).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).alias("seg"),
        (F.col("id") * 3).alias("payload"),
    )
    delta_df.write.mode("append").parquet(rb)
    # the change feed of an append-only table IS its new-file set
    new_files = sorted(set(spark.read.parquet(rb).inputFiles()) - pre_files)
    assert new_files, "append produced no new files"
    epoch_before = catalyst_epoch()
    repo.refresh_agg_index(
        "refresh_rollup",
        spark.read.parquet(*new_files),
        spark.read.parquet(rb),
    )
    assert catalyst_epoch() != epoch_before  # refresh bumps, by contract
    spark.conf.set("spark.linqonsteroids.cacheEpoch", catalyst_epoch())
    q_post = refresh_q()
    post_vals = {r.seg: (r.n, r.psum) for r in q_post.collect()}
    p_post = q_post._jdf.queryExecution().executedPlan().toString()
    assert "refresh_rollup" in p_post and "Aggregate" not in p_post, (
        p_post[:2000]
    )
    want_post = {
        s: (
            pre_vals[s][0] + 25,  # 200 appended rows over 8 segments
            pre_vals[s][1] + sum(i * 3 for i in range(1000, 1200) if i % 8 == s),
        )
        for s in pre_vals
    }
    assert post_vals == want_post, (post_vals, want_post)
    print("PASS agg-mv-refresh-loop")
    spark.conf.set("spark.linqonsteroids.aggindexes", "")

    # --- JVM staleness veto (r12) ------------------------------------------
    # The r11 verdict's one real gap: the on_read_stale snapshot check
    # lived only in the Python optimize() tier, so an extension-loaded
    # session could serve a stale MV between a base append and the next
    # refresh/epoch bump. Now the bridge conf carries the base's
    # jvm_snapshot digest and the rule recomputes it from a live listing,
    # vetoing substitution on mismatch. Story (the JVM twin of the
    # mv_stale_fallback gate): substitute → append (no refresh, no
    # republish) → the SAME session's query computes from BASE (fresh
    # truth, Aggregate back in the plan) → refresh + republish →
    # substitution returns with grown-base values.
    sla_dir = os.path.join(tmp, "sla_repo")
    sb = os.path.join(tmp, "sla_base")
    df.write.mode("overwrite").parquet(sb)
    repo_sla = IndexRepository(spark, sla_dir, refresh_mode="on_read_stale")
    repo_sla.add_agg_index(
        "sla_rollup",
        lift(spark.read.parquet(sb), table="sbase").index_by(lambda t: t.seg),
        sums=["payload"],
    )
    repo_sla.add_partitioned_index(
        "sla_seg_idx",
        lift(spark.read.parquet(sb), table="sbase").index_by(lambda t: t.seg),
    )
    agg_conf = repo_sla.catalyst_agg_conf({"sbase": sb})
    idx_conf = repo_sla.catalyst_conf({"sbase": sb})
    # on_read_stale entries carry the 4th digest field
    assert agg_conf.count(",") == 3 and idx_conf.count(",") == 3, (
        agg_conf,
        idx_conf,
    )
    spark.conf.set("spark.linqonsteroids.aggindexes", agg_conf)
    spark.conf.set("spark.linqonsteroids.indexes", idx_conf)
    spark.conf.set("spark.linqonsteroids.cacheEpoch", catalyst_epoch())

    def sla_rollup_q():
        return (
            spark.read.parquet(sb)
            .groupBy("seg")
            .agg(F.count("*").alias("n"), F.sum("payload").alias("psum"))
        )

    q_fresh = sla_rollup_q()
    fresh_vals = {r.seg: (r.n, r.psum) for r in q_fresh.collect()}
    p_fresh = q_fresh._jdf.queryExecution().executedPlan().toString()
    assert "sla_rollup" in p_fresh and "Aggregate" not in p_fresh, (
        p_fresh[:2000]
    )
    qf = spark.read.parquet(sb).filter(F.col("seg") == 2)
    pf = qf._jdf.queryExecution().executedPlan().toString()
    assert "sla_seg_idx" in pf, pf[:2000]
    n_filter_fresh = qf.count()
    # append behind the rule's back: no refresh, no conf republish, no
    # epoch bump — exactly the window the veto closes
    sla_delta = spark.range(2000, 2160).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).alias("seg"),
        (F.col("id") * 3).alias("payload"),
    )
    sla_delta.write.mode("append").parquet(sb)
    q_stale = sla_rollup_q()
    p_stale = q_stale._jdf.queryExecution().executedPlan().toString()
    assert "sla_rollup" not in p_stale and "Aggregate" in p_stale, (
        p_stale[:2000]
    )
    stale_vals = {r.seg: (r.n, r.psum) for r in q_stale.collect()}
    want_stale = {
        s: (
            fresh_vals[s][0] + 20,  # 160 appended rows over 8 segments
            fresh_vals[s][1]
            + sum(i * 3 for i in range(2000, 2160) if i % 8 == s),
        )
        for s in fresh_vals
    }
    assert stale_vals == want_stale, (stale_vals, want_stale)
    # filter-index tier vetoes too: back on the base scan, fresh count
    qf2 = spark.read.parquet(sb).filter(F.col("seg") == 2)
    pf2 = qf2._jdf.queryExecution().executedPlan().toString()
    assert "sla_seg_idx" not in pf2, pf2[:2000]
    assert qf2.count() == n_filter_fresh + 20
    # refresh both MVs, republish (digests advanced), and substitution
    # returns — now answering grown-base truth from the MVs
    repo_sla.refresh_agg_index(
        "sla_rollup", sla_delta, spark.read.parquet(sb)
    )
    repo_sla.refresh("sla_seg_idx", spark.read.parquet(sb))
    spark.conf.set(
        "spark.linqonsteroids.aggindexes",
        repo_sla.catalyst_agg_conf({"sbase": sb}),
    )
    spark.conf.set(
        "spark.linqonsteroids.indexes",
        repo_sla.catalyst_conf({"sbase": sb}),
    )
    spark.conf.set("spark.linqonsteroids.cacheEpoch", catalyst_epoch())
    q_back = sla_rollup_q()
    p_back = q_back._jdf.queryExecution().executedPlan().toString()
    assert "sla_rollup" in p_back and "Aggregate" not in p_back, (
        p_back[:2000]
    )
    assert {r.seg: (r.n, r.psum) for r in q_back.collect()} == want_stale
    qf3 = spark.read.parquet(sb).filter(F.col("seg") == 2)
    pf3 = qf3._jdf.queryExecution().executedPlan().toString()
    assert "sla_seg_idx" in pf3, pf3[:2000]
    assert qf3.count() == n_filter_fresh + 20
    print("PASS mv-staleness-veto")
    spark.conf.set("spark.linqonsteroids.aggindexes", "")

    # no-registry and non-indexed-column queries must be untouched
    spark.conf.set("spark.linqonsteroids.indexes", "")
    p3 = (
        spark.read.parquet(base_path)
        .filter(F.col("seg") == 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert os.path.basename(base_path) in p3
    spark.conf.set("spark.linqonsteroids.indexes", f"{base_path},seg,{idx_path}")
    p4 = (
        spark.read.parquet(base_path)
        .filter(F.col("payload") == 30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert os.path.basename(base_path) in p4
    print("PASS no-false-rewrites")
    spark.stop()


if __name__ == "__main__":
    main()
