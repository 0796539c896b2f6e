"""Round-15 interleaved A/B harness for triangle_count_coparts and
lsh_recall_report variants. Variants run interleaved in ONE session so
host drift hits all arms equally. Timing action: guide-§1.4 noop sink.

Usage: python tools/ab_r15.py <triangle|lsh> [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def coparts_edges_old(spark, sf_dir) -> DataFrame:
    """Pre-r15 edge generation: SMJ self-join on the order key."""
    from linqonsteroids_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("lo"), F.col("b.p").alias("hi"))
        .distinct()
    )


def coparts_edges_new(spark, sf_dir) -> DataFrame:
    """r15 edge generation: groupBy + row-local i<j expansion."""
    from linqonsteroids_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    buckets = op.groupBy("o").agg(F.array_sort(F.collect_list("p")).alias("ps"))
    pairs = F.flatten(
        F.expr(
            "transform(ps, (x, i) -> "
            "transform(slice(ps, i + 2, size(ps) - i - 1), "
            "y -> struct(x AS lo, y AS hi)))"
        )
    )
    return (
        buckets.filter(F.size("ps") > 1)
        .select(F.explode(pairs).alias("e"))
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
        .distinct()
    )


def triangle_from(edges: DataFrame, ckpt_edges: bool, ckpt_oriented: bool) -> DataFrame:
    from linqonsteroids_spark.operators.triangles import orient_edges

    if ckpt_edges:
        edges = edges.localCheckpoint(eager=True)
    oriented = orient_edges(edges)
    if ckpt_oriented:
        oriented = oriented.localCheckpoint(eager=True)
    a = oriented.select(F.col("src").alias("pivot"), F.col("dst").alias("b"))
    c = oriented.select(F.col("src").alias("pivot"), F.col("dst").alias("c"))
    wedges = a.join(c, "pivot").filter(F.col("b") < F.col("c"))
    closing = edges.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    return (
        wedges.join(closing, ["b", "c"], "left_semi")
        .agg(F.count("*").alias("n_triangles"))
    )


def triangle_variants(spark, sf_dir):
    return {
        "A_head_lazy_selfjoin": lambda: triangle_from(
            coparts_edges_old(spark, sf_dir), False, False
        ),
        "B_grp_ckpt_both": lambda: triangle_from(
            coparts_edges_new(spark, sf_dir), True, True
        ),
        "C_grp_ckpt_edges": lambda: triangle_from(
            coparts_edges_new(spark, sf_dir), True, False
        ),
        "D_grp_lazy": lambda: triangle_from(
            coparts_edges_new(spark, sf_dir), False, False
        ),
    }


def lsh_variants(spark, sf_dir):
    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.dedup.minhash import lsh_candidate_pairs
    from linqonsteroids_spark.dedup.ngram import jaccard_pairs
    from linqonsteroids_spark.queries.dedup import JACCARD_THRESHOLD

    def report_from(truth: DataFrame, cand: DataFrame) -> DataFrame:
        n_true = truth.agg(F.count("*").alias("n_true"))
        n_cand = cand.agg(F.count("*").alias("n_candidates"))
        n_hit = truth.join(cand, ["id_a", "id_b"]).agg(
            F.count("*").alias("n_hits")
        )
        return (
            n_true.crossJoin(F.broadcast(n_cand))
            .crossJoin(F.broadcast(n_hit))
            .select(
                "n_true",
                "n_candidates",
                "n_hits",
                F.expr("n_hits * 1000000L div greatest(n_true, 1L)").alias(
                    "recall_ppm"
                ),
                F.expr(
                    "n_hits * 1000000L div greatest(n_candidates, 1L)"
                ).alias("precision_ppm"),
            )
        )

    def lazy():
        docs = load_table(spark, sf_dir, "documents")
        truth = jaccard_pairs(docs, threshold=JACCARD_THRESHOLD).select(
            "id_a", "id_b"
        )
        cand = lsh_candidate_pairs(docs).select("id_a", "id_b")
        return report_from(truth, cand)

    def ckpt():
        docs = load_table(spark, sf_dir, "documents")
        truth = (
            jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        cand = lsh_candidate_pairs(docs).select("id_a", "id_b").localCheckpoint(
            eager=True
        )
        return report_from(truth, cand)

    def full_outer():
        docs = load_table(spark, sf_dir, "documents")
        truth = jaccard_pairs(docs, threshold=JACCARD_THRESHOLD).select(
            "id_a", "id_b", F.lit(1).alias("t")
        )
        cand = lsh_candidate_pairs(docs).select(
            "id_a", "id_b", F.lit(1).alias("c")
        )
        j = truth.join(cand, ["id_a", "id_b"], "full_outer")
        return j.agg(
            F.count("t").alias("n_true"),
            F.count("c").alias("n_candidates"),
            F.count(F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1)).alias(
                "n_hits"
            ),
        ).select(
            "n_true",
            "n_candidates",
            "n_hits",
            F.expr("n_hits * 1000000L div greatest(n_true, 1L)").alias(
                "recall_ppm"
            ),
            F.expr("n_hits * 1000000L div greatest(n_candidates, 1L)").alias(
                "precision_ppm"
            ),
        )

    return {"A_head_lazy": lazy, "B_ckpt": ckpt, "E_full_outer": full_outer}


def main() -> None:
    args = sys.argv[1:]
    which = args[0]
    reps = 5
    sf_dir = "/root/testdata/sf0.1"
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]

    from linqonsteroids_spark.session import get_spark

    spark = get_spark("ab_r15")
    variants = (
        triangle_variants(spark, sf_dir)
        if which == "triangle"
        else lsh_variants(spark, sf_dir)
    )

    # result equality check first (the point of the exercise is identity)
    rows = {k: [tuple(r) for r in fn().collect()] for k, fn in variants.items()}
    base = rows[next(iter(rows))]
    for k, r in rows.items():
        status = "OK" if sorted(map(str, r)) == sorted(map(str, base)) else "MISMATCH"
        print(f"result {k}: {status} {r[:2]}", flush=True)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab {which} {k} rep{rep}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(
            f"{k}: median {statistics.median(ts):.3f}s "
            f"({', '.join(f'{t:.3f}' for t in ts)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
