"""Interleaved A/B for the r15 jaccard_pairs rewrite (old SMJ self-join
vs bucket-grouped expansion + localCheckpoint). One session so ambient
drift hits both arms. Timing action: guide-§1.4 noop sink over the full
dedup_ngram_jaccard result (threshold filter + ordering identical).

Usage: python tools/ab_jaccard.py [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_old(docs, threshold, df_cap=512, id_col="doc_id", text_col="text"):
    from linqonsteroids_spark.dedup.ngram import shingles_df

    sh = shingles_df(docs, id_col, text_col).distinct()
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    kept = sh.join(
        df_counts.filter(F.col("df") <= df_cap).select("shingle"), "shingle"
    )
    sizes = kept.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = kept.select(F.col("shingle"), F.col(id_col).alias("id_a"))
    b = kept.select(
        F.col("shingle").alias("shingle_b"), F.col(id_col).alias("id_b")
    )
    inter = (
        a.join(b, (a.shingle == b.shingle_b) & (a.id_a < b.id_b))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    sf_dir = "/root/testdata/sf0.1"
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.dedup.ngram import jaccard_pairs
    from linqonsteroids_spark.queries.dedup import JACCARD_THRESHOLD
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("ab_jaccard")
    docs = load_table(spark, sf_dir, "documents")

    variants = {
        "A_old_selfjoin": lambda: jaccard_old(docs, JACCARD_THRESHOLD),
        "B_new_grouped": lambda: jaccard_pairs(docs, threshold=JACCARD_THRESHOLD),
    }

    rows = {
        k: sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9)) for r in fn().collect()
        )
        for k, fn in variants.items()
    }
    base = rows[next(iter(rows))]
    for k, r in rows.items():
        print(f"result {k}: {'OK' if r == base else 'MISMATCH'} n={len(r)}")

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab jaccard {k} rep{rep}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(
            f"{k}: median {statistics.median(ts):.3f}s "
            f"({', '.join(f'{t:.3f}' for t in ts)})"
        )


if __name__ == "__main__":
    main()
