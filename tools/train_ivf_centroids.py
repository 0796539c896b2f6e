"""Regenerate the pretrained IVF centroid artifact.

Usage: python tools/train_ivf_centroids.py [sf_dir] [n_lists]

Trains the same seeded MLlib k-means the online ``ivf_topk`` path uses
(seed 42, initMode random, maxIter 8) on the given corpus sample and
prints the Python literal to paste into
``linqonsteroids_spark/similarity/pretrained.py``.

Real IVF deployments train centroids ONCE on a corpus sample and ship
them as an index artifact alongside the data; queries replay the frozen
centroids. Freezing them in source (rounded to 6 decimals so the Spark
plan literals and the DuckDB oracle literals are character-identical)
makes the production n_probe < n_lists configuration fully
oracle-replayable.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main(sf_dir: str, n_lists: int) -> None:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from linqonsteroids_spark.session import get_spark

    spark = get_spark("train_ivf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    train = emb.withColumn(
        "_v", array_to_vector(F.col("embedding").cast("array<double>"))
    ).cache()
    model = KMeans(
        k=n_lists, seed=42, maxIter=8, initMode="random",
        featuresCol="_v", predictionCol="cell",
    ).fit(train)
    print(f"# trained on {sf_dir} (n={train.count()}), k={n_lists}")
    print("IVF_CENTROIDS = [")
    for c in model.clusterCenters():
        vals = ", ".join(f"{round(float(x), 6)!r}" for x in c)
        print(f"    [{vals}],")
    print("]")


if __name__ == "__main__":
    argv = sys.argv[1:]
    main(argv[0] if argv else "/root/testdata/sf0.01", int(argv[1]) if len(argv) > 1 else 8)
