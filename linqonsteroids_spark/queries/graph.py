"""Fixpoint / transitive-closure queries (SURVEY §2.4: Fix / TransitiveClosure).

Reference: ``expressiontree/Fix.scala:4-41`` — naive fixpoint iteration;
``FixpointTest.scala:20-22``. Spark has no native recursion (< 4.0 SQL), so
the operator is an iterative DataFrame loop with per-iteration dedup and
localCheckpoint to truncate lineage — the GraphFrames pattern. The oracle is
DuckDB's WITH RECURSIVE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.operators.fixpoint import transitive_closure


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic synthetic relation from catalog data: nation k → (k*7+3) % 25
    # is a permutation of 0..24 → closure = all pairs within each cycle.
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.col("n_nationkey").cast("int").alias("src"),
        ((F.col("n_nationkey") * 7 + 3) % 25).cast("int").alias("dst"),
    )


def nation_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transitive_closure(_edges(spark, sf_dir), max_iterations=32)


NATION_TC_SQL = """
WITH RECURSIVE tc(src, dst) AS (
  SELECT CAST(n_nationkey AS INT) AS src,
         CAST((n_nationkey * 7 + 3) % 25 AS INT) AS dst FROM nation
  UNION
  SELECT tc.src, e.dst
  FROM tc JOIN (SELECT CAST(n_nationkey AS INT) AS src,
                       CAST((n_nationkey * 7 + 3) % 25 AS INT) AS dst
                FROM nation) e
       ON tc.dst = e.src
)
SELECT src, dst FROM tc
"""


QUERIES = {
    "nation_transitive_closure": (nation_transitive_closure, NATION_TC_SQL),
}
