"""Iterate-to-fixpoint operators: Fix and TransitiveClosure.

Reference: ``src/main/scala/ivm/expressiontree/Fix.scala:4-41`` — ``Fix``
re-applies ``f`` until the collection stops growing; ``TransitiveClosure``
is its flagship instantiation (``FixpointTest.scala:20-22``).

Spark-first design: semi-naive evaluation — each iteration joins only the
*frontier* (new pairs) against the base edges, unions, dedups, and
localCheckpoints to truncate lineage (otherwise the plan doubles per
iteration and the driver OOMs long before the data does). At 100 TB the
join shuffles on dst/src each round; pre-repartitioning base edges by src
lets every round reuse that exchange.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fix(
    initial: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 50,
) -> DataFrame:
    """Least-fixpoint of ``acc ∪ step(frontier)`` under set semantics.

    ``step`` receives the frontier (rows added last round) and returns
    candidate new rows; iteration stops when no new rows appear.
    """
    acc = initial.distinct().localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iterations):
        candidates = step(frontier).distinct()
        frontier = candidates.join(acc, on=list(acc.columns), how="left_anti")
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            return acc
        acc = acc.unionByName(frontier).localCheckpoint(eager=True)
    return acc


def transitive_closure(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """All (src, dst) pairs reachable through the binary relation ``edges``.

    Expected columns: src, dst. Semi-naive: Δ_{i+1} = Δ_i ⋈ edges − acc.
    """
    base = edges.select("src", "dst").distinct()
    # The base relation is probed every iteration — pre-partition by the join
    # key once so each round's join reuses the exchange, and cache it.
    base = base.repartition("src").cache()

    def step(frontier: DataFrame) -> DataFrame:
        f = frontier.select(F.col("src").alias("f_src"), F.col("dst").alias("f_dst"))
        return f.join(base, f.f_dst == base.src).select(
            F.col("f_src").alias("src"), F.col("dst")
        )

    try:
        return fix(base, step, max_iterations=max_iterations)
    finally:
        base.unpersist()
