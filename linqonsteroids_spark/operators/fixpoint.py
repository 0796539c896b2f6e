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

    Path doubling: after round i, ``acc`` holds all paths of length ≤ 2^i,
    so a diameter-D graph converges in ⌈log₂ D⌉ joins instead of D —
    iteration count (and localCheckpoint barriers) is the dominant cost of
    iterative DataFrame algorithms at every scale.
    """
    acc = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        a = acc.select(F.col("src").alias("a_src"), F.col("dst").alias("a_dst"))
        b = acc.select(F.col("src").alias("b_src"), F.col("dst").alias("b_dst"))
        new_pairs = (
            a.join(b, a.a_dst == b.b_src)
            .select(F.col("a_src").alias("src"), F.col("b_dst").alias("dst"))
            .distinct()
        )
        delta = new_pairs.join(acc, on=["src", "dst"], how="left_anti").localCheckpoint(
            eager=True
        )
        if delta.isEmpty():
            return acc
        acc = acc.unionByName(delta).localCheckpoint(eager=True)
    return acc
