"""Iterate-to-fixpoint operators: Fix and TransitiveClosure.

Reference: ``src/main/scala/ivm/expressiontree/Fix.scala:4-41`` — ``Fix``
re-applies ``f`` until the collection stops growing; ``TransitiveClosure``
is its flagship instantiation (``FixpointTest.scala:20-22``).

Spark-first design: semi-naive evaluation — each iteration joins only the
*frontier* (new pairs) against the base edges, unions, dedups, and
localCheckpoints to truncate lineage (otherwise the plan doubles per
iteration and the driver OOMs long before the data does). At 100 TB the
join shuffles edges on dst each round: localCheckpoint materializes the
RDD but drops its outputPartitioning (measured — a repartition("dst")
before the checkpoint does not reduce the next round's exchange count),
so the per-round cost floor is one edge shuffle + one label shuffle. On a
real cluster, persisting edges bucketed by dst (write_bucketed_table)
would eliminate the edge-side exchange; iteration count is the knob that
matters first.
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


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) where component = smallest node id reachable
    through the undirected ``pairs`` relation — min-label propagation to
    fixpoint (a ``Fix`` instantiation, like TransitiveClosure).

    This is the dedup-pipeline closer: near-dup candidate PAIRS become
    keep/drop decisions only after clustering (keep one representative per
    component). Label propagation shuffles |edges| per round and converges
    in O(component diameter) rounds — duplicate clusters are shallow, so
    this beats materializing the full transitive closure (quadratic pairs
    inside large clusters)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        if new_labels.join(labels, ["node", "label"], "left_anti").isEmpty():
            return new_labels
        labels = new_labels
    return labels


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
