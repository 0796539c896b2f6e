"""Interval-overlap join: all (left, right) pairs whose intervals overlap.

The join shape the reference's flatMap-comprehension semantics can only
express as cross+filter (SURVEY §2.3 "arbitrary θ via cross+filter") and
that Spark would also execute as a broadcast-nested-loop or cartesian
unless rewritten — which at any real size is quadratic death. This
operator is the standard GRID-BUCKETED rewrite (the banded spatial-join
1D case): snap every interval to fixed-size grid cells, equi-join on
(key, cell), and keep a pair only (a) if the intervals truly overlap and
(b) at the pair's FIRST shared cell — a row-local claim that emits every
qualifying pair exactly once with NO distinct() shuffle (the same
dedup-by-construction trick as dedup/simhash.py's canonical combination).

Scale: candidates per cell are |left ∩ cell| × |right ∩ cell| — bounded
by density per grid cell, not by relation size; ``cell_size`` trades
explode fan-out (≈ span/cell_size rows per interval) against per-cell
candidate quadratics, and should sit near the TYPICAL interval span.
Everything is one explode per side + one equi-join shuffled on
(key, cell): Catalyst picks broadcast/SMJ per stats as usual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    cell_size: int,
    keys: list[str] | None = None,
    closed: bool = True,
) -> DataFrame:
    """Pairs (left row × right row) with ``max(starts) <= / < min(ends)``.

    ``keys``: optional equi-key columns present on BOTH sides (e.g. a
    user id) — the grid join includes them, so only same-key intervals
    ever meet. ``closed=True`` counts touching endpoints as overlap.
    Start/end columns must be integral (epochs, positions); output has
    all left columns plus all right columns (caller aliases collisions).
    """
    keys = keys or []

    def cells(start: str, end: str) -> Column:
        return F.sequence(
            F.floor(F.col(start) / cell_size).cast("long"),
            F.floor(F.col(end) / cell_size).cast("long"),
        )

    l = left.withColumn("_cell", F.explode(cells(l_start, l_end)))
    r = right.withColumn("_cell", F.explode(cells(r_start, r_end)))
    c = l["_cell"] == r["_cell"]
    for k in keys:
        c = c & (l[k] == r[k])
    joined = l.join(r, c)
    lo = F.greatest(l[l_start], r[r_start])
    hi = F.least(l[l_end], r[r_end])
    overlap = (lo <= hi) if closed else (lo < hi)
    # first shared cell: claim exactly once, row-locally
    first_shared = F.greatest(
        F.floor(l[l_start] / cell_size).cast("long"),
        F.floor(r[r_start] / cell_size).cast("long"),
    )
    return (
        joined.filter(overlap & (l["_cell"] == first_shared))
        .drop(l["_cell"])
        .drop(r["_cell"])
    )
