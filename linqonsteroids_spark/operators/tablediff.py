"""Snapshot reconciliation: row-level diff of two table versions.

The CDC family (queries/cdc.py, streaming/incremental.py) consumes KNOWN
change feeds; this operator answers the complementary maintenance
question — given two arbitrary snapshots of a keyed table (yesterday's
backup vs today's, a replica vs its source, pre- vs post-migration),
WHAT changed: every key classified added / removed / changed, without
trusting any log. The reference has no reconciliation surface (dead IVM
code aside); this is a north-star addition in the table-maintenance tier
alongside compaction and the freshness SLA.

Scale design (100 TB vs 100 TB):
- Each side is reduced to ``(keys…, xxhash64(all compared columns))``
  BEFORE the join — the shuffle moves ~16 bytes of digest per row plus
  the key, never the row payload, and the scan is column-pruned to
  exactly the compared columns.
- One full-outer shuffle join on the key is the entire plan; output is
  bounded by the CHANGE volume (unchanged rows are dropped by a digest
  equality filter before anything widens).
- xxhash64 is input-TYPE sensitive (INT 5 != BIGINT 5 — this repo's own
  bloomjoin note), so both sides must present identical column types;
  the operator asserts schema agreement rather than silently hashing
  incomparable values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keys plus ``change_type`` ∈ {'added', 'removed', 'changed'} for
    every key whose row differs between ``left`` (the old snapshot) and
    ``right`` (the new one). Unchanged keys are filtered out digest-side
    and never leave the join.

    ``compare_cols`` defaults to every shared non-key column. Keys must
    be unique per side (snapshot semantics); duplicate keys make
    'changed' ill-defined and are the caller's bug to fix upstream."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    for c in [*keys, *compare_cols]:
        lt, rt = left.schema[c].dataType, right.schema[c].dataType
        if lt != rt:
            raise ValueError(
                f"snapshot_diff column {c!r} types differ ({lt} vs {rt}): "
                "xxhash64 is type-sensitive — cast both sides first"
            )
    digest = F.xxhash64(*[F.col(c) for c in compare_cols])
    l = left.select(*keys, digest.alias("_dl"))
    r = right.select(*keys, digest.alias("_dr"))
    joined = l.join(r, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_dl").isNull(), F.lit("added"))
        .when(F.col("_dr").isNull(), F.lit("removed"))
        .when(F.col("_dl") != F.col("_dr"), F.lit("changed"))
        .alias("change_type"),
    ).where(F.col("change_type").isNotNull())
