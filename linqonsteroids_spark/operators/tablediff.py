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
- Spark's hash functions SKIP null inputs (the seed passes through
  unchanged), so ``xxhash64(NULL, 'a') == xxhash64('a', NULL) ==
  xxhash64('a')`` — a value MOVING between two same-typed compared
  columns would digest as unchanged. The digest therefore also folds in
  each column's null-ness as a boolean (never null itself), pinning
  every column's position: any null/non-null flip changes the digest.
- ``with_changed_columns`` answers the follow-up reconciliation question
  (WHICH columns changed) from per-column digests compared in the SAME
  join — still O(8 bytes x n_cols) per row shuffled, never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assert_types_agree(
    left: DataFrame, right: DataFrame, cols: list[str]
) -> None:
    for c in cols:
        lt, rt = left.schema[c].dataType, right.schema[c].dataType
        if lt != rt:
            raise ValueError(
                f"snapshot_diff column {c!r} types differ ({lt} vs {rt}): "
                "xxhash64 is type-sensitive — cast both sides first"
            )


def _row_digest(compare_cols: list[str]):
    """Null-position-aware row digest.

    The per-column ``isNull`` booleans are never null, so they always
    contribute to the hash — disambiguating ``(x, NULL)`` from
    ``(NULL, x)`` which the raw value hash (null-skipping) conflates.
    """
    return F.xxhash64(
        *[F.col(c) for c in compare_cols],
        *[F.col(c).isNull() for c in compare_cols],
    )


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
    _assert_types_agree(left, right, [*keys, *compare_cols])
    digest = _row_digest(compare_cols)
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


def snapshot_diff_columns(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """:func:`snapshot_diff` plus ``changed_columns`` — the sorted array
    of column names whose value differs, for 'changed' rows (empty array
    for added/removed, whose whole row appeared or vanished).

    Per-column digests ride the SAME full-outer join as the row digest:
    each side shuffles ``(keys, row_digest, one 8-byte digest per
    compared column)`` — still never the payload — and the per-column
    compare happens post-join on digest equality. A column digest folds
    in its own null-ness, so NULL→value and value→NULL both register."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    _assert_types_agree(left, right, [*keys, *compare_cols])

    def side(df: DataFrame, tag: str) -> DataFrame:
        per_col = [
            F.xxhash64(F.col(c), F.col(c).isNull()).alias(f"_{tag}_{c}")
            for c in compare_cols
        ]
        return df.select(
            *keys, _row_digest(compare_cols).alias(f"_d{tag}"), *per_col
        )

    joined = side(left, "l").join(side(right, "r"), keys, "full_outer")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        F.col(f"_l_{c}") != F.col(f"_r_{c}"), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return joined.select(
        *keys,
        F.when(F.col("_dl").isNull(), F.lit("added"))
        .when(F.col("_dr").isNull(), F.lit("removed"))
        .when(F.col("_dl") != F.col("_dr"), F.lit("changed"))
        .alias("change_type"),
        F.when(
            F.col("_dl").isNotNull() & F.col("_dr").isNotNull(),
            changed_cols,
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_columns"),
    ).where(F.col("change_type").isNotNull())
