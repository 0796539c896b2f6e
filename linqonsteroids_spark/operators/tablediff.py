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
- ``snapshot_diff_columns`` answers the follow-up reconciliation
  question (WHICH columns changed) from per-column digests compared in
  the SAME join — still O(8 bytes x n_cols) per row shuffled, never
  payloads.
- ``snapshot_diff_bucketed`` is the incremental-cost variant: bucket
  digest summaries (bit_xor + count) compare first, and the row-level
  join runs only over disagreeing buckets — O(changed partition) when
  reconciliation is mostly confirmation.
- ``write_digest_manifest`` / ``audit_against_manifest`` persist that
  bucket summary as a KB-sized sidecar, so drift/corruption since the
  last audit is detectable WITHOUT the old snapshot — one scan plus a
  driver-side compare, with repair scoped to the changed buckets.
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


def snapshot_diff_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 256,
    bucket_expr=None,
) -> tuple[DataFrame, list[int], int]:
    """Hierarchical reconciliation: compare per-BUCKET digests first,
    run the row-level diff only over buckets whose digests disagree.
    Returns ``(diff, changed_buckets, n_buckets)`` where ``diff`` has
    :func:`snapshot_diff`'s exact schema and classification.

    Why this exists at 100 TB: the flat diff's full-outer join shuffles
    EVERY key's (key, digest) pair even when 99.9% of the table is
    unchanged — reconciliation runs are mostly confirmations. Here each
    side first reduces to ``n_buckets`` rows (bucket = pmod(xxhash64(
    keys), n), digest = bit_xor of row digests + a count — commutative
    and order-independent, so no sort and no overflow), the two bucket
    summaries join broadcast-small, and the expensive row-level
    full-outer join reads and shuffles ONLY the touched buckets'
    rows: cost O(|changed partition of the table|), the incremental-
    maintenance shape (same economics as operators/mor.py's touched-
    bucket reads). The changed-bucket list is a driver-side collect
    bounded by ``n_buckets``, never by table size.

    The summary digest folds in the KEY columns, unlike the row-level
    digest (which compares within a key via the join): xor cancels
    PAIRS of equal values, so two different keys carrying identical
    payloads that both change identically would otherwise cancel out
    of their shared bucket's xor — caught by the gate differential on
    real TPC-H data (two %103 null-swap keys sharing a bucket and a
    status value), pinned in tests. With the key folded in, cancelling
    requires a genuine 64-bit collision.

    Probabilistic caveat (documented, same class as the row digest
    itself): a bucket whose xor-of-digests AND count both collide
    across a real change set is a 64-bit-collision event; any single
    row change flips its bucket's xor with certainty (the summary
    digests differ, and xor with a distinct value changes the sum).
    """
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    _assert_types_agree(left, right, [*keys, *compare_cols])
    # bucket_expr lets callers use an oracle-replayable or layout-aligned
    # bucketing (e.g. key % N, or the table's physical partition column
    # so phase 2 prunes FILES too); default is hash-uniform.
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    ).cast("int")
    # keys folded in: xor-cancellation needs a hash collision, not just
    # duplicate payloads (see docstring)
    digest = _row_digest([*keys, *compare_cols])

    def summary(df: DataFrame) -> DataFrame:
        return (
            df.select(bucket.alias("_b"), digest.alias("_d"))
            .groupBy("_b")
            .agg(
                F.bit_xor("_d").alias("_bx"),
                F.count("*").alias("_bn"),
            )
        )

    l_sum = summary(left).withColumnsRenamed({"_bx": "_bxl", "_bn": "_bnl"})
    r_sum = summary(right).withColumnsRenamed({"_bx": "_bxr", "_bn": "_bnr"})
    changed_rows = (
        l_sum.join(r_sum, "_b", "full_outer")
        .where(
            ~(
                F.col("_bxl").eqNullSafe(F.col("_bxr"))
                & F.col("_bnl").eqNullSafe(F.col("_bnr"))
            )
        )
        .select("_b")
        .collect()
    )  # bounded by n_buckets, never by table size
    changed = sorted(r["_b"] for r in changed_rows)
    if not changed:
        empty = snapshot_diff(left.limit(0), right.limit(0), keys, compare_cols)
        return empty, changed, n_buckets
    diff = snapshot_diff(
        left.where(bucket.isin(changed)),
        right.where(bucket.isin(changed)),
        keys,
        compare_cols,
    )
    return diff, changed, n_buckets


_DIGEST_MANIFEST = "_DIGEST_MANIFEST.json"


def write_digest_manifest(
    df: DataFrame,
    path: str,
    keys: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 256,
    bucket_expr=None,
) -> None:
    """Persist the table's bucket-digest summary as a tiny sidecar, so a
    FUTURE audit can answer "did anything change since, and roughly
    where" without retaining the old snapshot at all — the missing
    temporal leg of :func:`snapshot_diff_bucketed` (which needs both
    snapshots live). One scan, n_buckets x (xor-digest, count) rows,
    a few KB of JSON regardless of table size; published through the
    commit seam (atomic, no torn sidecars)."""
    import json
    import os

    from linqonsteroids_spark.sources.commitlog import atomic_replace

    if compare_cols is None:
        compare_cols = [c for c in df.columns if c not in keys]
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    )
    rows = (
        df.select(
            bucket.cast("int").alias("_b"),
            _row_digest([*keys, *compare_cols]).alias("_d"),
        )
        .groupBy("_b")
        .agg(F.bit_xor("_d").alias("_bx"), F.count("*").alias("_bn"))
        .collect()
    )  # bounded by n_buckets
    manifest = {
        "keys": keys,
        "compare_cols": compare_cols,
        "n_buckets": n_buckets,
        "buckets": {str(r["_b"]): [r["_bx"], r["_bn"]] for r in rows},
    }
    tmp = os.path.join(path, _DIGEST_MANIFEST + ".tmp")
    os.makedirs(path, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    atomic_replace(tmp, os.path.join(path, _DIGEST_MANIFEST))


def update_digest_manifest(
    path: str,
    before: DataFrame | None,
    after: DataFrame | None,
    bucket_expr=None,
) -> None:
    """Incrementally maintain a digest manifest from a KNOWN change set
    — O(|changes|), no rescan of the table. ``before`` holds the full
    OLD rows of every removed-or-changed key; ``after`` the full NEW
    rows of every added-or-changed key (exactly what
    :func:`snapshot_diff` semi-joins produce, or what a CDC feed's
    before/after images carry). xor is its own inverse, so per bucket::

        xor' = xor ⊕ xor(digests(before)) ⊕ xor(digests(after))
        n'   = n - |before| + |after|

    which equals the full-rescan summary BY ALGEBRA, not by trust —
    and the audit gate re-verifies the equality empirically. A bucket
    whose count reaches 0 must also reach xor 0; anything else means
    the supplied change set was wrong (rows missing or duplicated) and
    the update REFUSES rather than publishing a corrupt manifest. The
    manifest's stored key/column/bucket config is authoritative. At
    100 TB this is the difference between a nightly full-scan audit
    artifact and one maintained per ingest batch.

    Per-ingest-batch maintenance means CONCURRENT updaters are the
    normal case, and load→merge→publish is exactly the check-then-swap
    shape the commit seam's ``commit_lock`` exists for (two unserialized
    updaters would base their merge on the same stored state and the
    second publish would silently discard the first change set — the
    r13 verdict's lost-update finding). The Spark jobs that digest the
    change set run BEFORE the lock is taken — the manifest's key/column/
    bucket config is immutable after ``write_digest_manifest``, so the
    digests don't depend on the contended state — and the critical
    section is only the metadata read-merge-publish, per the seam's
    "never hold the lock while writing data" rule.
    """
    import json
    import os

    from linqonsteroids_spark.sources.commitlog import (
        atomic_replace,
        commit_lock,
    )

    manifest_path = os.path.join(path, _DIGEST_MANIFEST)
    with open(manifest_path) as f:
        cfg = json.load(f)  # immutable config part only, read unlocked
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(
            F.xxhash64(*[F.col(k) for k in cfg["keys"]]),
            F.lit(cfg["n_buckets"]),
        )
    )

    def side(df: DataFrame | None):
        if df is None:
            return []
        return (
            df.select(
                bucket.cast("int").alias("_b"),
                _row_digest([*cfg["keys"], *cfg["compare_cols"]]).alias("_d"),
            )
            .groupBy("_b")
            .agg(F.bit_xor("_d").alias("_bx"), F.count("*").alias("_bn"))
            .collect()
        )  # bounded by n_buckets

    sides = [(side(before), -1), (side(after), +1)]
    with commit_lock(manifest_path + ".lock"):
        with open(manifest_path) as f:
            m = json.load(f)  # re-read: another updater may have won
        merged: dict[int, list[int]] = {
            int(b): [x, n] for b, (x, n) in m["buckets"].items()
        }
        for rows, sign in sides:
            for r in rows:
                x, n = merged.setdefault(r["_b"], [0, 0])
                merged[r["_b"]] = [x ^ r["_bx"], n + sign * r["_bn"]]
        for b, (x, n) in list(merged.items()):
            if n < 0 or (n == 0 and x != 0):
                raise ValueError(
                    f"inconsistent change set for bucket {b}: count {n}, "
                    f"xor {x} — before/after rows are missing or duplicated; "
                    "manifest left untouched"
                )
            if n == 0:
                del merged[b]
        m["buckets"] = {str(b): v for b, v in merged.items()}
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        atomic_replace(tmp, manifest_path)


def audit_against_manifest(
    df: DataFrame, path: str, bucket_expr=None
) -> dict:
    """Compare a LIVE table against a stored digest manifest: returns
    ``{"clean": bool, "changed_buckets": [...], "n_buckets": N,
    "row_delta": int}``. Bucket-level localization only — the old rows
    are gone, so row-level classification is impossible BY DESIGN; what
    this buys at 100 TB is the scheduled "has anything drifted since
    the last audit" check (replica verification, corruption detection,
    unexpected-writer detection) at one scan + a KB-sized compare,
    with any follow-up repair scoped to ``changed_buckets`` (e.g. a
    bucket-filtered re-copy from the source of truth)."""
    import json
    import os

    with open(os.path.join(path, _DIGEST_MANIFEST)) as f:
        m = json.load(f)
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(
            F.xxhash64(*[F.col(k) for k in m["keys"]]), F.lit(m["n_buckets"])
        )
    )  # MUST match the expr the manifest was written with
    rows = (
        df.select(
            bucket.cast("int").alias("_b"),
            _row_digest([*m["keys"], *m["compare_cols"]]).alias("_d"),
        )
        .groupBy("_b")
        .agg(F.bit_xor("_d").alias("_bx"), F.count("*").alias("_bn"))
        .collect()
    )
    live = {r["_b"]: (r["_bx"], r["_bn"]) for r in rows}
    stored = {int(b): (x, n) for b, (x, n) in m["buckets"].items()}
    changed = sorted(
        b
        for b in set(live) | set(stored)
        if live.get(b) != stored.get(b)
    )
    row_delta = sum(n for _, n in live.values()) - sum(
        n for _, n in stored.values()
    )
    return {
        "clean": not changed,
        "changed_buckets": changed,
        "n_buckets": m["n_buckets"],
        "row_delta": row_delta,
    }


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
