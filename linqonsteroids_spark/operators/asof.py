"""As-of (temporal) join and range join — operators Spark lacks as built-ins.

Not in the reference either (SURVEY §2.3 "not present"), but table stakes
for an analytics engine; both composed from existing DataFrame ops.

As-of join via the union+window trick: tag left/right rows, union them,
and per key take the last-seen right value before each left row with
``last(..., ignorenulls=True)`` over an ordered window. ONE shuffle on
(key, time) — versus the naive per-row subquery join which is quadratic.
This is the standard scalable formulation; it also dodges the skewed-key
blowup of a band-joined backward search.

Range join: inequality-band join expressed so AQE can pick shuffled
strategies; for dense ranges pre-bucket both sides on coarse bins so the
θ-join becomes bin-equi + residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    strict: bool = True,
    right_tiebreak: str | None = None,
    time_bucket_width: float | None = None,
) -> DataFrame:
    """For each left row: the latest right row with the same key and
    ``right_time < left_time`` (``<=`` when strict=False). Right values
    arrive as ``asof_<col>`` (null if no prior right row).
    ``right_tiebreak`` names a right column breaking equal-timestamp ties
    deterministically (max wins).

    ``time_bucket_width`` (seconds for timestamps, raw units for numeric
    times) bounds hot keys: without it the window partitions by key alone,
    so one hot key serializes into ONE task. With it, rows partition by
    (key, time-bucket) — max task size = rows per key per bucket — and a
    second tiny pass carries the last right row of each bucket forward
    across bucket boundaries (a per-(key,bucket) running ``last``, O(#
    buckets) rows per key, never O(rows)). Results are identical; pinned by
    tests and the ``asof_purchase_click_bucketed`` oracle gate.
    """
    lcols = left.columns
    tb_type = dict(right.dtypes).get(right_tiebreak, "long")
    # all right value columns travel in ONE struct so the matched right row
    # is atomic: filling each column independently would mix columns from
    # different right rows whenever the latest prior row holds a NULL in one
    # of them (and resurrect a stale non-null instead of that row's NULL).
    l_type = left.select(F.struct(*lcols).alias("s")).schema["s"].dataType.simpleString()
    rv_type = (
        right.select(F.struct(*[F.col(c) for c in value_cols]).alias("s"))
        .schema["s"].dataType.simpleString()
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast(tb_type).alias("_tb"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows sort before left rows at equal timestamps iff non-strict;
    # among equal-time right rows the max tiebreak lands nearest (last wins)
    order = [
        F.col("_t"),
        F.col("_side").asc() if not strict else F.col("_side").desc(),
        F.col("_tb").asc_nulls_first(),
    ]
    if time_bucket_width is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        filled = unioned.select(
            "_side",
            "_l",
            F.last(F.col("_rv"), ignorenulls=True).over(w).alias("_asof"),
        )
        return filled.filter(F.col("_side") == 1).select(
            *[F.col(f"_l.{c}").alias(c) for c in lcols],
            *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
        )

    # hot-key-bounded path: window partitions by (key, coarse time bucket);
    # a right row in bucket b-1 is strictly earlier than every left row in
    # bucket b (floor semantics), so the carry-in needs no strict/tiebreak
    # handling — only the in-bucket window does.
    unioned = unioned.withColumn(
        "_b", F.floor(F.col("_t").cast("double") / F.lit(float(time_bucket_width)))
    )
    w_in = (
        Window.partitionBy("_k", "_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # last right row per (key, bucket): max_by over (time, tiebreak) — a
    # pre-aggregated frame with one row per non-empty bucket, tiny next to
    # the data
    bucket_last = (
        unioned.filter(F.col("_side") == 0)
        .groupBy("_k", "_b")
        .agg(F.max_by("_rv", F.struct("_t", "_tb")).alias("_last_rv"))
    )
    # carry chain over ALL buckets that contain any row (gaps in bucket_last
    # must not break the chain)
    w_carry = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        unioned.select("_k", "_b")
        .distinct()
        .join(bucket_last, ["_k", "_b"], "left")
        .withColumn("_carry_rv", F.last("_last_rv", ignorenulls=True).over(w_carry))
        .select("_k", "_b", "_carry_rv")
    )
    filled = (
        unioned.join(carry, ["_k", "_b"], "left")
        .select(
            "_side",
            "_l",
            F.coalesce(
                F.last(F.col("_rv"), ignorenulls=True).over(w_in),
                F.col("_carry_rv"),
            ).alias("_asof"),
        )
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Nearest-neighbor temporal join (pandas ``merge_asof``'s
    ``direction='nearest'``): each left row matches the right row with
    the same key minimizing |right_time - left_time|, BACKWARD winning
    exact |Δ| ties (and equal-time matches counting as backward).

    Composition, not new machinery: one backward pass (non-strict
    as-of) + one forward pass (strict as-of over NEGATED times — "latest
    earlier than -t" is "earliest later than t"), then a row-local pick
    of the closer side. Times must therefore be NUMERIC (cast timestamps
    to epoch integers first); ``tolerance`` (same units) nulls out
    matches farther than it. Adds ``nearest_<col>`` per value column and
    a signed ``nearest_delta`` (right - left). Cost: two as-of shuffles;
    hot keys boundable per pass exactly as ``asof_join``.
    """
    vcols = list(dict.fromkeys([right_time, *value_cols]))
    back = asof_join(
        left, right, on, left_time, right_time, vcols,
        strict=False, right_tiebreak=right_tiebreak,
    ).select(
        *left.columns,
        *[F.col(f"asof_{c}").alias(f"_bk_{c}") for c in vcols],
    )
    lneg = back.withColumn("_lt_neg", -F.col(left_time))
    rneg = right.withColumn("_rt_neg", -F.col(right_time))
    fwd = asof_join(
        lneg, rneg, on, "_lt_neg", "_rt_neg", vcols,
        strict=True, right_tiebreak=right_tiebreak,
    )
    bdelta = F.col(left_time) - F.col(f"_bk_{right_time}")  # >= 0
    fdelta = F.col(f"asof_{right_time}") - F.col(left_time)  # > 0
    b_ok = F.col(f"_bk_{right_time}").isNotNull()
    f_ok = F.col(f"asof_{right_time}").isNotNull()
    if tolerance is not None:
        b_ok = b_ok & (bdelta <= tolerance)
        f_ok = f_ok & (fdelta <= tolerance)
    use_back = b_ok & (~f_ok | (bdelta <= fdelta))
    use_fwd = f_ok & ~use_back
    out_cols = [F.col(c) for c in left.columns]
    for c in vcols:
        out_cols.append(
            F.when(use_back, F.col(f"_bk_{c}"))
            .when(use_fwd, F.col(f"asof_{c}"))
            .alias(f"nearest_{c}")
        )
    out_cols.append(
        F.when(use_back, -bdelta).when(use_fwd, fdelta).alias("nearest_delta")
    )
    return fwd.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: int | None = None,
) -> DataFrame:
    """Rows where ``right_lo <= left_point < right_hi``.

    With ``bin_width``: both sides bucket to coarse bins (interval sides
    explode over covered bins) → bin-equi join + residual predicate; the
    cross-product is bounded per bin instead of global.
    """
    if bin_width is None:
        cond = (left[left_point] >= right[right_lo]) & (left[left_point] < right[right_hi])
        return left.join(right, cond)
    # floor(), not cast-truncate: correct for negative values too. The upper
    # bin is floor(hi/width) — NOT floor((hi-1)/width), which skips the final
    # partial bin for fractional hi (e.g. hi=100.5, width=50 must cover bin 2
    # or rows with value in [100, 100.5) silently vanish). When hi lands
    # exactly on a boundary this emits one empty extra bin; the residual
    # predicate discards it.
    lb = left.withColumn("_bin", F.floor(F.col(left_point) / bin_width))
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bin_width),
                F.floor(F.col(right_hi) / bin_width),
            )
        ),
    )
    joined = lb.join(rb, "_bin").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    )
    return joined.drop("_bin")
