"""Skew mitigation: salted join and salted two-stage aggregation.

AQE's skew-join handling (on by default in session.py) covers sort-merge
skew at runtime; salting is the declarative fallback for the cases AQE
can't fix — extreme hot keys in shuffled hash joins and skewed groupBys.

Salted join: replicate the small side R times, scatter the big side's hot
keys across R salt buckets → hot-key work spreads over R tasks.
Salted aggregation: pre-aggregate on (key, salt), then finish on key —
two small shuffles instead of one skewed one. Only monoid aggregates
(sum/count/min/max) distribute this way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``n_salts``×. Correct for inner/left joins keyed on the big side ONLY:
    right/full would emit the replicated small side's unmatched copies
    n_salts times, and semi/anti flip which side must be replicated."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): the "
            "replicated small side makes right/full/semi/anti incorrect"
        )
    big_salted = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_salted.join(
        small_rep,
        (big_salted[big_key] == small_rep[small_key]) & (big_salted["_salt"] == small_rep["_salt"]),
        how,
    )
    return joined.drop("_salt")


#: Default sampling fraction for the hot-key statistics pass. 10 % is
#: plenty to rank whale keys (a key heavy enough to need salting shows
#: up thousands of times in any 10 % sample) while keeping the stats
#: cost an order of magnitude under the join it protects.
DEFAULT_HOT_FRACTION = 0.1


def measure_hot_keys(
    big: DataFrame,
    big_key: str,
    max_hot_keys: int = 64,
    hot_fraction: float | None = None,
    full_scan: bool = False,
) -> list:
    """Top-``max_hot_keys`` heaviest non-null values of ``big_key``,
    heaviest first (ties broken by key for determinism).

    This is a STATISTICS pass — it decides which keys get salted, never
    what the join returns — so by default it runs over a seeded
    ``DEFAULT_HOT_FRACTION`` sample of the big side rather than a full
    scan: at 100 TB reading every fact row just to rank whales is the
    wrong default. Pass ``full_scan=True`` for exact counts, or
    ``hot_fraction`` for an explicit sampling rate."""
    if full_scan and hot_fraction is not None:
        raise ValueError("pass hot_fraction OR full_scan=True, not both")
    fraction = None if full_scan else (hot_fraction or DEFAULT_HOT_FRACTION)
    counted = big.sample(fraction, seed=42) if fraction else big
    hot_rows = (
        counted.select(F.col(big_key).alias("_k"))
        .where(F.col("_k").isNotNull())
        .groupBy("_k")
        .count()
        .orderBy(F.desc("count"), F.asc("_k"))
        .limit(max_hot_keys)
        .collect()
    )
    return [r._k for r in hot_rows]


def hotkey_salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    max_hot_keys: int = 64,
    hot_fraction: float | None = None,
    full_scan: bool = False,
) -> DataFrame:
    """PARTIAL salting (r11): salt only the measured-hot keys.

    ``salted_join`` replicates the whole small side ``n_salts``× — the
    right trade when most keys are hot, but at 100 TB the usual shape is
    a handful of whales in an otherwise uniform distribution, and
    blanket replication multiplies the broadcast/shuffle volume of the
    ENTIRE dim for the benefit of a few keys. This variant:

    1. measures the big side's top-``max_hot_keys`` heaviest keys via
       :func:`measure_hot_keys` — columns pruned to the key and, BY
       DEFAULT, a seeded ``DEFAULT_HOT_FRACTION`` sample of the scan
       (r12: the 100 TB default never full-scans the fact side for
       statistics; pass ``full_scan=True`` to opt into exact counts).
       Sampling only affects WHICH keys get salted, never correctness;
    2. salts big-side rows of hot keys across ``n_salts`` buckets while
       every other row keeps salt 0;
    3. replicates ONLY the hot keys' small-side rows ``n_salts``×
       (everything else joins once, unsalted).

    Output ≡ the plain INNER equi-join (property-tested) — inner only:
    both the salted path and the empty-hot fallback join inner, and a
    left join would need unmatched big-side rows handled explicitly.
    The hot set is a bounded driver-side list (≤ max_hot_keys values) —
    the same bounded-collect budget as the bloom-join bitmap."""
    if n_salts < 2:
        raise ValueError("n_salts must be >= 2")
    hot = measure_hot_keys(big, big_key, max_hot_keys, hot_fraction, full_scan)
    if not hot:
        return big.join(small, big[big_key] == small[small_key], "inner")
    hot_lit = F.lit(hot)  # ONE folded array literal, not CreateArray
    big_salted = big.withColumn(
        "_salt",
        F.when(
            F.array_contains(hot_lit, F.col(big_key)),
            (F.rand(seed=42) * n_salts).cast("int"),
        ).otherwise(F.lit(0)),
    )
    small_rep = small.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.array_contains(hot_lit, F.col(small_key)),
                F.lit(list(range(n_salts))),
            ).otherwise(F.lit([0]))
        ),
    )
    joined = big_salted.join(
        small_rep,
        (big_salted[big_key] == small_rep[small_key])
        & (big_salted["_salt"] == small_rep["_salt"]),
        "inner",
    )
    return joined.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed keys.

    ``aggs``: out_name → (final_op, partial Column), where final_op ∈
    {'sum','min','max'} recombines the partials (count recombines as sum).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[v.alias(f"_p_{n}") for n, (_, v) in aggs.items()]
    )
    final_ops = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(key).agg(
        *[final_ops[op](F.col(f"_p_{n}")).alias(n) for n, (op, _) in aggs.items()]
    )
