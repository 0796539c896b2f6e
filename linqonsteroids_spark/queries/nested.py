"""Nested-collection queries — the reference's central data-model trait.

Reference rows nest collections (``Book.authors: Seq[Author]``,
``sampleLibrary.scala:2-4``) and queries iterate them directly
(``PaperTutorial.scala:73-79``); FIXTURES F1/F6 map the shape onto
orders→lineitem. These queries build the nested form (collect_list with a
declared sort → deterministic arrays), operate on it with higher-order
functions (exists/forall/filter/aggregate — no explode where arrays
suffice), and explode only where per-element rows are required.

Scale note: nesting a 1:N fact into arrays shuffles once on the parent
key; all subsequent array ops are per-row JVM compute with no further
shuffle — often cheaper than repeated joins when N is bounded. Unbounded
N (skewed parents) would blow rows: keep the join form for heavy
hitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table


def _orders_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders with a deterministic array of lineitem quantities/prices."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
            ).alias("items")
        )
    )


# --- guarded array access (FIXTURES F6: CSE scope safety) ------------------
# `size > 2 && xs[2] == …` — short-circuit must hold (no index error), and
# the guard must not be reordered past the access.
def nested_guarded_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _orders_nested(spark, sf_dir)
    third_qty = F.col("items")[2]["l_quantity"]
    return (
        nested.filter((F.size("items") > 2) & (third_qty > 25))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.size("items").alias("n_items"),
            F.round(third_qty, 2).alias("third_qty"),
        )
    )


NESTED_GUARDED_SQL = """
SELECT l_orderkey AS orderkey, len(items) AS n_items,
       round(items[3].l_quantity, 2) AS third_qty
FROM (
  SELECT l_orderkey,
         list(struct_pack(l_linenumber := l_linenumber,
                          l_quantity := l_quantity,
                          l_extendedprice := l_extendedprice)
              ORDER BY l_linenumber, l_quantity, l_extendedprice) AS items
  FROM lineitem GROUP BY l_orderkey
)
WHERE len(items) > 2 AND items[3].l_quantity > 25
"""


# --- higher-order exists/forall/filter/aggregate over arrays ---------------
def nested_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _orders_nested(spark, sf_dir)
    items = F.col("items")
    return nested.select(
        F.col("l_orderkey").alias("orderkey"),
        F.size(items).alias("n_items"),
        F.exists(items, lambda x: x["l_quantity"] >= 45).alias("has_bulk"),
        F.forall(items, lambda x: x["l_quantity"] > 5).alias("all_gt5"),
        F.size(F.filter(items, lambda x: x["l_extendedprice"] > 3000)).alias("n_pricey"),
        F.round(
            F.aggregate(
                items, F.lit(0.0), lambda acc, x: acc + x["l_quantity"]
            ),
            2,
        ).alias("total_qty"),
    )


NESTED_STATS_SQL = """
SELECT l_orderkey AS orderkey,
       len(items) AS n_items,
       len(list_filter(items, x -> x.l_quantity >= 45)) > 0 AS has_bulk,
       len(list_filter(items, x -> NOT (x.l_quantity > 5))) = 0 AS all_gt5,
       len(list_filter(items, x -> x.l_extendedprice > 3000)) AS n_pricey,
       round(list_sum(list_transform(items, x -> x.l_quantity)), 2) AS total_qty
FROM (
  SELECT l_orderkey,
         list(struct_pack(l_linenumber := l_linenumber,
                          l_quantity := l_quantity,
                          l_extendedprice := l_extendedprice)) AS items
  FROM lineitem GROUP BY l_orderkey
)
"""


# --- explode back (flatMap over nested Seq, PaperTutorial.scala:73-79) ----
# posexplode preserves the declared order as an explicit position column —
# the only way "Seq position" survives distribution (SURVEY §1.4).
def nested_explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _orders_nested(spark, sf_dir)
    return (
        nested.filter(F.size("items") >= 5)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.posexplode("items").alias("pos", "item"),
        )
        .filter(F.col("pos") <= 1)
        .select(
            "orderkey",
            "pos",
            F.col("item.l_linenumber").alias("linenumber"),
            F.round("item.l_quantity", 2).alias("quantity"),
        )
    )


NESTED_EXPLODE_SQL = """
SELECT orderkey, pos, linenumber, quantity FROM (
  SELECT l_orderkey AS orderkey,
         generate_subscripts(items, 1) - 1 AS pos,
         unnest(items).l_linenumber AS linenumber,
         round(unnest(items).l_quantity, 2) AS quantity
  FROM (
    SELECT l_orderkey,
           list(struct_pack(l_linenumber := l_linenumber,
                            l_quantity := l_quantity,
                            l_extendedprice := l_extendedprice)
                ORDER BY l_linenumber, l_quantity, l_extendedprice) AS items
    FROM lineitem GROUP BY l_orderkey
  )
  WHERE len(items) >= 5
)
WHERE pos <= 1
"""


QUERIES = {
    "nested_guarded_access": (nested_guarded_access, NESTED_GUARDED_SQL),
    "nested_array_stats": (nested_array_stats, NESTED_STATS_SQL),
    "nested_explode_positions": (nested_explode_positions, NESTED_EXPLODE_SQL),
}
