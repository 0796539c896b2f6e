"""Window-function queries (SURVEY §2.5-2.6: absent from reference, first-class here).

Closest reference analogues: ``sliding(n)`` / ``zipWithIndex``
(``traversableOps.scala:389-398``). Scale: windows shuffle once on the
partition key; per-group top-k never sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table


# --- per-group top-k via ranking window -----------------------------------
def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "rnk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


TOP_ORDERS_SQL = """
SELECT o_orderpriority, rnk, o_orderkey, totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


# --- analytic window: lag + running aggregate over an ordered stream ------
# Reference analogue: sliding windows over instruction streams
# (FIXTURES.md F8); events(ts) stands in. Frame is stated explicitly so
# Spark and the oracle agree bit-for-bit.
def events_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.row_number().over(w_order).alias("seq"),
            F.round(F.lag("value", 1).over(w_order), 4).alias("prev_value"),
            F.round(F.sum("value").over(w_run), 4).alias("running_sum"),
        )
    )


EVENTS_RUNNING_SQL = """
SELECT user_id, event_id,
       row_number() OVER w AS seq,
       round(lag(value, 1) OVER w, 4) AS prev_value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- sliding windows (reference `sliding(n)`, traversableOps.scala:396) ---
# A 3-event sliding window per user: ids of the window members, sum of
# values. Implemented with lead() so each row owns its window — no
# collect_list blowup, stays whole-stage-codegen.
def event_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.lead("event_id", 1).over(w).alias("next1"),
            F.lead("event_id", 2).over(w).alias("next2"),
            F.round(
                F.col("value")
                + F.coalesce(F.lead("value", 1).over(w), F.lit(0.0))
                + F.coalesce(F.lead("value", 2).over(w), F.lit(0.0)),
                4,
            ).alias("win_sum"),
        )
        .filter(F.col("next2").isNotNull())
    )


EVENT_SLIDING_SQL = """
SELECT user_id, event_id, next1, next2, win_sum FROM (
  SELECT user_id, event_id,
         lead(event_id, 1) OVER w AS next1,
         lead(event_id, 2) OVER w AS next2,
         round(value + coalesce(lead(value, 1) OVER w, 0)
                     + coalesce(lead(value, 2) OVER w, 0), 4) AS win_sum
  FROM events
  WHERE user_id < 20
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) WHERE next2 IS NOT NULL
"""


# --- zipWithIndex (traversableOps.scala:395) ------------------------------
# Global stable indexing needs a total order; at scale prefer per-group
# row_number. Here: rank nations globally by name (bounded table).
def nations_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("n_name")
    return nation.select(
        (F.row_number().over(w) - 1).alias("idx"), "n_name", "n_nationkey"
    )


NATIONS_INDEXED_SQL = """
SELECT row_number() OVER (ORDER BY n_name) - 1 AS idx, n_name, n_nationkey
FROM nation
"""


QUERIES = {
    "top_orders_per_priority": (top_orders_per_priority, TOP_ORDERS_SQL),
    "events_running_stats": (events_running_stats, EVENTS_RUNNING_SQL),
    "event_sliding_windows": (event_sliding_windows, EVENT_SLIDING_SQL),
    "nations_indexed": (nations_indexed, NATIONS_INDEXED_SQL),
}
