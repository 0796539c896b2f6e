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


# Ordered-funnel analysis: per user, the first view, the first click AFTER
# that view, the first purchase AFTER that click. Three chained
# min-over-partition windows (no orderBy → no sort) sharing ONE exchange on
# user_id, and the final per-user aggregate reuses the same partitioning —
# a whole funnel for one shuffle. Durations emitted as epoch-microsecond
# deltas (both engines truncate the parquet nanos identically).
def event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        events.select("user_id", "event_type", "ts")
        .withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(
        "user_id",
        stage.cast("long").alias("funnel_stage"),
        (F.unix_micros("t2") - F.unix_micros("t1")).alias("us_view_to_click"),
        (F.unix_micros("t3") - F.unix_micros("t1")).alias("us_view_to_purchase"),
    )


EVENT_FUNNEL_SQL = """
WITH w1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
), per_user AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
  FROM w3 GROUP BY user_id
)
SELECT user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage,
       epoch_ns(t2) // 1000 - epoch_ns(t1) // 1000 AS us_view_to_click,
       epoch_ns(t3) // 1000 - epoch_ns(t1) // 1000 AS us_view_to_purchase
FROM per_user
"""


# --- batch sessionization (gap-based, the lag+cumsum classic) ----------------
# The batch twin of streaming/incremental.py's session_window gate: per
# user, a new session starts when the gap to the previous event exceeds
# the threshold; session id = running count of session starts. All
# arithmetic in exact microsecond epochs (unix_micros / epoch_us), so
# every value is integer and engine-exact, sub-second timestamps
# included. Scale: ONE shuffle on user_id serves both the lag and the
# cumulative sum (same window spec), then the session agg is
# partition-local on the same key.
_SESSION_GAP_US = 6 * 3600 * 1_000_000


def batch_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ets")
    )
    w = Window.partitionBy("user_id").orderBy("ets", "event_id")
    new_s = F.when(
        F.col("ets") - F.lag("ets").over(w) > _SESSION_GAP_US, 1
    ).otherwise(0)
    sess = ev.withColumn("new_s", new_s).withColumn(
        "session_idx",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ets").alias("start_us"),
        F.max("ets").alias("end_us"),
        (F.max("ets") - F.min("ets")).alias("duration_us"),
    )


BATCH_SESSIONS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ets FROM events
), marked AS (
  SELECT user_id, event_id, ets,
         CASE WHEN ets - lag(ets) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ets, event_id)
), sess AS (
  SELECT user_id, ets,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ets, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ets) AS start_us,
       max(ets) AS end_us,
       max(ets) - min(ets) AS duration_us
FROM sess GROUP BY user_id, session_idx
"""


# --- the full ranking-function family over TIED keys ----------------------
# rank vs dense_rank vs ntile vs percent_rank vs cume_dist, ordered by a
# deliberately low-cardinality key (order month: ~3 distinct values per
# priority partition, tie groups in the hundreds) so the tie semantics
# of each function actually differentiate: rank jumps after a tie group,
# dense_rank doesn't, cume_dist counts the whole group, percent_rank its
# start. ntile orders by the UNIQUE key instead — its assignment under
# ties is order-dependent and would be nondeterministic. The two
# fractional functions are exact small-integer ratios ((rank-1)/(n-1),
# peers/n) — identical IEEE doubles on both engines — emitted as ppm via
# floor. One shuffle on the partition key serves all five (same window),
# plus one for the ntile ordering.
def orders_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_m = Window.partitionBy("o_orderpriority").orderBy(F.month("o_orderdate"))
    w_k = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w_m).cast("long").alias("rnk"),
        F.dense_rank().over(w_m).cast("long").alias("drnk"),
        F.ntile(4).over(w_k).cast("long").alias("quartile"),
        F.floor(F.lit(1000000) * F.percent_rank().over(w_m))
        .cast("long")
        .alias("prank_ppm"),
        F.floor(F.lit(1000000) * F.cume_dist().over(w_m))
        .cast("long")
        .alias("cdist_ppm"),
    )


RANKING_FUNCTIONS_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(rank() OVER (PARTITION BY o_orderpriority
                         ORDER BY month(o_orderdate)) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY o_orderpriority
                               ORDER BY month(o_orderdate)) AS BIGINT) AS drnk,
       CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_orderkey) AS BIGINT) AS quartile,
       CAST(floor(1000000 * percent_rank() OVER (PARTITION BY o_orderpriority
                                                 ORDER BY month(o_orderdate)))
            AS BIGINT) AS prank_ppm,
       CAST(floor(1000000 * cume_dist() OVER (PARTITION BY o_orderpriority
                                              ORDER BY month(o_orderdate)))
            AS BIGINT) AS cdist_ppm
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
"""


# --- time-RANGE window frame (value-based, not row-based) ------------------
# The frame every "activity in the trailing hour" metric needs: RANGE
# BETWEEN bounds select by ORDER-key VALUE, so gaps and ties behave
# correctly where a ROWS frame silently lies (a row-frame of N rows is
# N rows regardless of how much TIME they span; a RANGE frame of one
# hour is one hour regardless of how many rows landed in it, and ties
# on the key enter the frame together as peers). Ordered by integer
# epoch-micros so the frame bound (3.6e9 us) is exact on both engines;
# money as DECIMAL-accumulated cents.
def events_range_frame_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    base = events.filter(F.col("user_id") < 50).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        cents.alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        F.sum("cents").over(w).cast("bigint").alias("hour_cents"),
        F.count("*").over(w).cast("bigint").alias("hour_events"),
    )


EVENTS_RANGE_FRAME_SQL = """
SELECT user_id, event_id,
       CAST(sum(cents) OVER w AS BIGINT) AS hour_cents,
       CAST(count(*) OVER w AS BIGINT) AS hour_events
FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE user_id < 50
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# --- weekly cohort retention matrix (r12) -----------------------------------
# The product-analytics staple the funnel gate doesn't cover: users are
# cohorted by the week of their FIRST event, then each (cohort, week
# offset) cell counts how many of them came back. Week ids are plain
# integer arithmetic on epoch days (floor(days-since-1970-01-05 / 7), a
# Monday anchor) so both engines derive identical buckets — date_trunc
# week boundaries are an engine-convention trap. Scale: first-event
# assignment is a min() window over ONE hash partition on user_id (no
# agg+join-back second shuffle); activity then collapses to distinct
# (user, cohort, offset) and a bounded weeks x offsets matrix; cohort
# denominators are a tiny broadcast. Retention is exact-integer ppm.
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-05"))) / 7
    ).cast("bigint")
    w = Window.partitionBy("user_id")
    active = (
        events.select("user_id", week.alias("event_week"))
        .withColumn("cohort_week", F.min("event_week").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.col("event_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    cells = active.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )
    sizes = (
        active.where(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.count("*").cast("bigint").alias("cohort_users"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_users",
        F.expr("n_active * 1000000L div cohort_users").alias("retention_ppm"),
    )


COHORT_RETENTION_SQL = """
WITH weeks AS (
  SELECT user_id,
         CAST(floor(datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS event_week
  FROM events
),
active AS (
  SELECT DISTINCT user_id,
         min(event_week) OVER (PARTITION BY user_id) AS cohort_week,
         event_week - min(event_week) OVER (PARTITION BY user_id)
           AS week_offset
  FROM weeks
),
cells AS (
  SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM active GROUP BY cohort_week, week_offset
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
  FROM active WHERE week_offset = 0 GROUP BY cohort_week
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_users,
       c.n_active * 1000000 // s.cohort_users AS retention_ppm
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
"""


# --- gaps-and-islands: consecutive-day activity streaks (r12) ---------------
# The remaining classic window technique: maximal runs of consecutive
# active days per user, found by the day - row_number() constant-group
# trick (consecutive days share the difference; any gap shifts it).
# Distinct from batch_user_sessions, which thresholds raw timestamp
# GAPS — islands need exact run boundaries on a discrete axis. One
# shuffle on user_id (distinct + window share the partitioning), then
# the bounded streak-length histogram.
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
        .cast("bigint")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    streaks = (
        days.withColumn("grp", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count("*").cast("bigint").alias("streak_days"))
    )
    return streaks.groupBy("streak_days").agg(
        F.count("*").cast("bigint").alias("n_streaks"),
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )


ACTIVITY_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day
  FROM events
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days
  FROM (
    SELECT user_id, day,
           day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
    FROM days
  )
  GROUP BY user_id, grp
)
SELECT streak_days, CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM streaks GROUP BY streak_days
"""


QUERIES = {
    "top_orders_per_priority": (top_orders_per_priority, TOP_ORDERS_SQL),
    "cohort_retention": (cohort_retention, COHORT_RETENTION_SQL),
    "user_activity_streaks": (user_activity_streaks, ACTIVITY_STREAKS_SQL),
    "orders_ranking_functions": (
        orders_ranking_functions,
        RANKING_FUNCTIONS_SQL,
    ),
    "batch_user_sessions": (batch_user_sessions, BATCH_SESSIONS_SQL),
    "event_funnel_stages": (event_funnel_stages, EVENT_FUNNEL_SQL),
    "events_running_stats": (events_running_stats, EVENTS_RUNNING_SQL),
    "events_range_frame_sums": (
        events_range_frame_sums,
        EVENTS_RANGE_FRAME_SQL,
    ),
    "event_sliding_windows": (event_sliding_windows, EVENT_SLIDING_SQL),
    "nations_indexed": (nations_indexed, NATIONS_INDEXED_SQL),
}
