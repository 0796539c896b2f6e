"""Closing SURVEY §2 parity corners: full-outer join, order-sensitive
array folds, and the partial-function ``collect`` desugaring.

- Full outer join: not in the reference (§2.3 "not present" — one ``how=``
  away in Spark); exposed as first-class surface.
- foldLeft (Fold.scala:6-13): the order-sensitive case needs an explicit
  sort key (Spark is unordered) — the array is assembled in declared order
  and folded with ``F.aggregate``, the distributed analogue the reference
  runs sequentially.
- collect (traversableOps.scala:176-181): partial function = Option-valued
  map + IsDefinedAt filter; lowered to a null-returning CASE + IS NOT NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table


# --- full outer join with Option semantics on both sides ------------------
# Per-nation customer counts ⟗ supplier counts; the key-range filters
# guarantee left-only, overlap, and right-only rows all occur. Aggregate
# BEFORE joining: the join inputs are |nations|-sized whatever the SF.
def nation_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = (
        customer.filter(F.col("c_nationkey") < 15)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        supplier.filter(F.col("s_nationkey") >= 10)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    joined = cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
    return joined.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        (F.col("n_cust").isNotNull() & F.col("n_supp").isNotNull()).alias("both_sides"),
    )


FULL_OUTER_SQL = """
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp,
       (n_cust IS NOT NULL AND n_supp IS NOT NULL) AS both_sides
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
      WHERE c_nationkey < 15 GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey, count(*) AS n_supp FROM supplier
      WHERE s_nationkey >= 10 GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
"""


# --- order-sensitive foldLeft over a declared order -----------------------
# Polynomial hash of each order's quantities in (line-number, quantity)
# order: the result changes if the fold order changes, so it pins Spark's
# array_sort(collect_list(struct)) + F.aggregate against DuckDB's
# list(x ORDER BY k) + list_reduce. The sort key is the FULL struct —
# l_linenumber alone is not unique within an order in this dataset, and an
# order-sensitive fold over a tie-broken-differently list diverges.
# Bounded: ≤7 items x qty ≤ 50 → < 2^63.
def order_qty_foldhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity"))),
        lambda s: s.l_quantity.cast("long"),
    )
    per_order = (
        li.filter(F.col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(arr.alias("qtys"))
    )
    fold = F.aggregate(
        "qtys", F.lit(0).cast("long"), lambda acc, x: acc * F.lit(31) + x
    )
    return per_order.select(
        "l_orderkey", F.size("qtys").alias("n_items"), fold.alias("qty_hash")
    )


FOLDHASH_SQL = """
SELECT l_orderkey,
       len(qtys) AS n_items,
       list_reduce(list_prepend(CAST(0 AS BIGINT), qtys),
                   (acc, x) -> acc * 31 + x) AS qty_hash
FROM (
  SELECT l_orderkey,
         list(CAST(l_quantity AS BIGINT)
              ORDER BY l_linenumber, l_quantity) AS qtys
  FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey
)
"""


# --- collect: partial function as null-returning map + IsDefinedAt --------
# Defined only on URGENT/HIGH orders (priority → numeric score scaled by
# price); undefined elsewhere → null → filtered, the IsDefinedAt + App
# desugaring of PartialFuncExp.
def collect_urgency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    score = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") * 2).when(
        F.col("o_orderpriority") == "2-HIGH", F.col("o_totalprice")
    )  # no otherwise → null where undefined
    return (
        orders.select("o_orderkey", F.round(score, 2).alias("urgency_score"))
        .where(F.col("urgency_score").isNotNull())
    )


COLLECT_SQL = """
SELECT o_orderkey, urgency_score
FROM (
  SELECT o_orderkey,
         round(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2
                    WHEN o_orderpriority = '2-HIGH' THEN o_totalprice
               END, 2) AS urgency_score
  FROM orders
)
WHERE urgency_score IS NOT NULL
"""


# --- explicit GROUPING SETS (cube/rollup generalization) ------------------
# SURVEY §2.4 "not present in the reference … all Spark built-ins": cube
# and rollup are gated elsewhere (typed.py); this is the general form —
# per-priority totals, per-status totals, and a grand total in ONE pass
# (one shuffle, partial aggregation map-side), not a UNION of three
# aggregates (three scans). grouping() markers disambiguate real NULL keys
# from superaggregate rows.
def grouping_sets_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").alias("g_priority"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       grouping(o_orderpriority) AS g_priority,
       grouping(o_orderstatus) AS g_status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


# --- exact quantiles (order statistics as named aggregates) ---------------
# The reference can only express order statistics as a foldLeft over a
# sorted Seq; here they are single-pass named aggregates. F.percentile is
# the EXACT interpolating variant (matches DuckDB quantile_cont) — NOT
# percentile_approx, which is sketch-based and would never hash-match an
# oracle. Oracle casts to DOUBLE so DuckDB doesn't quantize to the input
# decimal scale.
def quartile_prices_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("q1_price"),
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        F.round(F.percentile("l_extendedprice", 0.75), 4).alias("q3_price"),
        F.count("*").alias("n_items"),
    )


QUARTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 4) AS q1_price,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS med_price,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 4) AS q3_price,
       count(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


# --- robust outlier detection (median/MAD z-score per group) -----------------
# The data-quality screen that survives the outliers it hunts (mean/std
# are dragged by the very anomalies being flagged; median/MAD are not):
# flag orders whose |price - group median| exceeds k * MAD, MAD = median
# of absolute deviations. Exact interpolating percentiles on both engines
# (the quartile gate's proven parity); the FLAG comparison happens on
# round(,4)-stabilized deviations so a last-ulp percentile difference
# cannot flip a row across the threshold. Scale: two grouped exact
# percentiles (one shuffle each) + one broadcast-size group-stats join —
# at 100 TB swap percentile for approx_percentile and keep the shape.
_MAD_K = 3.0


def order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(F.median("adev").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "o_orderpriority").withColumn(
        "is_outlier",
        F.round("adev", 4) > F.round(F.lit(_MAD_K) * F.col("mad"), 4),
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.round(F.min("med"), 4).alias("med_price"),
        F.round(F.min("mad"), 4).alias("mad_price"),
    )


MAD_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY o_orderpriority
), dev AS (
  SELECT o.o_orderpriority, abs(o.o_totalprice - m.med) AS adev, m.med
  FROM orders o JOIN med m USING (o_orderpriority)
), mad AS (
  SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN round(d.adev, 4) > round({_MAD_K} * m.mad, 4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(min(d.med), 4) AS med_price,
       round(min(m.mad), 4) AS mad_price
FROM dev d JOIN mad m USING (o_orderpriority)
GROUP BY d.o_orderpriority
"""


# --- pivot (long → wide reshaping) ----------------------------------------
# groupBy().pivot(col, values): explicit value list keeps the plan a
# single-shuffle hash aggregate (no extra distinct-values job, and the
# output schema is static — required at 100 TB where a values scan is a
# full pass). Spark leaves never-seen (priority, status) cells NULL while
# a filtered count gives 0 — coalesce pins the disagreement down.
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders GROUP BY o_orderpriority
"""


# --- unpivot / melt (wide → long, inverse of pivot) -----------------------
# Narrow aggregate first (|returnflags| rows), then unpivot — the melt is
# driver-cheap metadata reshaping of an already-reduced result, never a
# row-explosion of the base table. Value columns share one type (double),
# a Spark unpivot requirement.
def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_base_price"], "metric", "value"
    )


UNPIVOT_SQL = """
SELECT l_returnflag, metric, CAST(value AS DOUBLE) AS value
FROM (
  UNPIVOT (
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price
    FROM lineitem GROUP BY l_returnflag
  ) ON sum_qty, sum_base_price INTO NAME metric VALUE value
)
"""


# --- correlated scalar subquery (TPC-H Q17 shape) --------------------------
# "Revenue lost if small orders stop": lineitems under 20% of their part's
# average quantity, restricted to one brand. Spark-first decorrelation as a
# WINDOW, not a self-join: the naive aggregate-join-back (what Catalyst's
# subquery decorrelation emits) scans lineitem TWICE with no
# ReusedExchange; the per-part average as a window over l_partkey is one
# scan + one shuffle. The brand filter broadcast-prunes before that
# shuffle, so the windowed rows are only the branded part's lineitems.
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    threshold = F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2
    small = branded.withColumn("_thr", threshold).filter(
        F.col("l_quantity") < F.col("_thr")
    )
    return small.agg(
        F.count("*").alias("n_small"),
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
    )


Q17_SQL = """
SELECT count(*) AS n_small,
       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


# --- range-frame window (rangeBetween; rows frames covered elsewhere) ------
# Per click event: how much value the same user accumulated in the strictly
# preceding hour — a RANGE frame keyed on event-time seconds, not row
# counts, so gaps and bursts are handled by value distance. One shuffle on
# user_id.
def events_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    sec = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, -1)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.coalesce(F.sum("value").over(w), F.lit(0.0)), 4).alias(
            "trailing_hour_value"
        ),
    )


RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       round(coalesce(sum(value) OVER (
         PARTITION BY user_id
         ORDER BY CAST(epoch(ts) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING
       ), 0.0), 4) AS trailing_hour_value
FROM events WHERE event_type = 'click'
"""


# --- null-safe equi-join (<=> / IS NOT DISTINCT FROM) -----------------------
# The join-key corner every outer-join/dedup pipeline eventually hits:
# NULL keys must MATCH each other under null-safe equality (standard
# equality drops them silently). Customers in BUILDING get a NULL derived
# key (nullif) and must land on the dim's NULL row. Scale: the dim is an
# inline broadcast relation; the null-safe predicate stays a hashable
# equi-join key in Spark (EqualNullSafe), not a θ-join.
def null_safe_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg_key")
    )
    dim = spark.createDataFrame(
        [("AUTOMOBILE", "auto"), ("MACHINERY", "mach"), (None, "unsegmented")],
        "seg_key string, label string",
    )
    return customer.join(
        F.broadcast(dim), customer.seg_key.eqNullSafe(dim.seg_key)
    ).select("c_custkey", "label")


NULL_SAFE_JOIN_SQL = """
SELECT c.c_custkey, d.label
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_key
      FROM customer) c
JOIN (VALUES ('AUTOMOBILE', 'auto'), ('MACHINERY', 'mach'),
             (NULL, 'unsegmented')) AS d(seg_key, label)
  ON c.seg_key IS NOT DISTINCT FROM d.seg_key
"""


# --- schema-drift union: unionByName(allowMissingColumns=True) -------------
# The operator a long-lived ingestion pipeline actually calls when a new
# field appears mid-stream: frames with DIFFERENT column sets union by
# NAME (never by position), absent columns null-filled. Old-schema rows
# surface under the '<missing>' bucket; the oracle is DuckDB's native
# UNION ALL BY NAME of the same two projections.
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old_schema = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_schema = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    unioned = old_schema.unionByName(new_schema, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce("o_orderpriority", F.lit("<missing>")).alias("priority")
    ).agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
        ).cast("bigint").alias("price_cents"),
    )


UNION_BY_NAME_SQL = """
WITH unioned AS (
  (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0)
  UNION ALL BY NAME
  (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
   WHERE o_orderkey % 3 <> 0))
SELECT coalesce(o_orderpriority, '<missing>') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS price_cents
FROM unioned GROUP BY 1
"""


QUERIES = {
    "nation_full_outer_counts": (nation_full_outer_counts, FULL_OUTER_SQL),
    "union_by_name_evolution": (union_by_name_evolution, UNION_BY_NAME_SQL),
    "null_safe_segment_join": (null_safe_segment_join, NULL_SAFE_JOIN_SQL),
    "small_quantity_revenue": (small_quantity_revenue, Q17_SQL),
    "events_trailing_hour_value": (events_trailing_hour_value, RANGE_FRAME_SQL),
    "order_qty_foldhash": (order_qty_foldhash, FOLDHASH_SQL),
    "collect_urgency_scores": (collect_urgency_scores, COLLECT_SQL),
    "grouping_sets_order_totals": (grouping_sets_order_totals, GROUPING_SETS_SQL),
    "quartile_prices_by_flag": (quartile_prices_by_flag, QUARTILE_SQL),
    "order_price_outliers": (order_price_outliers, MAD_OUTLIERS_SQL),
    "pivot_status_counts": (pivot_status_counts, PIVOT_SQL),
    "unpivot_flag_metrics": (unpivot_flag_metrics, UNPIVOT_SQL),
}
