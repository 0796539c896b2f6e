"""Core relational queries: scan/filter/project/join/agg/set-ops.

Covers SURVEY.md §2.1-2.4/§2.7 — the reference's map/filter/flatMap/join/
indexBy/union/diff surface (``traversableOperators.scala``,
``traversableOps.scala:163-255``) — lowered to declarative DataFrame ops so
Catalyst performs the rewrites the reference hand-implements (fusion,
pushdown, join recognition; ``Optimization.scala:106-157``).

Scale notes per query are inline: broadcast hints go on dimension tables
only (bounded size at any SF); fact-fact joins shuffle on their keys and
rely on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table


# --- flagship: the PaperTutorial pipeline on the star schema ---------------
# Reference: src/test/scala/ivm/tests/PaperTutorial.scala:73-133 — "records
# about books by publisher P: (title, authorName, #coauthors)" becomes
# "orders of customers in segment BUILDING: (orderkey, custname,
# #lineitems-1)". Exercises scan, filter, equi-join, nested iteration
# (orders→lineitem ≅ book→authors), projection arithmetic.
def flagship_order_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # customer is the small side at every SF relative to lineitem → broadcast.
    building = F.broadcast(
        customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    )
    # aggregate BEFORE the join (guide §2.3, r16): o_orderkey is unique in
    # orders, so grouping the joined rows by (o_orderkey, c_name) counts
    # exactly the lineitems of each orderkey — counting them on lineitem
    # alone first shuffles narrow partial counts (map-side combined,
    # O(distinct keys)) instead of every joined row carrying the c_name
    # payload through the aggregate exchange. The inner join keeps the
    # same survivor set (an orderkey without lineitems has no count row
    # and no joined rows either way).
    li_counts = lineitem.groupBy("l_orderkey").agg(
        (F.count("*") - F.lit(1)).alias("n_coitems")
    )
    return (
        orders.join(building, orders.o_custkey == building.c_custkey)
        .join(li_counts, orders.o_orderkey == li_counts.l_orderkey)
        .select("o_orderkey", "c_name", "n_coitems")
    )


FLAGSHIP_SQL = """
SELECT o.o_orderkey AS o_orderkey, c.c_name AS c_name,
       count(*) - 1 AS n_coitems
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, c.c_name
"""


# --- TPC-H Q1-shaped aggregation ------------------------------------------
# Reference analogue: foldLeft-based sum/count (traversableOps.scala:244-248)
# generalized to named aggregates (SURVEY §2.4 "free parity surface").
# Scale: pure map-side-combine groupBy on 6 low-cardinality groups — the
# shuffle moves only partial aggregates, O(partitions), at any SF.
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3-shaped join + top-k -----------------------------------------
# Sorts/limits are absent from the reference (SURVEY §2.6) — first-class
# here. Scale: two shuffled joins keyed on custkey/orderkey; top-10 is a
# TakeOrdered (per-partition heap + driver merge), never a full sort.
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    # NOTE (r16): the flagship-style aggregate-before-join rewrite was
    # A/B'd here and REVERTED on measurement (0.85 → 1.04 s): the
    # MACHINERY+date filters are selective, so the broadcast join prunes
    # most lineitem rows BEFORE the aggregate — pre-aggregating instead
    # sums revenue for every orderkey only to discard most at the join.
    return (
        customer.filter(F.col("c_mktsegment") == "MACHINERY")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'MACHINERY'
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- keyset (seek-method) pagination (r12) ---------------------------------
# OFFSET pagination is O(page * k) — at 100 TB, page 1000 computes and
# discards ten thousand rows before returning ten. Keyset pagination
# makes EVERY page the same O(k) TakeOrdered: the client remembers the
# last row's full sort key (price, orderkey) and the next page seeks
# strictly past it with an ordinary pushed-down predicate — row-goal
# heap per partition + driver merge, never a global sort, and the scan
# skips whole row groups once statistics exclude the seen prefix. The
# gate fetches two consecutive pages this way and RAISES unless the
# page-2 plan is a TakeOrdered with the seek predicate pushed to the
# scan. Oracle: rows 1-20 of the same total order, split into pages by
# row_number arithmetic — equality proves the seek predicate is exactly
# "after row 10" under tie-breaking.
_PAGE_K = 10


def keyset_paginated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = orders.select(
        "o_orderkey", cents.alias("price_cents"), "o_orderstatus"
    )
    order = [F.desc("price_cents"), F.asc("o_orderkey")]
    page1 = base.orderBy(*order).limit(_PAGE_K)
    seen = page1.collect()  # the page the client holds (bounded: k rows)
    last_p, last_k = seen[-1]["price_cents"], seen[-1]["o_orderkey"]
    seek = (F.col("price_cents") < last_p) | (
        (F.col("price_cents") == last_p) & (F.col("o_orderkey") > last_k)
    )
    page2 = base.where(seek).orderBy(*order).limit(_PAGE_K)
    plan = page2._jdf.queryExecution().executedPlan().toString()
    if "TakeOrderedAndProject" not in plan:
        raise RuntimeError(f"page 2 is not a row-goal TakeOrdered: {plan[:800]}")
    if "Filter" not in plan:
        raise RuntimeError(f"seek predicate missing from page-2 plan: {plan[:800]}")
    return (
        page1.withColumn("page", F.lit(1).cast("bigint"))
        .unionByName(page2.withColumn("page", F.lit(2).cast("bigint")))
        .select("page", "o_orderkey", "price_cents", "o_orderstatus")
    )


KEYSET_PAGINATION_SQL = f"""
SELECT CAST((rn - 1) // {_PAGE_K} + 1 AS BIGINT) AS page,
       o_orderkey, price_cents, o_orderstatus
FROM (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents,
         o_orderstatus,
         row_number() OVER (
           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      DESC,
                    o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= {2 * _PAGE_K}
"""


# --- explicit LINQ-shaped equi-join ---------------------------------------
# Reference: colouter.join(colinner)(outerKey, innerKey, resultSel)
# (traversableOps.scala:214-219, node traversableOperators.scala:151-185 —
# naive hash join). Spark picks broadcast-hash here since nation/region are
# bounded dimensions.
def supplier_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


SUPPLIER_NATION_REGION_SQL = """
SELECT s_suppkey, s_name, n_name AS nation_name, r_name AS region_name,
       round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


# --- semi-join via exists --------------------------------------------------
# Reference: Exists node + existsUnnester rewrite → semi-join
# (Exists.scala:6-11, Unnesting.scala:52-84). Spark: left_semi — at scale a
# shuffled semi-join on custkey; no data from the probe side is widened.
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITH_URGENT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# --- anti-join via forall / !exists ---------------------------------------
# Reference: cartProdToAntiJoin builds a driver-side key Set
# (FoldPhysicalOperators.scala:58-95) — at 100 TB that set cannot exist;
# left_anti shuffles or broadcasts per AQE stats instead.
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders.select("o_custkey"), customer.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# Non-empty anti-join twin: in this testdata every customer has orders, so
# the gate above proves only that the anti-join emits no spurious rows
# (0 == 0). Restricting the right side to urgent orders makes the
# complement real (hundreds of surviving customers) — evidence that the
# anti-join keeps exactly the unmatched left rows, not merely none.
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        urgent, customer.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


CUSTOMERS_WITHOUT_URGENT_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


# --- theta self-join (cross + filter) -------------------------------------
# Reference: nested flatMap = cartesian product; cartProdToJoin extracts the
# equi-part (FoldPhysicalOperators.scala:14-56) — Catalyst's
# ExtractEquiJoinKeys does the same: the n_regionkey equality becomes the
# join key, the < inequality stays as a post-join filter.
def nation_pairs_same_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_name") < F.col("n2.n_name")),
        )
        .select(
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
            F.col("n1.n_regionkey").alias("regionkey"),
        )
    )


NATION_PAIRS_SQL = """
SELECT n1.n_name AS nation_a, n2.n_name AS nation_b,
       n1.n_regionkey AS regionkey
FROM nation n1, nation n2
WHERE n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
"""


# --- outer join (absent from the reference, SURVEY §2.3 "not present") ----
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# --- set operations (SURVEY §2.7: Union/Diff/intersection) ----------------
# Reference Union dedups when the CanBuildFrom target is a Set
# (traversableOperators.scala:68-73) — here the Set semantics are explicit.
def brand_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") >= 25).select("p_brand")
    pricey = part.filter(F.col("p_retailprice") > 1500.0).select("p_brand")
    return big.union(pricey).distinct()


BRAND_UNION_SQL = """
SELECT p_brand FROM part WHERE p_size >= 25
UNION
SELECT p_brand FROM part WHERE p_retailprice > 1500.0
"""


def brand_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") >= 25).select("p_brand")
    # every brand occurs at every size in this data, so subtracting all
    # small-part brands yielded the empty set (a 0-row gate matches any
    # empty result — no evidence); the rarer right side keeps the
    # difference real at every SF
    small_pricey = part.filter(
        (F.col("p_size") <= 10) & (F.col("p_retailprice") > 999.0)
    ).select("p_brand")
    return big.subtract(small_pricey)


BRAND_EXCEPT_SQL = """
SELECT p_brand FROM part WHERE p_size >= 25
EXCEPT
SELECT p_brand FROM part WHERE p_size <= 10 AND p_retailprice > 999.0
"""


def brand_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") >= 25).select("p_brand")
    # 900: the synthetic prices top out under 1000 — the original 1200
    # cutoff made this a 0-row gate (matches any empty result; no evidence)
    pricey = part.filter(F.col("p_retailprice") > 900.0).select("p_brand")
    return big.intersect(pricey)


BRAND_INTERSECT_SQL = """
SELECT p_brand FROM part WHERE p_size >= 25
INTERSECT
SELECT p_brand FROM part WHERE p_retailprice > 900.0
"""


# --- bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) ---------------------
# The reference's setIntersection/setDifference stubs never distinguished
# bag from set semantics (SmartIVM.scala sets only); the engine carries
# both: the Bag kind multiset forms preserve per-element multiplicity —
# ANSI EXCEPT ALL / INTERSECT ALL, Spark exceptAll/intersectAll. Same
# single-shuffle count-compare aggregation under the hood as the set
# forms; multiplicities make the gates sensitive to duplicate handling
# the distinct forms can't see.
def brand_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") >= 25).select("p_brand")
    small = part.filter(F.col("p_size") <= 10).select("p_brand")
    return big.exceptAll(small)


BRAND_EXCEPT_ALL_SQL = """
SELECT p_brand FROM part WHERE p_size >= 25
EXCEPT ALL
SELECT p_brand FROM part WHERE p_size <= 10
"""


def brand_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") >= 25).select("p_brand")
    pricey = part.filter(F.col("p_retailprice") > 900.0).select("p_brand")
    return big.intersectAll(pricey)


BRAND_INTERSECT_ALL_SQL = """
SELECT p_brand FROM part WHERE p_size >= 25
INTERSECT ALL
SELECT p_brand FROM part WHERE p_retailprice > 900.0
"""


# --- toSet / distinct (SURVEY §2.4 toSet) ---------------------------------
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


# --- indexBy → groupBy aggregation (SURVEY §2.4 IndexBy) ------------------
# Reference indexBy builds a driver-side Map[K, Coll]
# (traversableOperators.scala:130-142); distributed form is groupBy —
# and the *index* form is a bucketed MV (see plans/).
def orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


ORDERS_BY_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderpriority
"""


# --- grouping sets / rollup (absent from reference; Spark built-in) -------
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# --- scalar string/conditional surface (SURVEY §2.9) ----------------------
def customer_name_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_name").contains("1"))
        .select(
            "c_custkey",
            F.lower("c_name").alias("lname"),
            F.upper("c_mktsegment").alias("useg"),
            F.length("c_name").alias("name_len"),
            F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("tagged"),
            F.substring("c_name", 1, 8).alias("prefix"),
            F.instr("c_name", "#").alias("hash_pos"),
        )
    )


CUSTOMER_NAME_REPORT_SQL = """
SELECT c_custkey, lower(c_name) AS lname, upper(c_mktsegment) AS useg,
       length(c_name) AS name_len,
       c_name || '/' || c_mktsegment AS tagged,
       substr(c_name, 1, 8) AS prefix,
       instr(c_name, '#') AS hash_pos
FROM customer WHERE c_name LIKE '%1%'
"""


# --- IfThenElse / when-otherwise (simpleOpenEncoding.scala:36-57) ---------
def acctbal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        customer.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_customers"))
    )


ACCTBAL_BUCKETS_SQL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bucket,
       count(*) AS n_customers
FROM customer GROUP BY 1
"""


# --- distinct aggregates & stats (SURVEY §2.4 "not present" parity) -------
def lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
    )


LINEITEM_STATS_SQL = """
SELECT count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows,
       round(avg(l_quantity), 4) AS avg_qty,
       round(stddev_samp(l_quantity), 4) AS std_qty,
       min(l_linenumber) AS min_ln,
       max(l_linenumber) AS max_ln
FROM lineitem
"""


QUERIES = {
    "flagship_order_records": (flagship_order_records, FLAGSHIP_SQL),
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "shipping_priority": (shipping_priority, SHIPPING_PRIORITY_SQL),
    "keyset_paginated_orders": (
        keyset_paginated_orders,
        KEYSET_PAGINATION_SQL,
    ),
    "supplier_nation_region": (supplier_nation_region, SUPPLIER_NATION_REGION_SQL),
    "customers_with_urgent_orders": (
        customers_with_urgent_orders,
        CUSTOMERS_WITH_URGENT_ORDERS_SQL,
    ),
    "customers_without_orders": (customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL),
    "customers_without_urgent_orders": (
        customers_without_urgent_orders,
        CUSTOMERS_WITHOUT_URGENT_SQL,
    ),
    "nation_pairs_same_region": (nation_pairs_same_region, NATION_PAIRS_SQL),
    "customer_order_counts": (customer_order_counts, CUSTOMER_ORDER_COUNTS_SQL),
    "brand_union": (brand_union, BRAND_UNION_SQL),
    "brand_except": (brand_except, BRAND_EXCEPT_SQL),
    "brand_intersect": (brand_intersect, BRAND_INTERSECT_SQL),
    "brand_except_all": (brand_except_all, BRAND_EXCEPT_ALL_SQL),
    "brand_intersect_all": (brand_intersect_all, BRAND_INTERSECT_ALL_SQL),
    "distinct_segments": (distinct_segments, DISTINCT_SEGMENTS_SQL),
    "orders_by_priority": (orders_by_priority, ORDERS_BY_PRIORITY_SQL),
    "rollup_priority_status": (rollup_priority_status, ROLLUP_SQL),
    "customer_name_report": (customer_name_report, CUSTOMER_NAME_REPORT_SQL),
    "acctbal_buckets": (acctbal_buckets, ACCTBAL_BUCKETS_SQL),
    "lineitem_stats": (lineitem_stats, LINEITEM_STATS_SQL),
}
