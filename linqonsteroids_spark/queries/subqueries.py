"""Subquery-decorrelation surface: the Fegaras–Maier unnesting family
the reference implements as hand-written rewrite rules, exercised here as
one-SQL-text-both-engines gates that Catalyst must unnest on its own.

Reference parity: the reference's `existsUnnester` / `generalUnnesting`
(`optimization/Unnesting.scala:52-84,101-134`) turn nested `exists` /
flatMap-of-flatMap comprehensions into joins; Catalyst's
`RewritePredicateSubquery` (EXISTS/IN → semi/anti join) and
`DecorrelateInnerQuery`/`RewriteCorrelatedScalarSubquery` (correlated
scalar → aggregate + outer join) are the built-in equivalents. Each gate
below is a TPC-H-shaped query whose naive reading is a per-row subquery
rescan — O(rows × subquery) — and whose decorrelated plan is a constant
number of joins/aggregates; at 100 TB the rewrite IS the feasibility
line. The repo-wide plan audit (tools/plan_audit.py) asserts none of
them degrades to a cartesian/nested-loop shape.

Hash discipline (MEMORY: oracle-hash-pitfalls): money accumulates in
DECIMAL(18,2) and is emitted as fixed-point BIGINT (cents / c4); counts
and quantity sums (integer-valued doubles, exact under any summation
order) cast to BIGINT; rank cut lines order by integers only. One SQL
text serves Spark and the DuckDB oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _run(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    from linqonsteroids_spark.sources.parquet import register_views

    register_views(spark, sf_dir, tables)
    return spark.sql(sql)


# Q17-shaped: CORRELATED SCALAR subquery — each lineitem compares against
# its part's average quantity. Catalyst decorrelates to a grouped
# aggregate of lineitem joined back on l_partkey (two passes over the
# fact, one shuffle each), never a per-row rescan. The avg threshold is
# ulp-safe: l_quantity is integer-valued (sum exact in double under any
# order), so 0.2 * avg is bit-identical on both engines.
SQL_Q17_SMALL_QTY = """
SELECT CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 0) * 100
            AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 15
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def sql_surface_small_qty_revenue(spark, sf_dir):
    return _run(spark, sf_dir, ["lineitem", "part"], SQL_Q17_SMALL_QTY)


# Q18-shaped: aggregated IN-subquery — the membership set is itself a
# GROUP BY ... HAVING aggregate. Catalyst plans a semi join of orders
# against the aggregated lineitem (map-side-combined), then the detail
# join; the top-k cut orders by exact integer cents with a key tiebreak.
SQL_Q18_LARGE_ORDERS = """
SELECT c_name, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_cents,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c_name, o_orderkey, o_totalprice
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 50
"""


def sql_surface_large_orders(spark, sf_dir):
    return _run(
        spark, sf_dir, ["customer", "orders", "lineitem"], SQL_Q18_LARGE_ORDERS
    )


# Q21-shaped: DOUBLE-correlated EXISTS + NOT EXISTS on the same fact —
# suppliers who were the ONLY 'R'-flag line on a multi-supplier finished
# order. The reference's existsUnnester handles one level
# (Unnesting.scala:52-84); Catalyst's RewritePredicateSubquery plans BOTH
# as one semi and one anti join on l_orderkey, three passes over
# lineitem total, no per-row rescan.
SQL_Q21_WAITING_SUPPLIERS = """
SELECT s_name, n_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


def sql_surface_waiting_suppliers(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        ["supplier", "lineitem", "orders", "nation"],
        SQL_Q21_WAITING_SUPPLIERS,
    )


# Q22-shaped: UNCORRELATED scalar threshold (computed once, broadcast)
# + NOT EXISTS anti join — above-average-balance customers who never
# placed an urgent order. The scalar avg is a one-row subquery both
# engines evaluate once; the anti join replaces the per-customer rescan.
SQL_Q22_IDLE_RICH = """
SELECT c_mktsegment AS segment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS totacctbal_cents
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def sql_surface_idle_rich_customers(spark, sf_dir):
    return _run(spark, sf_dir, ["customer", "orders"], SQL_Q22_IDLE_RICH)


# Q7-shaped: the SAME dimension joined twice under different aliases
# (supplier nation vs customer nation) — alias-scoped attribute
# resolution plus two independent broadcasts of one table; the
# disjunctive nation pair filter pushes into both dimension scans.
# year() is cast to BIGINT on both engines (Spark types it INT, DuckDB
# BIGINT — the cast pins the gated type).
SQL_Q7_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) * 10000
            AS BIGINT) AS revenue_c4
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
"""


def sql_surface_volume_shipping(spark, sf_dir):
    return _run(
        spark,
        sf_dir,
        ["supplier", "lineitem", "orders", "customer", "nation"],
        SQL_Q7_VOLUME_SHIPPING,
    )


# Q15-shaped: CTE reused twice — once as the join side, once under a
# scalar max() — the "top-1 of an aggregate" idiom. Revenue is exact
# fixed-point BIGINT BEFORE the max, so the cut line is integer-exact;
# ties (several suppliers at the max) are all returned, same both sides.
SQL_Q15_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2))) * 10000
              AS BIGINT) AS total_revenue_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue_c4
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_c4 = (SELECT max(total_revenue_c4) FROM revenue)
"""


def sql_surface_top_supplier(spark, sf_dir):
    return _run(spark, sf_dir, ["supplier", "lineitem"], SQL_Q15_TOP_SUPPLIER)


# Q14-shaped: conditional revenue share — both the filtered and the
# total sum in one pass (the CASE factor stays integer so the DECIMAL
# product type matches on both engines). Emitted as two exact
# fixed-point columns, not a float ratio (no boundary exists).
SQL_Q14_PROMO_REVENUE = """
SELECT CAST(sum((CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END)
               * CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) * 10000
            AS BIGINT) AS promo_rev_c4,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) * 10000
            AS BIGINT) AS total_rev_c4,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def sql_surface_promo_revenue(spark, sf_dir):
    return _run(spark, sf_dir, ["lineitem", "part"], SQL_Q14_PROMO_REVENUE)


# LATERAL correlated LIMIT — top-2 priciest lineitems PER ORDER as a
# lateral subquery (the reference's generalUnnesting shape,
# Unnesting.scala:101-134: flatMap of a correlated inner query).
# Catalyst decorrelates ORDER BY ... LIMIT under LATERAL into
# WindowGroupLimit + row_number + one hash join (verified in the plan) —
# NOT a per-order rescan; DuckDB evaluates the same text natively.
SQL_LATERAL_TOPK = """
SELECT o_orderkey, t.l_linenumber,
       CAST(CAST(t.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
FROM orders JOIN LATERAL (
  SELECT l_linenumber, l_extendedprice
  FROM lineitem
  WHERE l_orderkey = o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber
  LIMIT 2
) t ON true
WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def sql_surface_lateral_topk(spark, sf_dir):
    return _run(spark, sf_dir, ["orders", "lineitem"], SQL_LATERAL_TOPK)


# Correlated scalar COUNT in the SELECT list — the classic "count bug"
# case: a naive decorrelation to inner join + group drops zero-match
# outer rows (nations with no suppliers must report 0, not vanish or go
# NULL). Catalyst's RewriteCorrelatedScalarSubquery inserts the left
# outer join + coalesce; the gate fails if either engine gets the
# zero-group semantics wrong.
SQL_NATION_CENSUS = """
SELECT n_name,
       (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_suppliers,
       (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
FROM nation
"""


def sql_surface_nation_census(spark, sf_dir):
    return _run(
        spark, sf_dir, ["nation", "supplier", "customer"], SQL_NATION_CENSUS
    )


# NOT IN over a NULLABLE inner column — three-valued logic forces the
# null-AWARE anti join (a plain anti join is wrong the moment the inner
# side can hold a NULL). The CASE types the column nullable while the
# WHERE keeps actual NULLs out, so the gate has non-trivial output; the
# reachable-NULL poison case (NOT IN over a set containing NULL selects
# NOTHING) is pinned separately in pytest where the inner set is a
# literal table that does contain one.
SQL_NULL_AWARE_ANTI = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE p_size NOT IN (SELECT CASE WHEN l_quantity > 45 THEN NULL
                                 ELSE CAST(l_linenumber AS INT) END
                     FROM lineitem
                     WHERE l_returnflag = 'A' AND l_quantity <= 45)
GROUP BY p_brand
"""


def sql_surface_null_aware_anti(spark, sf_dir):
    return _run(spark, sf_dir, ["part", "lineitem"], SQL_NULL_AWARE_ANTI)


# --- canon completion: the remaining classic shapes this schema can ---------
# express (Q2/Q4/Q6/Q11/Q12/Q16/Q20 need partsupp / commitdate /
# shipmode columns the testdata lacks; these five adapt each query's
# REWRITE-relevant structure — the part Catalyst must decorrelate or
# specialize — onto the available columns). With these, every TPC-H
# optimization shape is registry-covered.

# Q4-shaped: correlated EXISTS against the fact with a PER-ROW date
# comparison (l_shipdate > o_orderdate) — not a constant predicate, so
# the semi join must carry the outer column into the join condition.
SQL_Q4_PRIORITY_CHECK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def sql_surface_priority_check(spark, sf_dir):
    return _run(spark, sf_dir, ["orders", "lineitem"], SQL_Q4_PRIORITY_CHECK)


# Q6-shaped: the pure scan-filter-aggregate — no join at all; the whole
# query should collapse to one pushed-filter parquet scan plus a single
# partial/final agg pair. Revenue = price * discount accumulates in
# DECIMAL (scale 4 after the product), emitted fixed-point.
SQL_Q6_FORECAST_REVENUE = """
SELECT CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2))), 0) * 10000
            AS BIGINT) AS revenue_c4,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def sql_surface_forecast_revenue(spark, sf_dir):
    return _run(spark, sf_dir, ["lineitem"], SQL_Q6_FORECAST_REVENUE)


# Q11-shaped: group-HAVING against a SCALAR SUBQUERY over the same
# grouped CTE — the value-concentration cut. Threshold arithmetic stays
# all-DECIMAL/BIGINT (v * 10n > 12 * total, i.e. share > 1.2x average)
# so the boundary is exact on both engines; avg() is avoided because
# DuckDB's DECIMAL avg degrades to DOUBLE.
SQL_Q11_VALUE_CONCENTRATION = """
WITH pv AS (SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v,
                   count(*) AS n_lines
            FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, CAST(v * 100 AS BIGINT) AS value_cents, n_lines
FROM pv
WHERE v * (SELECT 10 * count(*) FROM pv) > (SELECT 12 * sum(v) FROM pv)
"""


def sql_surface_value_concentration(spark, sf_dir):
    return _run(spark, sf_dir, ["lineitem"], SQL_Q11_VALUE_CONCENTRATION)


# Q16-shaped: COUNT DISTINCT over a join, minus a NOT IN supplier
# exclusion set — the distinct-agg expands to two-phase (partial
# distinct then count) and the NOT IN plans as an anti join (inner side
# non-null, so no null-aware penalty). Top-40 cut is fully tiebroken.
SQL_Q16_SUPPLIER_VARIETY = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1000.0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 40
"""


def sql_surface_supplier_variety(spark, sf_dir):
    return _run(
        spark, sf_dir, ["lineitem", "part", "supplier"], SQL_Q16_SUPPLIER_VARIETY
    )


# Q20-shaped: IN-subquery whose inner is itself a grouped HAVING
# against a scalar global aggregate — the two-level nesting (semi join
# of supplier against an aggregate of a join). sum(l_quantity) is
# integer-valued, so the 0.001 * total threshold is one IEEE multiply
# of an exact value — identical on both engines.
SQL_Q20_EXCESS_SUPPLIERS = """
SELECT s_name,
       CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'large%'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > (SELECT 0.001 * sum(l_quantity) FROM lineitem))
"""


def sql_surface_excess_suppliers(spark, sf_dir):
    return _run(
        spark, sf_dir, ["supplier", "lineitem", "part"], SQL_Q20_EXCESS_SUPPLIERS
    )


QUERIES = {
    "sql_surface_small_qty_revenue": (
        sql_surface_small_qty_revenue,
        SQL_Q17_SMALL_QTY,
    ),
    "sql_surface_large_orders": (sql_surface_large_orders, SQL_Q18_LARGE_ORDERS),
    "sql_surface_waiting_suppliers": (
        sql_surface_waiting_suppliers,
        SQL_Q21_WAITING_SUPPLIERS,
    ),
    "sql_surface_idle_rich_customers": (
        sql_surface_idle_rich_customers,
        SQL_Q22_IDLE_RICH,
    ),
    "sql_surface_volume_shipping": (
        sql_surface_volume_shipping,
        SQL_Q7_VOLUME_SHIPPING,
    ),
    "sql_surface_top_supplier": (sql_surface_top_supplier, SQL_Q15_TOP_SUPPLIER),
    "sql_surface_promo_revenue": (
        sql_surface_promo_revenue,
        SQL_Q14_PROMO_REVENUE,
    ),
    "sql_surface_lateral_topk": (sql_surface_lateral_topk, SQL_LATERAL_TOPK),
    "sql_surface_nation_census": (sql_surface_nation_census, SQL_NATION_CENSUS),
    "sql_surface_null_aware_anti": (
        sql_surface_null_aware_anti,
        SQL_NULL_AWARE_ANTI,
    ),
    "sql_surface_priority_check": (
        sql_surface_priority_check,
        SQL_Q4_PRIORITY_CHECK,
    ),
    "sql_surface_forecast_revenue": (
        sql_surface_forecast_revenue,
        SQL_Q6_FORECAST_REVENUE,
    ),
    "sql_surface_value_concentration": (
        sql_surface_value_concentration,
        SQL_Q11_VALUE_CONCENTRATION,
    ),
    "sql_surface_supplier_variety": (
        sql_surface_supplier_variety,
        SQL_Q16_SUPPLIER_VARIETY,
    ),
    "sql_surface_excess_suppliers": (
        sql_surface_excess_suppliers,
        SQL_Q20_EXCESS_SUPPLIERS,
    ),
}
