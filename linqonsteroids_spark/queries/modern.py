"""Modern SQL-surface operators (round 10): the session/sugar layer a
2025-era warehouse user expects on top of the §2 core — GROUP BY ALL /
ORDER BY ALL resolution sugar, ordered string aggregation (listagg),
exact distinct-count rollups over mergeable bitmaps, SQL-defined scalar
and table functions (Catalyst-inlined, the zero-cost abstraction the
reference's ``fmap`` identity law promises — SURVEY §2.11), the
IDENTIFIER() parameterization clause, try_-family safe arithmetic, and
deterministic mode().

Every gate follows the established hash-stability conventions: money as
DECIMAL-accumulated integer cents, ratios as floor-division ppm
integers, identical aliases both sides, scalar-only projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.sources.parquet import register_views


# --- GROUP BY ALL / ORDER BY ALL (resolution sugar) ------------------------
# The grouping keys are derived from the select list (every non-aggregate
# expression) and the ordering from the full output row, left to right.
# Pure analyzer surface: the optimized plan is identical to the explicit
# form, so the 100 TB cost model is unchanged — pinned in tests. LIMIT
# makes the ORDER BY ALL load-bearing (the driver hash is order-blind).
def groupby_all_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS qty_c
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 3
        """
    )


GROUPBY_ALL_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_c
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY 1, 2, 3, 4
LIMIT 3
"""


# --- listagg / WITHIN GROUP (ordered string aggregation) -------------------
# The BI-tool "top-N as a label" shape. The aggregated set is BOUNDED
# FIRST (per-group top-5 via a partitioned window → WindowGroupLimit),
# then listagg concatenates 5 keys per group — the string never exceeds
# ~60 chars no matter the fact-table size. listagg over an unbounded
# group would be the real 100 TB anti-pattern (a gigabyte cell).
def listagg_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH ranked AS (
          SELECT o_orderpriority, o_orderkey,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        )
        SELECT o_orderpriority,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY rn) AS top_keys,
               count(*) AS n
        FROM ranked WHERE rn <= 5
        GROUP BY o_orderpriority
        """
    )


LISTAGG_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
SELECT o_orderpriority,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_keys,
       count(*) AS n
FROM ranked WHERE rn <= 5
GROUP BY o_orderpriority
"""


# --- exact distinct over mergeable bitmaps ---------------------------------
# COUNT(DISTINCT) without the distinct shuffle: keys fold into fixed
# 4 KB bitmap segments per (group, bucket) — bitmap_bucket_number
# selects the segment, bitmap_bit_position the bit — and segments OR
# together losslessly. The global row is computed FROM the per-flag
# bitmaps by re-aggregating with bitmap_or_agg: the merge that makes
# this the exact-count twin of the HLL rollup (sketches.py) — per-
# partition/per-day bitmap MVs union into any coarser rollup without
# ever re-touching raw rows. Wire size is |buckets| × 4 KB, independent
# of row count.
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        WITH segments AS (
          SELECT l_returnflag,
                 bitmap_bucket_number(l_partkey) AS b,
                 bitmap_construct_agg(bitmap_bit_position(l_partkey)) AS bm
          FROM lineitem GROUP BY 1, 2
        ),
        per_flag AS (
          SELECT l_returnflag,
                 CAST(sum(bitmap_count(bm)) AS BIGINT) AS nd_parts
          FROM segments GROUP BY l_returnflag
        ),
        merged AS (
          SELECT '_ALL' AS l_returnflag,
                 CAST(sum(bitmap_count(bm_all)) AS BIGINT) AS nd_parts
          FROM (
            SELECT b, bitmap_or_agg(bm) AS bm_all FROM segments GROUP BY b
          )
        )
        SELECT * FROM per_flag UNION ALL SELECT * FROM merged
        """
    )


BITMAP_DISTINCT_SQL = """
SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT '_ALL' AS l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts
FROM lineitem
"""


# --- SQL-defined scalar function (CREATE FUNCTION ... RETURN expr) ---------
# The reference reifies user functions to keep them optimizable
# (Fmap/Call*, SURVEY §2.11; expressiontree.scala). Spark's SQL UDF is
# the same promise kept by the analyzer: the body INLINES into the plan
# as a plain CASE expression — no UDF node, no Python worker, full
# codegen and pushdown through it (pinned in tests). Contrast with
# functions/udf.py's pandas tier, which is the escape hatch for bodies
# SQL can't express.
def sql_udf_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION linq_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p >= 200000 THEN 'high'
                    WHEN p >= 50000  THEN 'mid'
                    ELSE 'low' END
        """
    )
    return spark.sql(
        """
        SELECT linq_tier(o_totalprice) AS tier, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS price_cents
        FROM orders GROUP BY ALL
        """
    )


SQL_UDF_TIERS_SQL = """
SELECT CASE WHEN o_totalprice >= 200000 THEN 'high'
            WHEN o_totalprice >= 50000  THEN 'mid'
            ELSE 'low' END AS tier,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS price_cents
FROM orders GROUP BY 1
"""


# --- SQL-defined TABLE function (parameterized view) ------------------------
# RETURNS TABLE: a view with arguments. The body inlines as a subquery
# with the parameter bound as a literal, so the predicate reaches the
# parquet scan as a pushed filter — a reusable, named, OPTIMIZABLE query
# fragment (the workload-repository building block plans/advisor.py
# mines for).
def sql_table_udf_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION linq_big_orders(cut DOUBLE)
        RETURNS TABLE (o_orderpriority STRING, o_totalprice DOUBLE)
        RETURN SELECT o_orderpriority, o_totalprice
               FROM orders WHERE o_totalprice > cut
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS price_cents
        FROM linq_big_orders(150000.0D)
        GROUP BY o_orderpriority
        """
    )


SQL_TABLE_UDF_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS price_cents
FROM orders WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
"""


# --- IDENTIFIER() clause: parameterized table AND column --------------------
# SQL-injection-safe dynamic SQL: session variables name the table and
# the grouping column, IDENTIFIER() binds them as identifiers (not
# strings) at analysis time — the plan is indistinguishable from the
# hand-written query. Completes the session-state triad with
# sessionvar_param_exec (value parameters) and sql_script_threshold_search
# (control flow).
def identifier_param_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    spark.sql(
        "DECLARE OR REPLACE VARIABLE linq_tbl STRING DEFAULT 'orders'"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE linq_col STRING "
        "DEFAULT 'o_orderstatus'"
    )
    return spark.sql(
        """
        SELECT IDENTIFIER(linq_col) AS status, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS price_cents
        FROM IDENTIFIER(linq_tbl)
        GROUP BY IDENTIFIER(linq_col)
        """
    )


IDENTIFIER_SQL = """
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS price_cents
FROM orders GROUP BY o_orderstatus
"""


# --- try_-family safe arithmetic --------------------------------------------
# ANSI-mode-safe ingestion arithmetic: try_divide yields NULL (never an
# error, never ±Inf) on a zero divisor. Unit margins per returnflag with
# an ENGINEERED divisor hole at l_quantity = 5; ratios emitted as
# floor-division ppm BIGINTs (identical IEEE doubles floor identically
# on both engines). The oracle expresses the same hole with NULLIF —
# the portable spelling.
def try_divide_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ratio_ppm = F.floor(
        F.try_divide(
            F.col("l_extendedprice") * F.lit(1000000.0),
            F.col("l_quantity") - F.lit(5.0),
        )
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.when(ratio_ppm.isNull(), 1).otherwise(0)).alias("n_div0"),
        F.sum(ratio_ppm).cast("bigint").alias("sum_ratio_ppm"),
    )


TRY_DIVIDE_SQL = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CASE WHEN l_quantity = 5.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div0,
       CAST(sum(floor(l_extendedprice * 1000000.0
                      / NULLIF(l_quantity - 5.0, 0.0))) AS BIGINT)
         AS sum_ratio_ppm
FROM lineitem GROUP BY l_returnflag
"""


# --- deterministic mode() ----------------------------------------------------
# mode(expr, true): the most frequent value with ties broken to the
# LOWEST value — the only mode a differential gate can use (arbitrary-
# tie mode is nondeterministic across engines AND across shuffles). The
# oracle spells out the contract: rank by (count DESC, value ASC), keep
# rank 1. One shuffle on the composite key, one on the cohort.
def mode_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy((F.col("user_id") % 16).alias("cohort"))
        .agg(
            F.expr("mode(event_type, true)").alias("top_event"),
            F.count("*").alias("n"),
        )
    )


MODE_SQL = """
SELECT cohort, top_event, n FROM (
  SELECT user_id % 16 AS cohort, event_type AS top_event,
         count(*) AS c,
         CAST(sum(count(*)) OVER (PARTITION BY user_id % 16) AS BIGINT)
           AS n,
         row_number() OVER (
           PARTITION BY user_id % 16
           ORDER BY count(*) DESC, event_type ASC
         ) AS rn
  FROM events GROUP BY 1, 2
)
WHERE rn = 1
"""


# --- DataFrame lateralJoin API (Spark 4.0) ----------------------------------
# The API twin of sql_surface_lateral_topk (subqueries.py:223), in the
# LEFT OUTER + LIMIT 1 shape: latest order per customer, customers
# without orders padded with NULLs. outer() marks the correlated
# reference; the optimizer decorrelates the per-row subquery to a
# ranked join — never a per-customer rescan (plan-pinned in tests).
def lateral_api_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    latest = (
        orders.where(F.col("c_custkey").outer() == F.col("o_custkey"))
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("latest_cents"),
        )
    )
    return cust.lateralJoin(latest, how="left").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "latest_cents"
    )


LATERAL_API_SQL = """
SELECT c_custkey, c_mktsegment, o.o_orderkey, o.latest_cents
FROM customer
LEFT JOIN (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS latest_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey DESC
         ) AS rn
  FROM orders
) o ON o.o_custkey = c_custkey AND o.rn = 1
"""


# --- FILTER (WHERE ...) clause aggregates -----------------------------------
# Conditional aggregation — the manual-pivot idiom: one pass over the
# fact table computing per-predicate partial aggregates side by side
# (N predicates for ONE scan + ONE shuffle, vs N self-joins in naive
# SQL). The oracle spells the same thing with CASE WHEN — the portable
# form FILTER desugars to.
def filter_clause_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
               count(*) FILTER (WHERE l_linestatus = 'O') AS n_o,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    FILTER (WHERE l_discount > 0.05) * 100 AS BIGINT)
                 AS disc_cents,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    FILTER (WHERE l_quantity >= 25) * 100 AS BIGINT)
                 AS bulk_cents
        FROM lineitem GROUP BY l_returnflag
        """
    )


FILTER_CLAUSE_SQL = """
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_f,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_o,
       CAST(sum(CASE WHEN l_discount > 0.05
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
            * 100 AS BIGINT) AS disc_cents,
       CAST(sum(CASE WHEN l_quantity >= 25
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
            * 100 AS BIGINT) AS bulk_cents
FROM lineitem GROUP BY l_returnflag
"""


# --- parameterized spark.sql (named + positional markers, r11) --------------
# The programmatic twin of EXECUTE IMMEDIATE (queries/misc.py): the
# Python API binds named ``:name`` markers (and positional ``?``) as
# LITERALS before analysis — no string interpolation, no injection
# surface, and (the scale point, RAISED on) the bound predicate still
# reaches the parquet scan as a PushedFilter exactly as if inlined. Both
# marker styles are exercised; both must agree row-for-row.
def parameterized_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    text = """
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS price_cents
        FROM orders
        WHERE o_totalprice >= {lo} AND o_orderstatus = {st}
        GROUP BY o_orderpriority
    """
    named = spark.sql(
        text.format(lo=":lo", st=":st"), args={"lo": 200000.0, "st": "O"}
    )
    positional = spark.sql(
        text.format(lo="?", st="?"), args=[200000.0, "O"]
    )
    plan = named._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [", 1)
    if len(pushed) < 2 or "200000.0" not in pushed[1].split("]", 1)[0]:
        raise RuntimeError(
            "named parameter did not bind as a pushed scan literal"
        )
    a = sorted(map(tuple, named.collect()))
    b = sorted(map(tuple, positional.collect()))
    if a != b:
        raise RuntimeError("named and positional binding disagree")
    return named


PARAMETERIZED_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS price_cents
FROM orders
WHERE o_totalprice >= 200000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


QUERIES = {
    "groupby_all_pricing": (groupby_all_pricing, GROUPBY_ALL_SQL),
    "parameterized_sql_revenue": (
        parameterized_sql_revenue,
        PARAMETERIZED_SQL,
    ),
    "listagg_top_orders": (listagg_top_orders, LISTAGG_SQL),
    "bitmap_exact_distinct": (bitmap_exact_distinct, BITMAP_DISTINCT_SQL),
    "sql_udf_price_tiers": (sql_udf_price_tiers, SQL_UDF_TIERS_SQL),
    "sql_table_udf_big_orders": (
        sql_table_udf_big_orders,
        SQL_TABLE_UDF_SQL,
    ),
    "identifier_param_rollup": (identifier_param_rollup, IDENTIFIER_SQL),
    "try_divide_margins": (try_divide_margins, TRY_DIVIDE_SQL),
    "mode_event_types": (mode_event_types, MODE_SQL),
    "lateral_api_latest_order": (lateral_api_latest_order, LATERAL_API_SQL),
    "filter_clause_status_matrix": (
        filter_clause_status_matrix,
        FILTER_CLAUSE_SQL,
    ),
}
