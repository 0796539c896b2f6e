"""Type-dispatch, JSON, date/time, cube, and as-of join queries.

Covers the reference's runtime type tests (SURVEY §2.9 type tests; §2.10
TypeMapping) on the events table (event_type = the tag column), plus the
"free parity surface" the reference lacks: JSON extraction, date
functions, CUBE grouping sets, and the as-of temporal join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.operators.asof import asof_join
from linqonsteroids_spark.operators.typefilter import type_case, type_filter


# --- typeFilter over the tag column ---------------------------------------
def typefilter_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = type_filter(events, "click", tag_col="event_type")
    return clicks.select("event_id", "user_id", F.round("value", 4).alias("value"))


TYPEFILTER_SQL = """
SELECT event_id, user_id, round(value, 4) AS value
FROM events WHERE event_type = 'click'
"""


# --- typeCase: per-tag projection, unmatched rows dropped -----------------
def typecase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = type_case(
        events,
        [
            ("click", lambda df: F.round(df["value"] * 2, 4)),
            ("purchase", lambda df: F.round(df["value"] + 100, 4)),
        ],
        tag_col="event_type",
        out_col="projected",
    )
    return out.select("event_id", F.col("event_type").alias("tag"), "projected")


TYPECASE_SQL = """
SELECT event_id, event_type AS tag,
       CASE WHEN event_type = 'click' THEN round(value * 2, 4)
            WHEN event_type = 'purchase' THEN round(value + 100, 4) END AS projected
FROM events WHERE event_type IN ('click', 'purchase')
"""


# --- JSON scalar functions (SURVEY §2.9: "none" in reference) -------------
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# --- VARIANT semi-structured processing (Spark 4) ----------------------------
# The modern replacement for per-path get_json_object re-parsing: props
# parses ONCE into the binary VARIANT encoding, every extraction is a
# typed path read on that parsed value (parse_json + try_variant_get —
# missing paths/type mismatches yield NULL, not errors), and
# schema_of_variant proves the engine sees typed structure, pinned in
# pytest rather than gated (its render syntax is Spark-specific). At
# 100 TB the one-parse property is the difference between J parses and 1
# per row for J extracted paths. Oracle: DuckDB's JSON extraction over
# the same paths — VARIANT is an encoding, not a semantics change, so
# typed values must agree exactly.
def variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.absent_path", "long")
    return (
        events.select("event_type", k.alias("k"), missing.alias("m"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_high"),
            F.sum("k").alias("sum_high"),
            F.count("m").alias("n_absent"),  # try_ semantics: NULL, never error
        )
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_high,
       CAST(sum(k) AS BIGINT) AS sum_high,
       count(TRY_CAST(json_extract_string(props, '$.absent_path') AS BIGINT))
         AS n_absent
FROM (
  SELECT event_type, props,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
) WHERE k >= 50
GROUP BY event_type
"""


# --- date/timestamp functions (reference has NO temporal types, §1.3) -----
def orders_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd")
    return (
        orders.groupBy(month.alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


ORDERS_MONTHLY_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
"""


def events_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 200).select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


EVENTS_TIME_SQL = """
SELECT event_id,
       year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events WHERE event_id < 200
"""


# --- CUBE (grouping sets family; rollup already covered) ------------------
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# --- as-of join (operators/asof.py) ---------------------------------------
# For each purchase event: the user's most recent strictly-earlier click
# (ties on ts broken by max event_id). One shuffle on (user, ts).
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["value"],
        strict=True,
        right_tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", F.round("asof_value", 4).alias("last_click_value")
    )


ASOF_SQL = """
SELECT event_id, user_id, last_click_value FROM (
  SELECT p.event_id, p.user_id,
         round(c.value, 4) AS last_click_value,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY (c.ts IS NOT NULL) DESC, c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts < p.ts
) WHERE rn = 1
"""


# Same as-of semantics through the hot-key-bounded path: the window
# partitions by (user, 6-hour bucket) with cross-bucket carry-over, so a
# hot user cannot serialize into one task. Identical oracle — identical
# results are the point.
def asof_purchase_click_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["value"],
        strict=True,
        right_tiebreak="event_id",
        time_bucket_width=6 * 3600,
    )
    return out.select(
        "event_id", "user_id", F.round("asof_value", 4).alias("last_click_value")
    )


# --- nearest as-of join (merge_asof direction='nearest') ---------------------
# Each purchase matched to the temporally NEAREST click of the same user
# within ±1 hour — backward or forward, backward winning |Δ| ties
# (operators/asof.py:asof_join_nearest: one non-strict backward as-of +
# one strict as-of over negated epoch times + a row-local pick; two
# shuffles, hot keys boundable per pass). Times travel as epoch
# microseconds — exact integers on both engines (unix_micros/epoch_us) —
# so the signed nearest_delta is hash-stable with no rounding. The oracle
# is the quadratic banded join + ranking form.
_NEAREST_TOL_US = 3_600_000_000  # 1 hour


def nearest_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linqonsteroids_spark.operators.asof import asof_join_nearest

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.col("event_id").alias("click_id"),
    )
    out = asof_join_nearest(
        purchases,
        clicks,
        on="user_id",
        left_time="ts_us",
        right_time="click_ts_us",
        value_cols=["click_id"],
        right_tiebreak="click_id",
        tolerance=_NEAREST_TOL_US,
    )
    return out.select(
        "event_id", "user_id", "ts_us", "nearest_click_id", "nearest_delta"
    )


NEAREST_ASOF_SQL = f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT p.event_id, c.click_id,
         c.click_ts_us - p.ts_us AS delta,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(c.click_ts_us - p.ts_us) ASC,
                    CASE WHEN c.click_ts_us <= p.ts_us THEN 0 ELSE 1 END ASC,
                    c.click_id DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE abs(c.click_ts_us - p.ts_us) <= {_NEAREST_TOL_US}
)
SELECT p.event_id, p.user_id, p.ts_us,
       m.click_id AS nearest_click_id,
       m.delta AS nearest_delta
FROM p LEFT JOIN (SELECT event_id, click_id, delta FROM cand WHERE rn = 1) m
  USING (event_id)
"""


# --- time-series gap filling (resample to a dense hourly grid) --------------
# Downstream consumers of event-rate series (anomaly detection, charting,
# forecasting features) need DENSE series: an hour with no events must be
# an explicit 0 row, not a hole. Per event type: hourly counts, then a
# spine of every hour in that type's own [min, max] span, left-joined and
# zero-filled.
# Scale: the only corpus-sized work is one map-side-combined (type, hour)
# count agg; the spine derives from a 1-row-per-type bounds agg expanded
# row-locally with `sequence` (O(types × hours) rows — metadata-sized next
# to the events), and the fill join runs on that small grid. No window, no
# driver loop, no per-row Python.
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    counts = ev.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    spine = (
        ev.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    return spine.join(
        counts,
        (spine.event_type == counts.event_type) & (spine.hour_ts == counts.h),
        "left",
    ).select(
        spine.event_type,
        "hour_ts",
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


EVENTS_GAPFILL_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('hour', ts) AS h FROM events
), counts AS (
  SELECT event_type, h, count(*) AS n FROM t GROUP BY event_type, h
), spine AS (
  SELECT event_type,
         unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS hour_ts
  FROM t GROUP BY event_type
)
SELECT s.event_type, s.hour_ts, coalesce(c.n, 0) AS n_events
FROM spine s LEFT JOIN counts c
  ON c.event_type = s.event_type AND c.h = s.hour_ts
"""


# --- XML parse path (Spark 4 native to_xml/from_xml) -----------------------
# The semi-structured triad completed: JSON (events_json_stats), VARIANT
# (variant_event_props), and XML. Each order row is serialized to an XML
# fragment and parsed back through from_xml with an explicit schema —
# the parse path under test is Spark's, the values are the base table's,
# so the oracle is plain SQL over orders: any drift (type coercion,
# field loss, encoding) breaks the hash. Money re-aggregates through
# DECIMAL cents per the established discipline.
def xml_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    xml = orders.select(
        F.to_xml(
            F.struct("o_orderkey", "o_orderstatus", "o_totalprice")
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x", "o_orderkey bigint, o_orderstatus string, o_totalprice double"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r.o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("r.o_orderkey")).alias("key_sum"),
        (F.sum(F.col("r.o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("total_cents"),
    )


XML_ROUNDTRIP_SQL = """
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS total_cents
FROM orders
GROUP BY o_orderstatus
"""


# --- string collations (Spark 4): case-insensitive semantics in the type ---
# UTF8_LCASE moves case-insensitivity INTO the column type — grouping,
# equality, and DISTINCT all honor it with no per-row lower() in the
# user's query (at scale: one collated sort key instead of a derived
# column, and the semantics survive into every downstream operator).
# The gate mixes case deterministically (even custkeys lowered), groups
# by the COLLATED value, and counts collated-equality matches against a
# deliberately mixed-case literal ('bUiLdInG'). Projection lowers and
# re-CASTs to plain STRING: lower() of either case representative is
# identical, so the output never depends on WHICH representative the
# agg kept. The oracle compiles the same semantics to lower().
# Known engine trade-off (visible in tools/plan_audit.py as a warn):
# collated group keys have an immutable agg-buffer type, so Spark plans
# SortAggregate instead of HashAggregate — at 100 TB, grouping on a
# derived lower() column keeps the hash agg if that cost matters more
# than keeping the semantics in the type.
COLLATED_SEGMENT_SQL = """
SELECT lower(seg) AS segment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS bal_cents,
       CAST(sum(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_building_ci
FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                  ELSE c_mktsegment END AS seg,
             c_acctbal
      FROM customer)
GROUP BY 1
"""


def collated_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linqonsteroids_spark.sources.parquet import register_views

    register_views(spark, sf_dir, ["customer"])
    return spark.sql("""
        SELECT CAST(lower(seg_ci) AS STRING) AS segment,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS bal_cents,
               CAST(sum(CASE WHEN seg_ci = 'bUiLdInG' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_building_ci
        FROM (SELECT collate(CASE WHEN c_custkey % 2 = 0
                                  THEN lower(c_mktsegment)
                                  ELSE c_mktsegment END,
                             'UTF8_LCASE') AS seg_ci,
                     c_acctbal
              FROM customer)
        GROUP BY seg_ci""")


QUERIES = {
    "typefilter_clicks": (typefilter_clicks, TYPEFILTER_SQL),
    "collated_segment_stats": (collated_segment_stats, COLLATED_SEGMENT_SQL),
    "xml_roundtrip_orders": (xml_roundtrip_orders, XML_ROUNDTRIP_SQL),
    "events_hourly_gapfill": (events_hourly_gapfill, EVENTS_GAPFILL_SQL),
    "typecase_events": (typecase_events, TYPECASE_SQL),
    "events_json_stats": (events_json_stats, EVENTS_JSON_SQL),
    "variant_event_props": (variant_event_props, VARIANT_PROPS_SQL),
    "orders_monthly_revenue": (orders_monthly_revenue, ORDERS_MONTHLY_SQL),
    "events_time_features": (events_time_features, EVENTS_TIME_SQL),
    "cube_priority_status": (cube_priority_status, CUBE_SQL),
    "asof_purchase_click": (asof_purchase_click, ASOF_SQL),
    "nearest_purchase_click": (nearest_purchase_click, NEAREST_ASOF_SQL),
    "asof_purchase_click_bucketed": (asof_purchase_click_bucketed, ASOF_SQL),
}
