"""Deterministic cardinality sketches: KMV (k-minimum-values) distinct
counting.

Spark's ``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_distinct`` use different sketch internals, so their estimates can
never be oracle-compared. KMV gives the same capability — bounded-memory
distinct estimation with ~1/sqrt(k) relative error — from nothing but a
uniform hash and a top-k, both of which this engine already computes
bit-identically in both engines (the md5 family from queries/pipeline.py,
the two-stage top-k from quota_per_source). Estimator: with the k-th
smallest of n distinct uniform hashes at height h, n ≈ (k-1)/h; fewer
than k distinct values means the sketch IS the exact set.

Scale: the sketch of any group is k values — constant memory per group —
and the two-stage window bounds hot-group skew exactly like
quota_per_source. The exact count emitted next to the estimate (for the
relative-error column) is the one part that's only cheap at test scale;
at 100 TB you'd drop it — it exists to measure the sketch against truth
under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.queries.pipeline import _hash_frac, _hash_frac_sql

KMV_K = 32
_KMV_SEED = "kmv"
_N_SUB = 16


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: KMV estimate of distinct users vs the exact count.

    distinct (type, user) → two-stage top-K by hash per type (subshard
    prune, then final — identical to the quota_per_source skew bound) →
    (k-1)/h_k estimator, exact when the group has < K distinct users."""
    events = load_table(spark, sf_dir, "events")
    du = (
        events.select("event_type", "user_id")
        .distinct()
        .withColumn("h", _hash_frac(_KMV_SEED, F.col("user_id")))
    )
    pruned = (
        du.withColumn(
            "rn1",
            F.row_number().over(
                Window.partitionBy(
                    "event_type", (F.col("user_id") % _N_SUB)
                ).orderBy("h", "user_id")
            ),
        )
        .filter(F.col("rn1") <= KMV_K)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h", "user_id")
            ),
        )
        .filter(F.col("rn") <= KMV_K)
    )
    sketch = pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    exact = du.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_users")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise((F.lit(KMV_K - 1)) / F.col("kth"))
    return (
        sketch.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "exact_users",
            F.round(est, 2).alias("kmv_est"),
            F.round(
                F.abs(est - F.col("exact_users")) / F.col("exact_users"), 4
            ).alias("rel_err"),
        )
    )


KMV_DISTINCT_SQL = f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
),
hashed AS (
  SELECT event_type, user_id,
         {_hash_frac_sql(_KMV_SEED, "user_id")} AS h
  FROM du
),
pruned AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
  FROM hashed
),
sketch AS (
  SELECT event_type, count(*) AS n_kept, max(h) AS kth
  FROM pruned WHERE rn <= {KMV_K} GROUP BY event_type
),
exact AS (
  SELECT event_type, count(*) AS exact_users FROM du GROUP BY event_type
)
SELECT s.event_type, e.exact_users,
       round(CASE WHEN s.n_kept < {KMV_K} THEN CAST(s.n_kept AS DOUBLE)
                  ELSE {KMV_K - 1} / s.kth END, 2) AS kmv_est,
       round(abs(CASE WHEN s.n_kept < {KMV_K} THEN CAST(s.n_kept AS DOUBLE)
                      ELSE {KMV_K - 1} / s.kth END - e.exact_users)
             / e.exact_users, 4) AS rel_err
FROM sketch s JOIN exact e USING (event_type)
"""


# --- KMV sketch union (mergeability — the distributed-rollup property) -------
# The reason sketches beat exact distinct at 100 TB is MERGEABILITY:
# per-partition/per-group sketches combine into the global answer without
# re-reading data. KMV merges losslessly: every one of the global k
# smallest hashes is, in its own group, among that group's k smallest —
# so the k-min of the union of per-group k-min sketches EQUALS the k-min
# over all raw values, and the merged estimate is IDENTICAL to the
# direct global estimate (not merely close). The gate emits both paths
# plus the exact global count; the oracle replays them, so equality is
# hash-verified on real data every round.
# Scale: the MERGED path is the production one — per-group windows are
# key-partitioned and the union of sketches is |groups| x k rows
# (bounded), so the final global k-min runs over sketch rows, never raw
# data. The DIRECT path (a global window over all distinct values) and
# the exact count exist only to prove losslessness under the gate — at
# 100 TB you'd drop both, exactly like kmv_distinct_users' exact column.
def kmv_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    du = (
        events.select("event_type", "user_id")
        .distinct()
        .withColumn("h", _hash_frac(_KMV_SEED, F.col("user_id")))
    )
    # per-group sketches: k smallest hashes per event_type
    per_group = du.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("h", "user_id")
        ),
    ).filter(F.col("rn") <= KMV_K)
    # merge: global k-min over the union of the per-group sketches.
    # (user_id, h) pairs repeat across groups — the merged sketch is over
    # DISTINCT values, exactly as a re-scan would see them.
    merged = (
        per_group.select("user_id", "h")
        .distinct()
        .withColumn(
            "mrn", F.row_number().over(Window.orderBy("h", "user_id"))
        )
        .filter(F.col("mrn") <= KMV_K)
        .agg(F.count(F.lit(1)).alias("m_kept"), F.max("h").alias("m_kth"))
    )
    # direct: global k-min over the raw distinct values
    direct = (
        du.select("user_id", "h")
        .distinct()
        .withColumn(
            "drn", F.row_number().over(Window.orderBy("h", "user_id"))
        )
        .filter(F.col("drn") <= KMV_K)
        .agg(F.count(F.lit(1)).alias("d_kept"), F.max("h").alias("d_kth"))
    )
    exact = du.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("exact_users")
    )

    def est(kept, kth):
        return F.when(
            F.col(kept) < KMV_K, F.col(kept).cast("double")
        ).otherwise(F.lit(KMV_K - 1) / F.col(kth))

    return (
        merged.crossJoin(F.broadcast(direct))
        .crossJoin(F.broadcast(exact))
        .select(
            "exact_users",
            F.round(est("m_kept", "m_kth"), 2).alias("merged_est"),
            F.round(est("d_kept", "d_kth"), 2).alias("direct_est"),
            (est("m_kept", "m_kth") == est("d_kept", "d_kth")).alias(
                "merge_lossless"
            ),
        )
    )


KMV_UNION_SQL = f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
),
hashed AS (
  SELECT event_type, user_id,
         {_hash_frac_sql(_KMV_SEED, "user_id")} AS h
  FROM du
),
per_group AS (
  SELECT user_id, h FROM (
    SELECT event_type, user_id, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
merged AS (
  SELECT count(*) AS m_kept, max(h) AS m_kth FROM (
    SELECT user_id, h,
           row_number() OVER (ORDER BY h, user_id) AS mrn
    FROM (SELECT DISTINCT user_id, h FROM per_group)
  ) WHERE mrn <= {KMV_K}
),
direct AS (
  SELECT count(*) AS d_kept, max(h) AS d_kth FROM (
    SELECT user_id, h,
           row_number() OVER (ORDER BY h, user_id) AS drn
    FROM (SELECT DISTINCT user_id, h FROM hashed)
  ) WHERE drn <= {KMV_K}
),
exact AS (
  SELECT count(DISTINCT user_id) AS exact_users FROM du
)
SELECT e.exact_users,
       round(CASE WHEN m.m_kept < {KMV_K} THEN CAST(m.m_kept AS DOUBLE)
                  ELSE {KMV_K - 1} / m.m_kth END, 2) AS merged_est,
       round(CASE WHEN d.d_kept < {KMV_K} THEN CAST(d.d_kept AS DOUBLE)
                  ELSE {KMV_K - 1} / d.d_kth END, 2) AS direct_est,
       (CASE WHEN m.m_kept < {KMV_K} THEN CAST(m.m_kept AS DOUBLE)
             ELSE {KMV_K - 1} / m.m_kth END
        = CASE WHEN d.d_kept < {KMV_K} THEN CAST(d.d_kept AS DOUBLE)
               ELSE {KMV_K - 1} / d.d_kth END) AS merge_lossless
FROM merged m CROSS JOIN direct d CROSS JOIN exact e
"""


# --- count-min sketch (frequency estimation / heavy hitters) -----------------
# The frequency-side companion to KMV's cardinality sketch (Cormode &
# Muthukrishnan, J. Algorithms 2005): d hash rows of w counters; add each
# key's count to cell (r, h_r(key)); estimate = min over rows — one-sided
# (est >= true, never under). All d hashes come from ONE md5 per DISTINCT
# key (four disjoint 8-hex-digit slices = four independent 32-bit hashes
# — the measured lesson from bloomjoin: hashing per condition, not per
# row, is what keeps this cheap), and the sketch is built from the exact
# per-key aggregate, which is identical to streaming row-updates but one
# map-side-combined shuffle instead of |events| cell updates. w=64 is
# deliberately SMALL for the gate so collisions actually occur and the
# overcount column measures real sketch error; production sizing is
# w = ceil(e/eps). Probe set: the top-20 true heavy hitters
# (deterministic tiebreak). Everything integer — exact across engines.
_CMS_W = 64
_CMS_D = 4
_CMS_TOPK = 20


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    hx = counts.withColumn("h", F.md5(F.col("user_id").cast("string")))
    bucket = [
        F.conv(F.substring("h", 1 + 8 * d, 8), 16, 10).cast("long") % _CMS_W
        for d in range(_CMS_D)
    ]
    cells = (
        hx.select(
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(d).alias("d"), bucket[d].alias("bucket"))
                        for d in range(_CMS_D)
                    ]
                )
            ).alias("db"),
        )
        .groupBy("db.d", "db.bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
    probes = (
        hx.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("user_id"))
            ),
        )
        .filter(F.col("rn") <= _CMS_TOPK)
        .select("user_id", "cnt", "h")
    )
    # probe each heavy hitter's d cells; cells is tiny (d*w rows) and
    # broadcasts
    probe_cells = (
        probes.select(
            "user_id",
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(d).alias("d"), bucket[d].alias("bucket"))
                        for d in range(_CMS_D)
                    ]
                )
            ).alias("db"),
        )
        .select("user_id", "cnt", F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .join(F.broadcast(cells), ["d", "bucket"])
    )
    return (
        probe_cells.groupBy("user_id", "cnt")
        .agg(F.min("cell").alias("est_cnt"))
        .select(
            "user_id",
            F.col("cnt").alias("true_cnt"),
            "est_cnt",
            (F.col("est_cnt") - F.col("cnt")).alias("overcount"),
        )
    )


CMS_SQL = f"""
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
), hx AS (
  SELECT user_id, cnt, md5(CAST(user_id AS VARCHAR)) AS h FROM counts
), dims AS (
  SELECT unnest(range({_CMS_D})) AS d
), cells AS (
  SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS cell FROM (
    SELECT u.cnt, dims.d,
           ('0x' || substr(u.h, 1 + 8 * dims.d::INT, 8))::BIGINT % {_CMS_W}
             AS bucket
    FROM hx u CROSS JOIN dims
  ) GROUP BY d, bucket
), probes AS (
  SELECT user_id, cnt, h FROM hx
  ORDER BY cnt DESC, user_id LIMIT {_CMS_TOPK}
), probe_cells AS (
  SELECT p.user_id, p.cnt, c.cell
  FROM (
    SELECT p0.user_id, p0.cnt, dims.d,
           ('0x' || substr(p0.h, 1 + 8 * dims.d::INT, 8))::BIGINT % {_CMS_W}
             AS bucket
    FROM probes p0 CROSS JOIN dims
  ) p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
)
SELECT user_id, cnt AS true_cnt,
       CAST(min(cell) AS BIGINT) AS est_cnt,
       CAST(min(cell) - cnt AS BIGINT) AS overcount
FROM probe_cells GROUP BY user_id, cnt
"""


# --- engine-native approximate aggregates, gated on their ERROR CONTRACT -----
# approx_count_distinct (HyperLogLog++) and approx_percentile
# (QuantileSummaries) have engine-specific sketch internals whose
# estimates can never hash-match DuckDB's. What IS cross-engine
# checkable is the published error bound: each gate computes the exact
# truth (identical on both engines) AND, Spark-side only, an integer
# verdict that the estimate satisfies its contract; the oracle emits
# the exact truth with a literal verdict of 1. A bound violation turns
# the gate red — the contract, not the sketch internals, is what a
# 100 TB user actually relies on (estimate-only plans replace the exact
# pass entirely at scale; the exact column exists to measure truth
# under the gate, same note as the KMV module header).

_HLL_RSD = 0.05


def hll_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users next to a verdict that the
    HLL++ estimate (rsd=0.05) lands within 3 standard errors — one
    aggregation pass computes both (HLL++ is a map-side-combinable
    sketch, so the shuffle carries one register block per group, not
    user ids)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", _HLL_RSD).alias("_hll"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_hll") - F.col("exact_users"))
                <= 3 * _HLL_RSD * F.col("exact_users") + F.lit(1)
            )
            .cast("bigint")
            .alias("hll_within_3se"),
        )
    )


HLL_BOUNDS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       1 AS hll_within_3se
FROM events GROUP BY event_type
"""


_PCTL_ACCURACY = 1000


def approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per l_returnflag: verdict that approx_percentile's median lands
    within its guaranteed RANK error (n / accuracy). Pass 1 computes the
    estimate per group (one grouped agg); pass 2 broadcasts the 3-row
    estimate table back onto the fact to count rows <= estimate — the
    exact rank — and checks |rank - n/2| <= n/accuracy + 1. The
    broadcast-join-back pattern is the scale shape: the second pass is
    one more map-side scan, no extra shuffle of the fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    est = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", 0.5, _PCTL_ACCURACY
        ).alias("_p50"),
        F.count("*").alias("n_rows"),
    )
    ranked = li.join(
        F.broadcast(est.select("l_returnflag", "_p50")), "l_returnflag"
    )
    rank = ranked.groupBy("l_returnflag").agg(
        F.sum(
            (F.col("l_extendedprice") <= F.col("_p50")).cast("bigint")
        ).alias("_rank")
    )
    return (
        est.join(rank, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            (
                F.abs(F.col("_rank") - F.col("n_rows") / 2)
                <= F.col("n_rows") / _PCTL_ACCURACY + F.lit(1)
            )
            .cast("bigint")
            .alias("median_within_rank_bound"),
        )
    )


PCTL_BOUNDS_SQL = """
SELECT l_returnflag, count(*) AS n_rows, 1 AS median_within_rank_bound
FROM lineitem GROUP BY l_returnflag
"""


QUERIES = {
    "kmv_distinct_users": (kmv_distinct_users, KMV_DISTINCT_SQL),
    "kmv_sketch_union": (kmv_sketch_union, KMV_UNION_SQL),
    "cms_heavy_hitters": (cms_heavy_hitters, CMS_SQL),
    "hll_distinct_bounds": (hll_distinct_bounds, HLL_BOUNDS_SQL),
    "approx_quantile_bounds": (approx_quantile_bounds, PCTL_BOUNDS_SQL),
}
