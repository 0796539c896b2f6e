"""Table catalog: the engine's scan/source layer.

The reference lifts in-memory collections as leaf relations
(``ConstByIdentity``, ``traversableOps.scala:281-282``); our leaves are
parquet scans — declarative, so Catalyst gets predicate pushdown, column
pruning and partition pruning for free. At 100 TB the same call reads a
partitioned/bucketed table; nothing here materializes on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: tables small enough to broadcast at ANY scale factor (dimension tables
#: bounded by schema: 5 regions, 25 nations).
BROADCAST_TABLES = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-tz TimestampType whatever the file
    shipped as. Generations of the testdata have stored it as parquet
    TIMESTAMP(NANOS) (Spark reads it as a raw long under the legacy
    ``nanosAsLong`` conf) and TIMESTAMP(MICROS) without UTC adjustment
    (Spark infers TIMESTAMP_NTZ). The session timezone is pinned to UTC
    (`session.py`), so the NTZ→TZ cast is wall-clock identity and both
    shapes land on the same values DuckDB reads. Works on batch and
    streaming DataFrames alike (dtype dispatch, no action triggered).
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer division — (ts / 1000).cast would round-trip through double
        # and lose precision at 1.7e18 ns
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table as a DataFrame (lazy parquet scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
