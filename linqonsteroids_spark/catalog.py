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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table as a DataFrame (lazy parquet scan).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark rejects
    ([PARQUET_TYPE_ILLEGAL]); we read it as raw nanos via the legacy conf
    and truncate to microsecond TimestampType (matching DuckDB's read).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integer division — (ts / 1000).cast would round-trip through double
        # and lose precision at 1.7e18 ns
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
