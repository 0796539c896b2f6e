"""File-format readers/writers beyond parquet: CSV, JSON, ORC.

The reference has no file formats at all (SURVEY §2.1) — this is new
surface a standalone engine needs. Two scale disciplines baked in:

- **Schema is always explicit.** ``inferSchema``/``samplingRatio`` mean an
  extra full pass over the data before the query even starts — at 100 TB
  that is a second job. Readers here take a ``StructType`` (or a template
  DataFrame to copy one from) and fail fast on mismatch
  (``mode=FAILFAST`` by default) instead of silently nulling columns.
- **Formats are not equal.** CSV/JSON are row-oriented text: no column
  pruning, no predicate pushdown, no row-group stats — a scan reads
  everything. They are ingest/interchange formats; convert to parquet (or
  a bucketed table) at the pipeline boundary and query that. ORC is
  columnar like parquet and keeps pushdown.

Environment boundary (the PIL/PyAV pattern, declared not hidden): Avro
is NOT covered here because this container ships Spark's core avro
codec jars but not the ``spark-avro`` data-source module, and there is
no network to fetch it. On a cluster with the connector on the
classpath, ``spark.read.format("avro")`` composes with everything in
this module unchanged (explicit schema via ``avroSchema``, same
FAILFAST discipline); XML joined the covered set in round 9 via
``from_xml``/``to_xml``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _schema_of(schema: StructType | DataFrame) -> StructType:
    return schema.schema if isinstance(schema, DataFrame) else schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | DataFrame,
    header: bool = True,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """CSV scan with mandatory schema; FAILFAST surfaces bad rows as errors
    instead of silent nulls (use mode='PERMISSIVE' + a corrupt-record
    column for quarantine pipelines)."""
    return (
        spark.read.schema(_schema_of(schema))
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | DataFrame,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """JSON-lines scan with mandatory schema (no sampling pass)."""
    return (
        spark.read.schema(_schema_of(schema)).options(mode=mode, **options).json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar; schema travels with the file and pushdown
    works, so no explicit schema needed."""
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
