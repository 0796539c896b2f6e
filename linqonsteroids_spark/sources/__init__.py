"""Sources & sinks: parquet read/write, bucketed tables, SQL view registry."""

from linqonsteroids_spark.sources.parquet import (  # noqa: F401
    register_views,
    write_bucketed_table,
    write_parquet,
)
