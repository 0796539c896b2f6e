"""Sources & sinks.

The reference has no file formats, connectors, or sinks (SURVEY §2.1) —
sources are lifted in-memory collections and results are Scala values.
Here the equivalents plus the new surface a real engine needs:

- ``register_views``: the ``Queryable`` mixin analogue
  (``Queryable.scala:27-43``) — make catalog tables addressable by name so
  queries can be written in SQL (``spark.sql``) against the same scans.
- ``write_parquet``: the materialization sink (``eval``/``force`` for
  big results — never ``collect()``).
- ``write_bucketed_table``: the scale-path index/MV layout — bucketed +
  sorted by key, so equi-joins and key lookups on two co-bucketed tables
  shuffle NOTHING (bucket pruning + co-located join). This is what
  ``plans.IndexRepository`` upgrades to on a managed cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linqonsteroids_spark.catalog import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register catalog tables as temp views for the SQL surface."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Plain parquet sink; ``partition_by`` for low-cardinality partition
    pruning (date/tag columns, never high-cardinality keys)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table (requires a warehouse-enabled
    session). Two tables bucketed identically on the join key give
    shuffle-free joins; bucket pruning serves point lookups."""
    if mode == "overwrite":
        # the warehouse dir outlives an in-memory metastore: a table
        # directory left by an earlier process collides on location even
        # under overwrite (the fresh catalog has no table to drop). Drop
        # both the catalog entry and, for local warehouses, the stale dir.
        import os
        import shutil
        from urllib.parse import urlparse

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            shutil.rmtree(os.path.join(wh.path, table_name.lower()), ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table_name)
