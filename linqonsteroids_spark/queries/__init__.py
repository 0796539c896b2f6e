"""Query registry: every implemented operator exposed as a (spark_fn, oracle_sql) pair.

Each module defines ``QUERIES: dict[name -> (callable, sql | None)]`` where
the callable takes ``(spark, sf_dir)`` and returns a DataFrame, and the SQL
is the DuckDB-runnable oracle over the same parquet tables. ``None`` marks
genuinely non-SQL-expressible ops (driver records a rows-only check).

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
value-hashing. Double-typed outputs are rounded on BOTH sides so bitwise
summation-order differences between engines cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from linqonsteroids_spark.queries import (
    contamination,
    core,
    dedup,
    engine,
    graph,
    misc,
    nested,
    parity,
    pipeline,
    scale,
    sketches,
    text,
    typed,
    vector,
    windows,
)

_MODULES = [
    core, windows, graph, text, vector, dedup, typed, nested, misc,
    scale, engine, parity, pipeline, contamination, sketches,
]

ALL: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        if _k in ALL:
            raise ValueError(f"duplicate query name {_k!r}")
        ALL[_k] = _v


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in ALL.items() if v[1] is not None}
