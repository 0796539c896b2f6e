"""Catalog scan-layer tests: events.ts normalization across testdata
generations.

The driver has shipped events.parquet with ts as parquet TIMESTAMP(NANOS)
(Spark reads a raw long under the nanosAsLong conf) and as
TIMESTAMP(MICROS) without UTC adjustment (Spark infers TIMESTAMP_NTZ).
Round 3 lost every events-based correctness row to the switch;
normalize_events_ts dispatches on the actual dtype so either encoding —
or a plain TimestampType — lands on identical session-tz values.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table, normalize_events_ts
from tests.conftest import SF_SMOKE

_WALL = dt.datetime(2024, 3, 1, 12, 34, 56, 789000)
_MICROS = int(_WALL.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


@pytest.mark.parametrize(
    "dtype,value",
    [
        ("bigint", _MICROS * 1000),  # raw nanos (nanosAsLong read)
        ("timestamp_ntz", _WALL),  # micros without UTC adjustment
        ("timestamp", _WALL),  # already session-tz: pass-through
    ],
)
def test_normalize_events_ts_encodings(spark, dtype, value):
    df = spark.createDataFrame([(1, value)], f"event_id long, ts {dtype}")
    out = normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.collect()[0].ts
    assert got == _WALL  # UTC session tz (session.py) makes this exact


def test_load_table_events_ts_is_timestamp(spark):
    events = load_table(spark, SF_SMOKE, "events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    # values must agree with DuckDB's read of the same file
    import duckdb

    d = duckdb.sql(
        f"SELECT min(ts) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    s = events.agg(F.min("ts")).collect()[0][0]
    assert s == d


def test_variant_parses_typed_structure(spark):
    """The VARIANT gate's docstring promise: props parses into typed
    structure (schema_of_variant sees OBJECT<k: BIGINT>), and
    try_variant_get yields NULL — never an error — on missing paths and
    type mismatches."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").limit(5)
    rows = ev.select(
        F.schema_of_variant(F.parse_json("props")).alias("sch"),
        F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
        F.try_variant_get(F.parse_json("props"), "$.nope", "long").alias("m"),
        F.try_variant_get(F.parse_json("props"), "$", "long").alias("bad"),
    ).collect()
    assert all(r.sch == "OBJECT<k: BIGINT>" for r in rows)
    assert all(r.k is not None and r.m is None for r in rows)
    # an OBJECT root cannot cast to long: try_ semantics -> NULL, no error
    # (note scalar casts COERCE where sensible, e.g. long->boolean)
    assert all(r.bad is None for r in rows)
