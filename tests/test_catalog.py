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


def test_observed_metrics_match_direct_aggregates(spark, tmp_path):
    """observe(): metrics collected during the single write action equal
    a direct aggregate pass — the zero-extra-scan reconciliation gate a
    production wash runs on every stage."""
    from pyspark.sql import functions as F

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.monitoring import observed
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    obs, out = observed(
        docs,
        "stage",
        rows=F.count(F.lit(1)),
        null_ids=F.count_if(F.col("doc_id").isNull()),
        text_bytes=F.sum(F.length("text")).cast("long"),
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "o"))  # ONE action
    direct = docs.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_if(F.col("doc_id").isNull()).alias("null_ids"),
        F.sum(F.length("text")).cast("long").alias("text_bytes"),
    ).collect()[0]
    got = obs.get
    assert got["rows"] == direct["rows"] > 0
    assert got["null_ids"] == direct["null_ids"] == 0
    assert got["text_bytes"] == direct["text_bytes"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one metric"):
        observed(docs, "empty")
