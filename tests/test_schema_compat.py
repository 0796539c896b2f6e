"""functions/schema_compat.py: every verdict class is pinned against the
REAL engine — the checker's claim and an actual parquet write/read must
agree, so the compatibility table can never drift from Spark behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import StructType

from linqonsteroids_spark.functions.schema_compat import (
    reader_compatibility,
)


def _schema(ddl: str) -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def _verdict(written_ddl: str, declared_ddl: str) -> dict:
    return reader_compatibility(_schema(written_ddl), _schema(declared_ddl))


def test_safe_evolutions_claimed_and_real(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(100000, 1.5, "s")], "a int, b float, c string"
    ).write.parquet(path)
    for declared, classes in [
        ("a long, b float, c string", {("widened", "a")}),
        ("a int, b double, c string", {("widened", "b")}),
        ("a double, b float, c string", {("widened", "a")}),
        ("a int, b float", {("dropped", "c")}),
        ("a int, b float, c string, d int", {("added-null", "d")}),
    ]:
        v = _verdict("a int, b float, c string", declared)
        assert v["compatible"], (declared, v)
        assert set(v["findings"]) == classes
        rows = spark.read.schema(declared).parquet(path).collect()
        assert rows[0]["a"] in (100000, 100000.0)  # value survives


def test_loud_incompatibilities_claimed_and_real(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([(2**40, "s")], "a long, c string").write.parquet(
        path
    )
    v = _verdict("a long, c string", "a int, c string")
    assert not v["compatible"]
    assert ("type-incompatible", "a") in v["findings"]
    with pytest.raises(Exception):
        spark.read.schema("a int, c string").parquet(path).collect()
    v2 = _verdict("a long, c string", "a long, c int")
    assert not v2["compatible"]
    assert ("type-incompatible", "c") in v2["findings"]


def test_silent_narrowing_is_flagged_because_the_engine_is_not(
    spark, tmp_path
):
    """The class that justifies the checker: parquet stores small ints
    as physical INT32, so a narrower declared type does NOT error —
    out-of-range values silently wrap. Only metadata catches it."""
    path = str(tmp_path / "t")
    spark.createDataFrame([(100000,)], "a int").write.parquet(path)
    v = _verdict("a int", "a short")
    assert not v["compatible"]
    assert v["findings"] == [("silent-narrowing", "a")]
    # the engine neither errors nor preserves the value
    got = spark.read.schema("a short").parquet(path).collect()[0]["a"]
    assert got != 100000  # silently wrapped — exactly the hazard


def test_metadata_only_classes():
    v = _verdict("a int", "a int, d string NOT NULL")
    assert not v["compatible"]
    assert ("added-required", "d") in v["findings"]
    v2 = _verdict("a int", "a int NOT NULL")
    assert not v2["compatible"]
    assert v2["findings"] == [("nullability-tightened", "a")]
    assert _verdict("a int, b float", "a int, b float") == {
        "compatible": True,
        "findings": [],
    }


def test_widening_with_nullability_tightening_is_still_unsafe():
    """ADVICE r12: the type-changed branch used to `continue` past the
    nullability check, so written-int-nullable -> declared-bigint-NOT-NULL
    was reported only as 'widened' and compatible=True. Nullability is
    orthogonal: both findings must surface and the verdict is unsafe."""
    v = _verdict("a int", "a bigint NOT NULL")
    assert ("widened", "a") in v["findings"]
    assert ("nullability-tightened", "a") in v["findings"]
    assert not v["compatible"]
    # same orthogonality through the unsafe type classes
    v2 = _verdict("a int", "a smallint NOT NULL")
    assert ("silent-narrowing", "a") in v2["findings"]
    assert ("nullability-tightened", "a") in v2["findings"]
    assert not v2["compatible"]
