"""Property-based tests (hypothesis) for snapshot reconciliation.

hypothesis generates random keyed snapshots and random mutation sets
(delete / insert / change / null-swap / no-op); a plain python dict
model computes the ground-truth classification. The operators under
test — flat diff, changed-columns projection, bucketed diff at several
bucket counts — must match the model EXACTLY. This is the test shape
that would have caught both r13 digest bugs up front (the null-skip
conflation and the xor pair-cancellation): both are reachable only
through value coincidences example-based tests rarely stumble into,
and hypothesis shrinks straight to them.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import StringType, StructField, StructType

_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("a", StringType(), True),
        StructField("b", StringType(), True),
    ]
)

# small value pool ON PURPOSE: duplicate payloads across keys and
# value-swaps between columns are exactly the coincidences that broke
# the digests; None participates everywhere
_vals = st.sampled_from([None, "x", "y", "F"])
_rows = st.dictionaries(
    st.integers(min_value=0, max_value=30).map(lambda i: f"k{i}"),
    st.tuples(_vals, _vals),
    min_size=0,
    max_size=12,
)


def _model_diff(v1: dict, v2: dict) -> dict[str, tuple]:
    out = {}
    for k in v1.keys() | v2.keys():
        if k not in v1:
            out[k] = ("added", [])
        elif k not in v2:
            out[k] = ("removed", [])
        elif v1[k] != v2[k]:
            cols = [
                c
                for c, (x, y) in zip(("a", "b"), zip(v1[k], v2[k]))
                if x != y
            ]
            out[k] = ("changed", cols)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(v1=_rows, v2=_rows)
def test_snapshot_diff_family_matches_model(spark, v1, v2):
    from linqonsteroids_spark.operators.tablediff import (
        snapshot_diff,
        snapshot_diff_bucketed,
        snapshot_diff_columns,
    )

    def df(d):
        return spark.createDataFrame(
            [(k, a, b) for k, (a, b) in sorted(d.items())], _SCHEMA
        )

    expected = _model_diff(v1, v2)
    l, r = df(v1), df(v2)

    flat = {
        row["k"]: row["change_type"]
        for row in snapshot_diff(l, r, ["k"]).collect()
    }
    assert flat == {k: t for k, (t, _) in expected.items()}

    cols = {
        row["k"]: (row["change_type"], row["changed_columns"])
        for row in snapshot_diff_columns(l, r, ["k"]).collect()
    }
    assert cols == expected

    for n in (1, 4):  # 1 forces every coincidence into one bucket
        diff, _, _ = snapshot_diff_bucketed(l, r, ["k"], n_buckets=n)
        got = {row["k"]: row["change_type"] for row in diff.collect()}
        assert got == flat, f"n_buckets={n}"
