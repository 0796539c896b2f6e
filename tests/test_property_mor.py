"""Property-based tests (hypothesis) for the MOR change-feed family.

hypothesis generates a random base snapshot plus 1-3 random delta
versions (upserts and deletes over a small key pool, values drawn from
a small pool including None and a NULLABLE group column); a plain
python dict model replays them. Everything the feed family claims must
match the model exactly:

- ``read(as_of_version=v)`` equals the model state after version v;
- ``changes(v-1, v)`` classifies exactly the ops the model applied
  (insert = upsert on an absent key, update = upsert on a present key
  even when values are identical — the feed reflects COMMITS — delete
  only when the key existed, post-images for insert/update, PRE-images
  for delete);
- the Delta-CDF pre-image protocol's retraction algebra
  (``apply_cdf_to_agg_mv``) maintained per version lands on the same
  (sum, count)-by-group aggregate as recomputing from the final state
  — including NULL group keys, which a non-null-safe merge would split
  into duplicate MV rows (the bug this suite was written against).

This is the test shape the r13 verdict endorsed for the snapshot-diff
family: coincidence-reachable bugs (identical upsert values, None
groups, delete-then-upsert within a window) shrink straight to a
minimal repro.
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("grp", StringType(), True),  # None is a real group
        StructField("x", IntegerType(), True),
    ]
)

_keys = st.integers(min_value=0, max_value=6).map(lambda i: f"k{i}")
_grp = st.sampled_from([None, "g1", "g2"])
_x = st.integers(min_value=-3, max_value=3)
_snapshot = st.dictionaries(_keys, st.tuples(_grp, _x), max_size=5)
_version = st.tuples(
    st.dictionaries(_keys, st.tuples(_grp, _x), max_size=4),  # upserts
    st.sets(_keys, max_size=2),  # delete keys
)


def _model_apply(state: dict, ups: dict, dels: set) -> dict:
    nxt = dict(state)
    for k in dels:
        nxt.pop(k, None)
    for k, v in ups.items():
        nxt[k] = v
    return nxt


def _model_feed(prev: dict, ups: dict, dels: set) -> dict:
    feed = {}
    for k, v in ups.items():
        feed[k] = ("update" if k in prev else "insert", v)
    for k in dels:
        if k not in ups and k in prev:
            feed[k] = ("delete", prev[k])  # PRE-image
    return feed


def _model_mv(state: dict) -> dict:
    out: dict = {}
    for grp, x in state.values():
        s, n = out.get(grp, (0, 0))
        out[grp] = (s + x, n + 1)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(base=_snapshot, versions=st.lists(_version, min_size=1, max_size=3))
def test_mor_change_feed_family_matches_model(
    spark, tmp_path, base, versions
):
    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_agg_mv,
    )
    from pyspark.sql import functions as F

    def df(d):
        return spark.createDataFrame(
            [(k, g, x) for k, (g, x) in sorted(d.items())], _SCHEMA
        )

    t = MorTable(
        spark, str(tmp_path / f"mor_{uuid.uuid4().hex[:8]}"), "k"
    )
    t.write_base(df(base))
    mv = df(base).groupBy("grp").agg(
        F.sum("x").alias("sx"), F.count("*").cast("bigint").alias("n")
    )
    states = [base]
    last_v = 0  # last COMMITTED version (0 = the horizon/base state)
    for i, (ups, dels) in enumerate(versions, start=1):
        # within one version, a key is either upserted or deleted
        dels = {k for k in dels if k not in ups}
        parts = {}
        if ups:
            parts["upserts"] = df(ups)
        if dels:
            parts["delete_keys"] = spark.createDataFrame(
                [(k,) for k in sorted(dels)], ["k"]
            )
        prev = states[-1]
        states.append(_model_apply(prev, ups, dels))
        if not parts:
            # append_delta refuses empty versions; model state repeats
            continue
        t.append_delta(i, **parts)

        # 1) the change feed classifies exactly the model's ops
        feed = {
            r["k"]: (r["_change_type"], (r["grp"], r["x"]))
            for r in t.changes(last_v, i).collect()
        }
        assert feed == _model_feed(prev, ups, dels)

        # 2) CDF-maintained MV stays equal to a model recompute
        mv = apply_cdf_to_agg_mv(
            mv,
            t.changes(last_v, i, include_preimages=True),
            ["grp"],
            {"sx": "x"},
            count_col="n",
        ).localCheckpoint(eager=True)
        got_mv = {r["grp"]: (r["sx"], r["n"]) for r in mv.collect()}
        assert got_mv == _model_mv(states[-1])

        # 3) as-of reconstruction equals the model state
        got_state = {
            r["k"]: (r["grp"], r["x"])
            for r in t.read(as_of_version=i).collect()
        }
        assert got_state == states[-1]
        last_v = i

    final = {r["k"]: (r["grp"], r["x"]) for r in t.read().collect()}
    assert final == states[-1]
