"""Property-based tests (hypothesis) for the r15 MERGE clause machinery
and the MIN/MAX CDF maintenance — the same model-based shape as
``test_property_mor.py`` (the r13-endorsed harness whose writing caught
a real null-group bug before any example ran).

Merge: hypothesis draws a random base snapshot, a random unique-key
source, and a random ORDERED clause list over a condition pool that
exercises three-valued logic (NULL operands), target references
(``_t_x``), UPDATE SET, and the NOT MATCHED BY SOURCE branch. A pure
python model replays SQL MERGE semantics (first-match-wins per row);
``merge_into``'s final state AND stats must match exactly.

Min/max: random delta versions maintained through
``apply_cdf_to_minmax_mv`` (additions improve, retracted extrema
rescan) must equal a from-scratch model recompute per version —
including NULL value columns, all-null groups, group moves, and groups
draining to zero.
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
        StructField("grp", StringType(), True),
        StructField("x", IntegerType(), True),  # None exercises 3VL
    ]
)

_keys = st.integers(min_value=0, max_value=6).map(lambda i: f"k{i}")
_grp = st.sampled_from([None, "g1", "g2"])
_x = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_rows = st.dictionaries(_keys, st.tuples(_grp, _x), max_size=5)

# condition pool: (sql_text_or_None, python evaluator (srow, trow))
# — srow/trow are (grp, x) tuples; comparisons with a NULL operand are
# NOT-TRUE, exactly SQL's three-valued logic
def _gt(a, b):
    return a is not None and b is not None and a > b


_MATCHED_CONDS = [
    (None, lambda s, t: True),
    ("x > 0", lambda s, t: _gt(s[1], 0)),
    ("x > _t_x", lambda s, t: _gt(s[1], t[1])),
    ("_t_x < 0", lambda s, t: _gt(0, t[1])),
]
_SOURCE_ONLY_CONDS = [
    (None, lambda s, t: True),
    ("x > 0", lambda s, t: _gt(s[1], 0)),
]
# nbs conditions see the TARGET row's columns bare
_NBS_CONDS = [
    (None, lambda s, t: True),
    ("x > 0", lambda s, t: _gt(t[1], 0)),
]

_SET = ("update", {"x": "coalesce(_t_x, 0) + coalesce(x, 0)"})


def _apply_set(trow, srow):
    tx = trow[1] if trow[1] is not None else 0
    sx = srow[1] if srow[1] is not None else 0
    return (trow[0], tx + sx)  # grp unassigned -> keeps target


_clause = st.one_of(
    st.tuples(
        st.just("matched"),
        st.sampled_from(range(len(_MATCHED_CONDS))),
        st.sampled_from(["update", "delete", "ignore", "SET"]),
    ),
    st.tuples(
        st.just("not_matched"),
        st.sampled_from(range(len(_SOURCE_ONLY_CONDS))),
        st.sampled_from(["insert", "ignore"]),
    ),
    st.tuples(
        st.just("not_matched_by_source"),
        st.sampled_from(range(len(_NBS_CONDS))),
        st.sampled_from(["delete", "ignore"]),
    ),
)


def _cond_table(branch):
    return {
        "matched": _MATCHED_CONDS,
        "not_matched": _SOURCE_ONLY_CONDS,
        "not_matched_by_source": _NBS_CONDS,
    }[branch]


def _model_merge(state: dict, source: dict, clauses: list):
    out = dict(state)
    stats = {"updated": 0, "deleted": 0, "inserted": 0,
             "deleted_by_source": 0}
    for k in sorted(source):
        srow = source[k]
        matched = k in state
        trow = state.get(k)
        for branch, ci, action in clauses:
            if branch == "not_matched_by_source":
                continue
            if (branch == "matched") != matched:
                continue
            if not _cond_table(branch)[ci][1](srow, trow):
                continue
            if action == "update":
                out[k] = srow
                stats["updated"] += 1
            elif action == "SET":
                out[k] = _apply_set(trow, srow)
                stats["updated"] += 1
            elif action == "delete":
                out.pop(k)
                stats["deleted"] += 1
            elif action == "insert":
                out[k] = srow
                stats["inserted"] += 1
            break  # first match wins (ignore also claims the row)
    for k in sorted(state):
        if k in source:
            continue
        trow = state[k]
        for branch, ci, action in clauses:
            if branch != "not_matched_by_source":
                continue
            if not _cond_table(branch)[ci][1](None, trow):
                continue
            if action == "delete":
                out.pop(k, None)
                stats["deleted_by_source"] += 1
            break
    return out, stats


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(
    base=_rows,
    source=_rows,
    clauses=st.lists(_clause, min_size=1, max_size=4),
)
def test_merge_into_matches_sql_merge_model(
    spark, tmp_path, base, source, clauses
):
    from linqonsteroids_spark.operators.mor import MorTable

    def df(d):
        return spark.createDataFrame(
            [(k, g, x) for k, (g, x) in sorted(d.items())], _SCHEMA
        )

    t = MorTable(
        spark, str(tmp_path / f"mrg_{uuid.uuid4().hex[:8]}"), "k"
    )
    t.write_base(df(base))
    real_clauses = []
    for branch, ci, action in clauses:
        cond = _cond_table(branch)[ci][0]
        real_clauses.append(
            (branch, cond, _SET if action == "SET" else action)
        )
    got_stats = t.merge_into(source=df(source), clauses=real_clauses)
    want_state, want_stats = _model_merge(base, source, clauses)
    for leg in ("updated", "deleted", "inserted"):
        assert got_stats[leg] == want_stats[leg], (leg, got_stats)
    assert (
        got_stats.get("deleted_by_source", 0)
        == want_stats["deleted_by_source"]
    )
    total = sum(want_stats.values())
    assert (got_stats["version"] is not None) == (total > 0)
    got_state = {
        r["k"]: (r["grp"], r["x"]) for r in t.read().collect()
    }
    assert got_state == want_state


# --- MIN/MAX maintenance ------------------------------------------------------

_version = st.tuples(
    st.dictionaries(_keys, st.tuples(_grp, _x), max_size=4),  # upserts
    st.sets(_keys, max_size=2),  # delete keys
)


def _model_apply(state, ups, dels):
    nxt = dict(state)
    for k in dels:
        nxt.pop(k, None)
    for k, v in ups.items():
        nxt[k] = v
    return nxt


def _model_minmax(state):
    out = {}
    for grp, x in state.values():
        mn, mx, n = out.get(grp, (None, None, 0))
        if x is not None:
            mn = x if mn is None else min(mn, x)
            mx = x if mx is None else max(mx, x)
        out[grp] = (mn, mx, n + 1)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(base=_rows, versions=st.lists(_version, min_size=1, max_size=3))
def test_minmax_mv_maintenance_matches_model(
    spark, tmp_path, base, versions
):
    from pyspark.sql import functions as F

    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.streaming.incremental import (
        apply_cdf_to_minmax_mv,
    )

    def df(d):
        return spark.createDataFrame(
            [(k, g, x) for k, (g, x) in sorted(d.items())], _SCHEMA
        )

    t = MorTable(
        spark, str(tmp_path / f"mm_{uuid.uuid4().hex[:8]}"), "k"
    )
    t.write_base(df(base))
    mv = df(base).groupBy("grp").agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count("*").cast("bigint").alias("n"),
    )
    state = base
    last_v = 0
    for i, (ups, dels) in enumerate(versions, start=1):
        dels = {k for k in dels if k not in ups}
        parts = {}
        if ups:
            parts["upserts"] = df(ups)
        if dels:
            parts["delete_keys"] = spark.createDataFrame(
                [(k,) for k in sorted(dels)], ["k"]
            )
        state = _model_apply(state, ups, dels)
        if not parts:
            continue
        t.append_delta(i, **parts)
        mv = apply_cdf_to_minmax_mv(
            mv,
            t.changes(last_v, i, include_preimages=True),
            ["grp"],
            {"mn": ("min", "x"), "mx": ("max", "x")},
            table=t.read(as_of_version=i),
            count_col="n",
        ).localCheckpoint(eager=True)
        got = {r["grp"]: (r["mn"], r["mx"], r["n"]) for r in mv.collect()}
        assert got == _model_minmax(state), f"after v{i}"
        last_v = i
