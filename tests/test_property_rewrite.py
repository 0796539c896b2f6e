"""Property-based tests (hypothesis) for the index/MV rewrite.

The reference's optimizer discipline (SURVEY §5): semantic equivalence of
optimized vs unoptimized queries on every rewrite, plus a runtime
idempotence check of the whole pipeline (``Optimization.scala:67-76``).
Here hypothesis generates random filter predicates — mixes of indexed-key
equalities, range comparisons, non-indexed equalities, and opaque string
predicates — and asserts the rewrite NEVER changes results, whether or
not it fires.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linqonsteroids_spark.api import Lifted, lift
from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.plans import IndexRepository
from tests.conftest import SF_SMOKE

SEGMENTS = ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE", "NOPE"]

#: predicate atoms as (label, lambda) — labels make failures readable
ATOMS = [
    ("seg_eq", lambda c, seg, bal: c.c_mktsegment == seg),
    ("seg_eq_flip", lambda c, seg, bal: __import__(
        "linqonsteroids_spark.api", fromlist=["lit"]
    ).lit(seg) == c.c_mktsegment),
    ("bal_gt", lambda c, seg, bal: c.c_acctbal > bal),
    ("bal_le", lambda c, seg, bal: c.c_acctbal <= bal),
    # ranges on the INDEXED column (string comparison): the r10 range
    # leg makes these fire the rewrite, including the flipped form
    # whose operator must be normalized (lit >= col ⇒ col <= lit)
    ("seg_ge", lambda c, seg, bal: c.c_mktsegment >= seg),
    ("seg_lt", lambda c, seg, bal: c.c_mktsegment < seg),
    ("seg_ge_flip", lambda c, seg, bal: __import__(
        "linqonsteroids_spark.api", fromlist=["lit"]
    ).lit(seg) >= c.c_mktsegment),
    ("key_eq", lambda c, seg, bal: c.c_custkey == 7),
    ("name_contains", lambda c, seg, bal: c.c_name.contains("1")),
    ("not_seg", lambda c, seg, bal: ~(c.c_mktsegment == seg)),
    # IN atoms on the INDEXED column (r11): a 2-list, a 1-list (the
    # degenerate equality), and a no-match list must all rewrite (or
    # residualize) without changing results
    ("seg_in2", lambda c, seg, bal: c.c_mktsegment.isin(seg, "BUILDING")),
    ("seg_in1", lambda c, seg, bal: c.c_mktsegment.isin(seg)),
    ("seg_in_none", lambda c, seg, bal: c.c_mktsegment.isin("NOPE")),
    # IN on a NON-indexed column: always a residual, never a lookup
    ("key_in", lambda c, seg, bal: c.c_custkey.isin(3, 7, 11)),
    # between lowers to two range conjuncts — on the indexed column it
    # rides the r10 range leg; on acctbal it is a reconstructed residual
    ("seg_between", lambda c, seg, bal: c.c_mktsegment.between("B", seg)),
    ("bal_between", lambda c, seg, bal: c.c_acctbal.between(bal, bal + 3000.0)),
]


@pytest.fixture(scope="module")
def prop_repo(spark, tmp_path_factory):
    storage = str(tmp_path_factory.mktemp("prop_indexes"))
    r = IndexRepository(spark, storage, n_buckets=4)
    customer = load_table(spark, SF_SMOKE, "customer")
    r.add_index(
        "customer_by_segment",
        lift(customer, table="customer").index_by(lambda c: c.c_mktsegment),
    )
    return r


def _build_query(spark, picks, seg, bal) -> Lifted:
    customer = load_table(spark, SF_SMOKE, "customer")
    q = lift(customer, table="customer")
    for _, fn in picks:
        q = q.filter(lambda c, fn=fn: fn(c, seg, bal))
    return q


@st.composite
def predicates(draw):
    picks = draw(st.lists(st.sampled_from(ATOMS), min_size=1, max_size=3))
    seg = draw(st.sampled_from(SEGMENTS))
    bal = draw(st.sampled_from([-1000.0, 0.0, 2500.0, 9999.0]))
    return picks, seg, bal


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicates())
def test_rewrite_preserves_semantics(spark, prop_repo, pred):
    picks, seg, bal = pred
    q = _build_query(spark, picks, seg, bal)
    opt = prop_repo.optimize(q)
    got = sorted(tuple(r) for r in opt.df.collect())
    want = sorted(tuple(r) for r in q.df.collect())
    labels = [label for label, _ in picks]
    assert got == want, f"rewrite changed results for {labels} seg={seg} bal={bal}"
    # pipeline idempotence (Optimization.scala:67-76): a second optimize
    # pass must be a no-op on an already-optimized query
    assert prop_repo.optimize(opt) is opt


# --- pointer-jumping connected components vs reference union-find -----------
# The pointer jump must never change the fixpoint, only the round count;
# hypothesis generates arbitrary small graphs and a plain union-find is
# the reference semantics.


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from linqonsteroids_spark.operators.fixpoint import connected_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.label for r in connected_components(pairs).collect()}
    nodes = {n for e in edges for n in e}
    want = _union_find_components(edges, nodes)
    assert got == want


# --- interval-overlap join: property-based equivalence -----------------------
@st.composite
def interval_sets(draw):
    def ivs(tag):
        n = draw(st.integers(min_value=1, max_value=12))
        out = []
        for i in range(n):
            k = draw(st.integers(min_value=0, max_value=2))
            s = draw(st.integers(min_value=-50, max_value=120))
            ln = draw(st.integers(min_value=0, max_value=60))
            out.append((k, tag * 1000 + i, s, s + ln))
        return out

    cell = draw(st.sampled_from([1, 7, 10, 64]))
    return ivs(1), ivs(2), cell


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(interval_sets())
def test_interval_overlap_join_property(spark, data):
    """For random interval sets (negative starts, zero-length, straddling
    spans) and several cell sizes, the grid-bucketed join equals the
    quadratic brute force, each pair exactly once."""
    from linqonsteroids_spark.operators.intervals import interval_overlap_join

    rows_l, rows_r, cell = data
    left = spark.createDataFrame(rows_l, "k long, lid long, ls long, le long")
    right = spark.createDataFrame(rows_r, "k long, rid long, rs long, re long")
    got = [
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", cell_size=cell, keys=["k"]
        ).collect()
    ]
    want = {
        (ld, rd)
        for (lk, ld, ls, le) in rows_l
        for (rk, rd, rs, re) in rows_r
        if lk == rk and max(ls, rs) <= min(le, re)
    }
    assert set(got) == want
    assert len(got) == len(want)  # exactly once, no distinct
