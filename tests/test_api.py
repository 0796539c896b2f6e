"""Fluent-API semantics tests: each lifted operator vs expected results.

Mirrors the reference's semantic-equivalence style (SURVEY §5.2):
``lifted-pipeline result == plain-DataFrame/known result``, compared
set-insensitively unless seq semantics are declared.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.api import Lifted, if_then_else, lift, lit
from linqonsteroids_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def t(spark):
    return {
        name: load_table(spark, SF_SMOKE, name)
        for name in ["nation", "region", "customer", "orders", "supplier"]
    }


def rows(lifted):
    return sorted(tuple(r) for r in lifted.value())


def test_map_projection(t):
    got = rows(lift(t["nation"]).map(lambda n: {"name": n.n_name, "k2": n.n_nationkey * 2}))
    want = sorted((r.n_name, r.n_nationkey * 2) for r in t["nation"].collect())
    assert got == want


def test_filter_and_chaining(t):
    got = (
        lift(t["customer"], table="customer")
        .filter(lambda c: c.c_mktsegment == "BUILDING")
        .filter(lambda c: c.c_acctbal > 0)
        .map(lambda c: c.c_custkey)
    )
    want = sorted(
        (r.c_custkey,)
        for r in t["customer"].filter("c_mktsegment = 'BUILDING' AND c_acctbal > 0").collect()
    )
    assert rows(got) == want


def test_filter_records_structure_for_rewriter(t):
    q = lift(t["customer"], table="customer").filter(
        lambda c: (c.c_mktsegment == "BUILDING") & (c.c_acctbal > 0)
    )
    assert q.plan.base_table == "customer"
    assert len(q.plan.filters) == 1
    node = q.plan.filters[0]
    assert node.kind == "and"
    assert node.args[0].kind == "eq"


def test_join_linq_shape(t):
    got = lift(t["supplier"]).join(
        lift(t["nation"]),
        outer_key=lambda s: s.s_nationkey,
        inner_key=lambda n: n.n_nationkey,
        result=lambda s, n: {"sname": s.s_name, "nname": n.n_name},
    )
    want = sorted(
        (r.s_name, r.n_name)
        for r in t["supplier"].join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .collect()
    )
    assert rows(got) == want


def test_exists_semi_and_forall_anti(t):
    cust = lift(t["customer"])
    orders = lift(t["orders"])
    with_orders = cust.exists_in(orders, lambda c, o: c.c_custkey == o.o_custkey)
    without = cust.forall_not_in(orders, lambda c, o: c.c_custkey == o.o_custkey)
    n_with = with_orders.size().value()
    n_without = without.size().value()
    assert n_with + n_without == t["customer"].count()
    assert n_without == t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).count()


def test_set_semantics_dedup_on_map(t):
    segs = lift(t["customer"], kind="set").map(lambda c: c.c_mktsegment)
    assert sorted(r[0] for r in segs.value()) == sorted(
        r[0] for r in t["customer"].select("c_mktsegment").distinct().collect()
    )


def test_union_diff_intersect(t):
    a = lift(t["nation"], kind="set").filter(lambda n: n.n_regionkey <= 2).map(lambda n: n.n_name)
    b = lift(t["nation"], kind="set").filter(lambda n: n.n_regionkey >= 2).map(lambda n: n.n_name)
    all_names = {r[0] for r in t["nation"].select("n_name").collect()}
    r2 = {r[0] for r in t["nation"].filter("n_regionkey = 2").select("n_name").collect()}
    low = {r[0] for r in t["nation"].filter("n_regionkey <= 2").select("n_name").collect()}
    assert {r[0] for r in a.union(b).value()} == all_names
    assert {r[0] for r in a.intersect(b).value()} == r2
    assert {r[0] for r in a.diff(b).value()} == low - r2


def test_scalar_aggregates(t):
    cust = lift(t["customer"])
    assert cust.size().value() == t["customer"].count()
    assert not cust.is_empty().value()
    total = cust.sum(lambda c: c.c_acctbal).value()
    want = t["customer"].agg(F.sum("c_acctbal")).collect()[0][0]
    assert abs(total - want) < 1e-9
    assert cust.exists(lambda c: c.c_acctbal < 0).value() == (
        t["customer"].filter("c_acctbal < 0").count() > 0
    )
    assert cust.forall(lambda c: c.c_acctbal > -99999).value()


def test_fold_monoids(t):
    cust = lift(t["customer"])
    assert cust.fold(0, lambda c: c.c_custkey, "max").value() == (
        t["customer"].agg(F.max("c_custkey")).collect()[0][0]
    )
    empty = lift(t["customer"]).filter(lambda c: c.c_custkey < 0)
    assert empty.fold(-1, lambda c: c.c_custkey, "sum").value() == -1


def test_index_by_agg(t):
    by_seg = lift(t["customer"]).index_by(lambda c: c.c_mktsegment, key_name="segment").count()
    got = {(r["segment"], r["n"]) for r in by_seg.value()}
    want = {
        (r["c_mktsegment"], r["count"])
        for r in t["customer"].groupBy("c_mktsegment").count().collect()
    }
    assert got == want


def test_index_by_agg_values_shape(t):
    idx = lift(t["region"]).index_by(lambda r: r.r_regionkey).agg_values()
    out = {r["key"]: r["values"] for r in idx.value()}
    assert len(out) == 5
    assert all(len(v) == 1 for v in out.values())


def test_group_by_sel(t):
    got = lift(t["nation"]).group_by_sel(
        lambda n: n.n_regionkey, lambda n: n.n_name, key_name="rk", val_name="names"
    )
    out = {r["rk"]: sorted(r["names"]) for r in got.value()}
    want = {
        r["n_regionkey"]: sorted(r["names"])
        for r in t["nation"].groupBy("n_regionkey").agg(
            F.collect_list("n_name").alias("names")
        ).collect()
    }
    assert out == want


def test_sort_take_head(t):
    top = lift(t["customer"]).sort_by("c_custkey").take(3)
    assert [r.c_custkey for r in top.value()] == [0, 1, 2]
    h = lift(t["customer"], kind="seq", order=["c_custkey"]).head().value()
    assert h.c_custkey == 0


def test_zip_with_index_and_sliding(t):
    z = lift(t["region"]).zip_with_index(order=["r_regionkey"])
    assert [(r.idx, r.r_regionkey) for r in sorted(z.value(), key=lambda r: r.idx)] == [
        (i, i) for i in range(5)
    ]
    s = lift(t["region"]).sliding(2, order=["r_regionkey"])
    wins = sorted(
        tuple(x.r_regionkey for x in r.window) for r in s.value()
    )
    assert wins == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_collect_partial_function(t):
    got = lift(t["customer"]).collect(
        lambda c: (c.c_acctbal < 0, c.c_custkey)
    )
    want = sorted((r.c_custkey,) for r in t["customer"].filter("c_acctbal < 0").collect())
    assert rows(got) == want


def test_scalar_expr_surface(t):
    got = (
        lift(t["nation"])
        .filter(lambda n: n.n_name.starts_with("NATION_1") | n.n_name.contains("_2"))
        .map(
            lambda n: {
                "lower": n.n_name.to_lower(),
                "len": n.n_name.length(),
                "flag": if_then_else(n.n_regionkey % 2 == 0, "even", "odd"),
            }
        )
    )
    for r in got.value():
        assert r["lower"] == r["lower"].lower()
        assert r["flag"] in ("even", "odd")
    assert got.size().value() > 0


def test_option_ops(t, spark):
    df = spark.createDataFrame([(1, None), (2, 5)], "id int, v int")
    out = {
        r.id: (r.defined, r.v2)
        for r in lift(df)
        .map(
            lambda x: {
                "id": x.id,
                "defined": x.v.is_defined(),
                "v2": x.v.get_or_else(0) * 10,
            }
        )
        .value()
    }
    assert out == {1: (False, 0), 2: (True, 50)}


def test_array_ops(spark):
    df = spark.createDataFrame([(1, [1, 2, 3]), (2, [4, 5])], "id int, xs array<int>")
    out = {
        r.id: (r.n, r.any_even, r.all_pos, r.doubled, r.total)
        for r in lift(df)
        .map(
            lambda x: {
                "id": x.id,
                "n": x.xs.a_size(),
                "any_even": x.xs.a_exists(lambda v: v % 2 == 0),
                "all_pos": x.xs.a_forall(lambda v: v > 0),
                "doubled": x.xs.a_map(lambda v: v * 2),
                "total": x.xs.a_fold(0, lambda a, b: a + b),
            }
        )
        .value()
    }
    assert out[1] == (3, True, True, [2, 4, 6], 6)
    assert out[2] == (2, True, True, [8, 10], 9)


def test_flat_map_explode(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, [30])], "id int, xs array<int>")
    got = rows(lift(df).flat_map(lambda x: x.xs))
    assert got == [(10,), (20,), (30,)]


def test_flat_map_join_theta(t):
    got = lift(t["nation"]).flat_map_join(
        lift(t["nation"]), lambda a, b: (a.n_regionkey == b.n_regionkey) & (a.n_name < b.n_name)
    )
    assert got.size().value() == 50  # 5 regions x C(5,2)


def test_fold_incorporates_non_identity_zero(t):
    cust = lift(t["customer"])
    n = t["customer"].count()
    # fold(10)(+) = 10 + sum(1 per row)
    assert cust.fold(10, lambda c: c.c_custkey * 0 + 1, "sum").value() == 10 + n
    # zero participates in max: max(custkey) < huge zero → zero wins
    assert cust.fold(10**9, lambda c: c.c_custkey, "max").value() == 10**9


def test_seq_projection_without_order_cols_downgrades(t):
    q = lift(t["customer"], kind="seq", order=["c_custkey"]).map(
        lambda c: {"name": c.c_name}
    )
    assert q.kind == "bag" and q.order == []
    q.to_df().limit(1).collect()  # must not raise unresolved-column


def test_agg_values_limit_per_key(t):
    idx = lift(t["nation"]).index_by(lambda n: n.n_regionkey)
    capped = {r["key"]: r["values"] for r in idx.agg_values(
        limit_per_key=2, order=["n_nationkey"]
    ).value()}
    assert len(capped) == 5 and all(len(v) == 2 for v in capped.values())
    # deterministic: first 2 nations per region by key order
    full = {r["key"]: sorted(x.n_nationkey for x in r["values"])
            for r in idx.agg_values().value()}
    for k, vs in capped.items():
        assert sorted(x.n_nationkey for x in vs) == full[k][:2]
