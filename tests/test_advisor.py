"""Workload advisor tests — SparkCruise-style automatic index selection.

The manual path (IndexRepository.add_index) is covered by
test_index_rewrite; here the advisor must (1) mine repeated filter-key
patterns out of observed queries, (2) materialize indexes only for hot
patterns, and (3) leave every later matching query rewriting to the
shared MV with identical results.
"""

from __future__ import annotations

import pytest

from linqonsteroids_spark.api import lift
from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.plans import IndexRepository
from linqonsteroids_spark.plans.advisor import WorkloadAdvisor
from tests.conftest import SF_SMOKE


@pytest.fixture()
def advisor(spark, tmp_path):
    repo = IndexRepository(spark, str(tmp_path / "adv_idx"), n_buckets=4)
    sources = {
        "customer": lambda: lift(
            load_table(spark, SF_SMOKE, "customer"), table="customer"
        ),
        "orders": lambda: lift(
            load_table(spark, SF_SMOKE, "orders"), table="orders"
        ),
    }
    return WorkloadAdvisor(repo, sources, min_count=2)


def _seg_query(spark, seg):
    customer = load_table(spark, SF_SMOKE, "customer")
    return lift(customer, table="customer").filter(
        lambda c: c.c_mktsegment == seg
    )


def test_advisor_mines_repeated_patterns(spark, advisor):
    # two queries on the same (table, column) → advised; one-off → not
    advisor.observe(_seg_query(spark, "BUILDING"))
    advisor.observe(_seg_query(spark, "MACHINERY"))
    orders = load_table(spark, SF_SMOKE, "orders")
    advisor.observe(
        lift(orders, table="orders").filter(lambda o: o.o_orderstatus == "F")
    )
    advised = advisor.advise()
    assert ("customer", "c_mktsegment", 2) in advised
    assert not any(t == "orders" for t, _c, _n in advised)


def test_auto_materialize_then_rewrite(spark, advisor):
    advisor.observe(_seg_query(spark, "BUILDING"))
    advisor.observe(_seg_query(spark, "MACHINERY"))
    entries = advisor.auto_materialize()
    assert [(e.table, e.key_col) for e in entries] == [("customer", "c_mktsegment")]

    # a THIRD query with the same shape now rewrites to the advised MV
    q = _seg_query(spark, "AUTOMOBILE")
    opt = advisor.repo.optimize(q)
    files = opt.df.inputFiles()
    assert files and all("adv_customer_c_mktsegment" in f for f in files)
    assert sorted(map(tuple, opt.df.collect())) == sorted(map(tuple, q.df.collect()))

    # idempotent: nothing new to advise after materialization
    assert advisor.advise() == []
    assert advisor.auto_materialize() == []


def test_advisor_mines_repeated_join_chains(spark, advisor):
    # two differently-FILTERED repetitions of the same customer⋈orders
    # chain → one advised join MV; both filters stay per-query residuals
    def co_query(status):
        customer = lift(
            load_table(spark, SF_SMOKE, "customer"), table="customer"
        )
        orders = lift(load_table(spark, SF_SMOKE, "orders"), table="orders")
        return customer.join(
            orders, lambda c: c.c_custkey, lambda o: o.o_custkey
        ).filter(lambda r: r.o_orderstatus == status)

    advisor.observe(co_query("F"))
    advisor.observe(co_query("O"))
    [(sig, n)] = advisor.advise_joins()
    assert sig == (("customer", "orders"), (("c_custkey", "o_custkey"),)) and n == 2

    entries = advisor.auto_materialize()
    assert any(getattr(e, "tables", None) == ("customer", "orders") for e in entries)

    # a third repetition now rewrites to the advised join MV: no Join
    # operator survives in the plan, results match the plain query
    q = co_query("P")
    opt = advisor.repo.optimize(q)
    files = opt.df.inputFiles()
    assert files and all("adv_join_customer_orders" in f for f in files)
    plan = opt.df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert sorted(map(tuple, opt.df.collect())) == sorted(map(tuple, q.df.collect()))
    assert advisor.advise_joins() == []
