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


# --- saved-workload log replay (plans/workload.py) ---------------------------


def test_workload_log_replay_equals_live_observation(spark, advisor, tmp_path):
    """Recording shapes to the JSONL log and replaying into a FRESH
    advisor must leave exactly the counters live observation would —
    filter patterns AND join signatures — so offline advice equals
    online advice for the same workload."""
    from linqonsteroids_spark.plans.workload import WorkloadLog

    log = WorkloadLog(str(tmp_path / "wl.jsonl"))
    customer = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")

    def workload():
        yield _seg_query(spark, "BUILDING")
        yield _seg_query(spark, "MACHINERY")
        yield lift(orders, table="orders").filter(
            lambda o: o.o_orderstatus == "F"
        )
        for _ in range(2):  # repeated join chain
            yield lift(customer, table="customer").join(
                lift(orders, table="orders"),
                lambda c: c.c_custkey,
                lambda o: o.o_custkey,
            )

    live = advisor
    for q in workload():
        live.observe(q)
        log.record(q)

    repo2 = IndexRepository(spark, str(tmp_path / "adv_idx2"), n_buckets=4)
    replayed = WorkloadAdvisor(
        repo2,
        {
            "customer": lambda: lift(
                load_table(spark, SF_SMOKE, "customer"), table="customer"
            ),
            "orders": lambda: lift(
                load_table(spark, SF_SMOKE, "orders"), table="orders"
            ),
        },
        min_count=2,
    )
    assert log.replay_into(replayed) == 5
    assert replayed._patterns == live._patterns
    assert replayed._join_patterns == live._join_patterns
    assert replayed.advise() == live.advise()
    assert replayed.advise_joins() == live.advise_joins()
    # the join signature survived the JSON round-trip as proper tuples
    assert replayed.advise_joins(), "repeated join chain must be advised"


def test_workload_log_append_merge(spark, tmp_path):
    """JSONL logs are append-mergeable: two days' logs concatenated
    replay to the sum of their counters (the multi-process contract)."""
    from linqonsteroids_spark.plans.workload import WorkloadLog

    p = tmp_path / "wl2.jsonl"
    log = WorkloadLog(str(p))
    log.record(_seg_query(spark, "BUILDING"))
    day1 = p.read_text()
    log.record(_seg_query(spark, "AUTOMOBILE"))
    p.write_text(p.read_text() + day1)  # simulate concatenating day 1 again

    repo = IndexRepository(spark, str(tmp_path / "adv_idx3"), n_buckets=4)
    adv = WorkloadAdvisor(
        repo,
        {
            "customer": lambda: lift(
                load_table(spark, SF_SMOKE, "customer"), table="customer"
            )
        },
        min_count=3,
    )
    assert log.replay_into(adv) == 3
    assert adv._patterns[("customer", "c_mktsegment")] == 3
    assert adv.advise() == [("customer", "c_mktsegment", 3)]


def test_advisor_mines_repeated_rollups_and_covers_union(spark, advisor):
    # two agg_summary shapes on the same (orders, o_orderpriority) with
    # DIFFERENT column subsets → one advised covering MV over the UNION;
    # a one-off rollup on another key is not advised; after
    # auto_materialize both original queries substitute to the same MV
    orders = load_table(spark, SF_SMOKE, "orders")

    def rollup(**kw):
        return (
            lift(orders, table="orders")
            .index_by(lambda o: o.o_orderpriority)
            .agg_summary(**kw)
        )

    q1 = rollup(sums=["o_orderkey"])
    q2 = rollup(maxs=["o_totalprice"])
    advisor.observe(q1)
    advisor.observe(q2)
    advisor.observe(
        lift(orders, table="orders")
        .index_by(lambda o: o.o_orderstatus)
        .agg_summary(sums=["o_orderkey"])
    )
    advised = advisor.advise_aggs()
    assert advised == [
        ("orders", "o_orderpriority", 2, ("o_orderkey",), (), ("o_totalprice",))
    ]
    entries = advisor.auto_materialize()
    assert any(
        getattr(e, "key_col", None) == "o_orderpriority"
        and getattr(e, "sums", None) == ("o_orderkey",)
        and getattr(e, "maxs", None) == ("o_totalprice",)
        for e in entries
    )
    for q in (q1, q2):
        opt = advisor.repo.optimize(q)
        files = opt.df.inputFiles()
        assert files and all("adv_agg_orders_o_orderpriority" in f for f in files)
        assert sorted(map(tuple, opt.df.collect())) == sorted(
            map(tuple, q.df.collect())
        )
    # idempotent: nothing new advised after materialization
    assert advisor.advise_aggs() == []


def test_workload_log_persists_rollup_shapes(spark, advisor, tmp_path):
    from linqonsteroids_spark.plans.workload import WorkloadLog

    orders = load_table(spark, SF_SMOKE, "orders")
    log = WorkloadLog(str(tmp_path / "wl.jsonl"))
    for _ in range(2):
        log.record(
            lift(orders, table="orders")
            .index_by(lambda o: o.o_orderpriority)
            .agg_summary(sums=["o_orderkey"], mins=["o_totalprice"])
        )
    assert log.replay_into(advisor) == 2
    advised = advisor.advise_aggs()
    assert advised == [
        ("orders", "o_orderpriority", 2, ("o_orderkey",), ("o_totalprice",), ())
    ]
