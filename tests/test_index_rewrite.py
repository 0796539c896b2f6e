"""Index/MV repository tests — the SubquerySharing capability.

Mirrors the reference's index tests (``SubquerySharingTests.scala:43-62``
``indexingTest`` harness): assert BOTH that the optimized query actually
uses the index (here: scans the MV files, filter pushed to parquet) AND
that optimized results equal unoptimized results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.api import lift
from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.plans import IndexRepository
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def repo(spark, tmp_path_factory):
    storage = str(tmp_path_factory.mktemp("indexes"))
    r = IndexRepository(spark, storage, n_buckets=4)
    customer = load_table(spark, SF_SMOKE, "customer")
    r.add_index(
        "customer_by_segment",
        lift(customer, table="customer").index_by(lambda c: c.c_mktsegment),
    )
    return r


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rewrite_uses_index_and_matches(spark, repo):
    customer = load_table(spark, SF_SMOKE, "customer")
    q = lift(customer, table="customer").filter(
        lambda c: (c.c_mktsegment == "BUILDING") & (c.c_acctbal > 0)
    )
    opt = repo.optimize(q)
    # 1. the rewrite happened: scan reads MV storage, not the base table
    files = opt.df.inputFiles()
    assert files and all("customer_by_segment" in f for f in files)
    # 2. the key filter reaches the parquet scan
    plan = opt.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_mktsegment" in plan
    # 3. results identical to the unoptimized query (semantic equivalence,
    #    the reference's core test discipline)
    assert _sorted_rows(opt.df) == _sorted_rows(q.df)


def test_rewrite_commuted_equality(spark, repo):
    # k == col form (normalizer: commutative Eq, OptimizationTransforms:123-127)
    customer = load_table(spark, SF_SMOKE, "customer")
    from linqonsteroids_spark.api import lit

    q = lift(customer, table="customer").filter(
        lambda c: lit("MACHINERY") == c.c_mktsegment
    )
    opt = repo.optimize(q)
    assert opt.df.inputFiles() and "customer_by_segment" in opt.df.inputFiles()[0]
    assert _sorted_rows(opt.df) == _sorted_rows(q.df)


def test_no_rewrite_without_matching_index(spark, repo):
    customer = load_table(spark, SF_SMOKE, "customer")
    q = lift(customer, table="customer").filter(lambda c: c.c_custkey == 5)
    opt = repo.optimize(q)  # no index on c_custkey → unchanged
    assert opt is q


def test_no_rewrite_on_opaque_residual(spark, repo):
    customer = load_table(spark, SF_SMOKE, "customer")
    q = lift(customer, table="customer").filter(
        lambda c: (c.c_mktsegment == "BUILDING") & c.c_name.contains("1")
    )
    opt = repo.optimize(q)  # contains() is opaque structure → conservative bail
    assert opt is q


def test_direct_lookup(spark, repo):
    customer = load_table(spark, SF_SMOKE, "customer")
    got = repo.lookup("customer_by_segment", "HOUSEHOLD")
    want = customer.filter(F.col("c_mktsegment") == "HOUSEHOLD")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_refresh_rematerializes(spark, repo):
    customer = load_table(spark, SF_SMOKE, "customer")
    smaller = customer.filter(F.col("c_acctbal") > 0)
    repo.refresh("customer_by_segment", smaller)
    got = repo.lookup("customer_by_segment", "BUILDING")
    want = smaller.filter(F.col("c_mktsegment") == "BUILDING")
    assert _sorted_rows(got) == _sorted_rows(want)
    repo.refresh("customer_by_segment", customer)  # restore for other tests


def test_add_index_rejects_filtered_source(spark, repo):
    customer = load_table(spark, SF_SMOKE, "customer")
    with pytest.raises(ValueError):
        repo.add_index(
            "bad",
            lift(customer, table="customer")
            .filter(lambda c: c.c_acctbal > 0)
            .index_by(lambda c: c.c_mktsegment),
        )
