"""UDF registry tests: the fmap identity contract + vectorized execution."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.functions.udf import fmap, register, registered


@register("squash", returns="double")
def squash(s: pd.Series) -> pd.Series:
    return s / (1.0 + s.abs())


@register("tag_bucket", returns="string")
def tag_bucket(s: pd.Series) -> pd.Series:
    return pd.Series(pd.cut(s, bins=[-1e18, 0, 5000, 1e18], labels=["neg", "low", "high"]).astype(str))


def test_identity_contract(spark):
    assert fmap("squash") is fmap("squash")  # same name → same object
    with pytest.raises(KeyError):
        fmap("never_registered")
    with pytest.raises(ValueError):
        # re-register under the same name with a different function
        register("squash")(lambda s: s)


def test_reregistering_same_function_is_idempotent():
    register("squash")(squash)
    assert registered("squash")


def test_vectorized_execution(spark):
    df = spark.createDataFrame([(i, float(i * 2000 - 2000)) for i in range(8)], "id int, v double")
    out = df.select("id", fmap("squash")(F.col("v")).alias("s"),
                    fmap("tag_bucket")(F.col("v")).alias("b"))
    rows = {r.id: (r.s, r.b) for r in out.collect()}
    assert rows[0][1] == "neg" and rows[3][1] == "low" and rows[7][1] == "high"
    v = -2000.0
    assert abs(rows[0][0] - v / (1 + abs(v))) < 1e-12
    # the pandas UDF appears as ArrowEvalPython (vectorized), not BatchEvalPython
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_polymorphic_udtf_schema_follows_constant_arg(spark):
    # analyze() computes (pos, w1..wn) from the CONSTANT n at plan time:
    # different n, different column set; same tokenization as the bigram
    # UDTF; non-constant n is rejected during analysis, before execution
    from pyspark.sql.utils import AnalysisException

    from linqonsteroids_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [("a b c d e",), ("x y",), ("solo",)], "text string"
    ).createOrReplaceTempView("udtf_poly_t")
    df2 = spark.sql(
        "SELECT g.* FROM udtf_poly_t, LATERAL linq_ngrams(text, 2) g"
    )
    df4 = spark.sql(
        "SELECT g.* FROM udtf_poly_t, LATERAL linq_ngrams(text, 4) g"
    )
    assert df2.columns == ["pos", "w1", "w2"]
    assert df4.columns == ["pos", "w1", "w2", "w3", "w4"]
    assert df2.count() == 5  # 4 bigrams + 1; 'solo' emits nothing
    assert [tuple(r) for r in df4.collect()] == [
        (0, "a", "b", "c", "d"),
        (1, "b", "c", "d", "e"),
    ]
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT g.* FROM udtf_poly_t, "
            "LATERAL linq_ngrams(text, length(text)) g"
        ).collect()
