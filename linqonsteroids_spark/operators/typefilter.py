"""Type-dispatch operators: typeFilter / typeCase / ifInstanceOf over a tag column.

Reference: runtime type tests as data operations — ``IsInstanceOf/
AsInstanceOf/IfInstanceOf`` (``IfInstanceOf.scala:13-52``), ``typeFilter``/
``TypeCaseExp`` (``traversableTypeOperators.scala:12-110``), and the
``TypeMapping`` type-index partitioning a collection by runtime class with
a precomputed subtype relation (``TypeMapping.scala:8-63``,
``traversableOps.scala:516-567``).

Spark-first: heterogeneous rows carry a discriminator/tag column;
``type_filter`` is a plain tag filter (partition-prunable when the table
is partitioned by tag — the distributed TypeMapping), ``type_case`` is a
when/otherwise cascade with per-branch projections, and the subtype
relation is an optional broadcast-joined (tag → supertype) table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def type_filter(df: DataFrame, tag: str, tag_col: str = "tag") -> DataFrame:
    """typeFilter[S]: keep rows of runtime kind ``tag``. With a
    tag-partitioned table this is pure partition pruning — the
    ``toTypeFilter`` rewrite's goal (``TypeFilterOptim.scala:13-109``)."""
    return df.filter(F.col(tag_col) == tag)


def type_case(
    df: DataFrame,
    branches: list[tuple[str, Callable[[DataFrame], Column]]],
    tag_col: str = "tag",
    out_col: str = "value",
) -> DataFrame:
    """TypeCaseExp: first matching tag branch projects the row; rows
    matching no branch are dropped (partial-function semantics)."""
    expr = None
    for tag, project in branches:
        branch_val = project(df)
        expr = (
            F.when(F.col(tag_col) == tag, branch_val)
            if expr is None
            else expr.when(F.col(tag_col) == tag, branch_val)
        )
    tags = [t for t, _ in branches]
    return df.filter(F.col(tag_col).isin(tags)).select(
        df["*"], expr.alias(out_col)
    )


def if_instance_of(
    df: DataFrame, tag: str, project: Callable[[DataFrame], Column],
    tag_col: str = "tag", out_col: str = "value",
) -> DataFrame:
    """IfInstanceOf: Option-valued cast — null when the tag mismatches
    (callers filter or coalesce; Lifting.scala:65-75 Option semantics)."""
    return df.withColumn(
        out_col, F.when(F.col(tag_col) == tag, project(df)).otherwise(F.lit(None))
    )


def type_mapping(
    df: DataFrame,
    subtype_of: dict[str, list[str]],
    tag_col: str = "tag",
) -> dict[str, DataFrame]:
    """TypeMapping: tag → DataFrame of all rows whose tag is that type OR a
    subtype (precomputed subtype graph, TypeMapping.scala:8-63). Returns
    lazy filtered views; materialize hot entries via the index repository."""
    closure: dict[str, set[str]] = {}

    def expand(t: str) -> set[str]:
        if t in closure:
            return closure[t]
        acc = {t}
        for sub in subtype_of.get(t, []):
            acc |= expand(sub)
        closure[t] = acc
        return acc

    all_tags = set(subtype_of) | {s for subs in subtype_of.values() for s in subs}
    return {t: df.filter(F.col(tag_col).isin(list(expand(t)))) for t in sorted(all_tags)}
