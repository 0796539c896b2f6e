"""Oracle output-type audit: ban pandas-degradation-prone DuckDB types.

The driver compares Spark results against the DuckDB oracles through a
pandas path (value hash after sorting columns by name).  DuckDB's pandas
conversion (`fetchdf`) silently DEGRADES some exact types to float64:

- ``HUGEINT`` / ``UHUGEINT`` (what DuckDB types ``sum(<integer>)`` as)
  becomes float64, so an exact ``6`` hashes as ``6.0`` against Spark's
  bigint ``6`` — the root cause of the round-4/5 chronic hash-reds
  (``vocab_coverage``, ``ngram_novelty``, ``corpus_report``).
- ``DECIMAL`` becomes float64 while Spark hands pandas ``decimal.Decimal``
  objects — a representation split even when values are identical.

``fetchall()`` returns exact Python ints/Decimals for all of these, which
is why the repo's local differential could never reproduce the driver's
reds.  This test closes the class forever: it binds EVERY registered
oracle (DuckDB relation binding only — no execution, no Spark) and fails
if any output column carries a degradation-prone type.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from linqonsteroids_spark.queries import ALL

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Types fetchdf() degrades to float64 (or otherwise re-represents) while
# fetchall()/Spark keep them exact.
_BANNED = re.compile(r"HUGEINT|UHUGEINT|DECIMAL", re.IGNORECASE)

# SHAPE-HAZARD: the driver canonicalizes through pandas
# ``DataFrame.sort_values`` over every output column; list/struct/map
# cells are unhashable in pandas' lexsort, so ANY top-level
# ARRAY/MAP/STRUCT column errors the gate even when values are exact —
# the round-6 failure class (``bpe_encode_segments``,
# ``embedding_quantize_int8``, ``hashed_count_vectors``).  Gated output
# must be scalar-only: join arrays deterministically
# (``array_join``/``array_to_string`` — the ``inverted_postings``
# pattern) or explode to (id, pos, value) rows.  DuckDB renders list
# types as ``T[]`` and the nested ones by name.
_BANNED_SHAPE = re.compile(r"\[\]|\bSTRUCT\b|\bMAP\b|\bUNION\b", re.IGNORECASE)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


_ORACLES = sorted((k, v[1]) for k, v in ALL.items() if v[1] is not None)


@pytest.mark.parametrize("name,sql", _ORACLES, ids=[k for k, _ in _ORACLES])
def test_oracle_output_types_survive_pandas(con, name, sql):
    rel = con.sql(sql)  # binds + type-checks without executing
    offenders = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, rel.types)
        if _BANNED.search(str(typ))
    ]
    assert not offenders, (
        f"oracle {name!r} emits pandas-degrading column types {offenders}; "
        "CAST integer sums to BIGINT and decimals to an exact integer "
        "re-basing (e.g. cents) — fetchdf() turns HUGEINT/DECIMAL into "
        "float64 and the driver's hash will mismatch Spark's exact values"
    )
    shape_offenders = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, rel.types)
        if _BANNED_SHAPE.search(str(typ))
    ]
    assert not shape_offenders, (
        f"oracle {name!r} emits non-scalar top-level columns "
        f"{shape_offenders}; the driver's pandas canonicalizer cannot "
        "sort list/struct/map cells (TypeError: unhashable type) — emit "
        "a deterministic joined string (array_to_string) or exploded "
        "(id, pos, value) rows instead"
    )


def test_shape_hazard_guard_fires_on_offenders(con):
    """Guard-of-the-guard: the shape ban must actually catch each
    non-scalar top-level type DuckDB can emit (the r6 failure class),
    and must NOT flag scalar projections that merely mention arrays
    internally (e.g. array_to_string output)."""
    offenders = [
        "SELECT [1, 2] AS v",
        "SELECT {'a': 1} AS v",
        "SELECT map([1], [2]) AS v",
        "SELECT string_split('a b', ' ') AS v",
    ]
    for sql in offenders:
        rel = con.sql(sql)
        assert any(
            _BANNED_SHAPE.search(str(t)) for t in rel.types
        ), f"guard missed: {sql} -> {rel.types}"
    ok = con.sql(
        "SELECT array_to_string(string_split('a b', ' '), ',') AS v, 1 AS n"
    )
    assert not any(_BANNED_SHAPE.search(str(t)) for t in ok.types)
