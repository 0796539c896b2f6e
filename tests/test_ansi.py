"""ANSI-mode guarantees (Spark 4 default, pinned in session.py).

The whole suite runs under ``spark.sql.ansi.enabled=true`` — strict
overflow and cast errors. These tests pin the setting itself plus the two
operator families the strictness actually threatens: the minhash 2-universal
hash arithmetic (documented overflow margins, ``dedup/minhash.py``) and the
string→number casts in ``cast_matrix`` (must use try_cast semantics for
malformed input, not rely on lax-mode NULLs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_session_is_ansi(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_minhash_signatures_no_overflow_under_ansi(spark):
    # the widest arithmetic path: (a*h + b) mod p over md5-derived 62-bit
    # hashes — ANSI raises on silent 64-bit wraparound, so green here means
    # the documented margins hold
    from linqonsteroids_spark.dedup.minhash import MOD_P, N_HASHES, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    rows = minhash_signatures(docs).collect()
    assert len(rows) == 2
    for r in rows:
        for i in range(N_HASHES):
            assert 0 <= r[f"m{i}"] < MOD_P


def test_malformed_string_cast_is_try_cast(spark):
    # lax mode would return NULL from CAST('not a number' AS INT); ANSI
    # throws — the engine's conversion surface must route through try_cast
    df = spark.createDataFrame([("12",), ("not a number",), ("1.5",)], "s string")
    got = {
        r.s: r.v
        for r in df.select("s", F.expr("try_cast(s AS int)").alias("v")).collect()
    }
    assert got == {"12": 12, "not a number": None, "1.5": None}


def test_cast_matrix_handles_malformed_rows_under_ansi(spark):
    from linqonsteroids_spark.queries.misc import cast_matrix

    cast_matrix(spark, SF_SMOKE).collect()  # must not raise under ANSI
