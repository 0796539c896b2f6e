"""Testdata contract canaries.

The driver regenerates /root/testdata between rounds and has already
changed encodings once (events.ts NANOS → MICROS/NTZ), which silently
turned nine green correctness rows red. These tests pin every assumption
the engine makes about the input tables, so the NEXT regeneration fails
here — with a precise message — instead of inside the driver gate.

Column NAMES and logical shapes are contracts; physical encodings that
the engine normalizes (events.ts, see catalog.normalize_events_ts) are
deliberately NOT pinned.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_table_columns(table):
    schema = pq.read_schema(f"{SF_SMOKE}/{table}.parquet")
    assert schema.names == EXPECTED_COLUMNS[table], (
        f"{table} columns changed — update queries/oracles touching it"
    )


def test_embedding_dim_is_64():
    # knn_lsh_bucketed's hyperplane literals (and their oracle SQL) are
    # generated for dim=64 at import time; a dim change must be loud
    import duckdb

    dims = duckdb.sql(
        f"SELECT DISTINCT len(embedding) FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    assert dims == [(64,)], f"embedding dim changed: {dims}"


def test_events_props_is_json_object():
    # events_json_stats parses props with an explicit schema
    import duckdb

    rows = duckdb.sql(
        f"SELECT props FROM '{SF_SMOKE}/events.parquet' LIMIT 20"
    ).fetchall()
    for (p,) in rows:
        obj = json.loads(p)
        assert isinstance(obj, dict)


def test_documents_text_is_ascii():
    # the Arrow tokenizer stages (minhash signatures, shingles) rely on
    # Python str.lower() agreeing with SQL lower(); guaranteed for ASCII,
    # locale-dependent beyond it — a non-ASCII corpus must be caught here
    import duckdb

    n = duckdb.sql(
        f"""SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'
            WHERE regexp_matches(text, '[^\\x00-\\x7F]')"""
    ).fetchone()[0]
    assert n == 0, f"{n} non-ASCII documents — audit Python/SQL lower() parity"
