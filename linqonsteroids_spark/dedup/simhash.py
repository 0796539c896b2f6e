"""SimHash near-duplicate detection (hamming-distance similarity).

48-bit SimHash (48 rather than 64 keeps the hash inside a signed int64 in
both engines): per distinct token, ``h = int(md5(token)[0:12], 16)``; bit
j of the signature is 1 iff at least half the tokens have bit j set.

Deterministic & oracle-reproducible (md5 + integer bit ops agree between
Spark and DuckDB — verified: conv/substr vs ('0x'||…)::BIGINT, xor,
bit_count, shifts).

Scale: signature computation is one groupBy(doc) with 48 conditional
sums (map-side combined). Near-pair search blocks on 4 × 12-bit chunks —
two docs within hamming distance 3 of each other share at least one
chunk (pigeonhole) — so the all-pairs comparison becomes 4 equi-joins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.dedup.shingles import tokens_df

N_BITS = 48
N_CHUNKS = 4
CHUNK_BITS = N_BITS // N_CHUNKS


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 48-bit signature as bigint; tokenless docs drop out."""
    toks = tokens_df(docs, id_col, text_col).distinct()
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 12), 16, 10).cast("long")
    toks = toks.select(F.col(id_col), h.alias("h"))
    # bit j: majority vote — popcount(tokens with bit set) * 2 >= n_tokens
    bit_sums = [
        F.sum((F.shiftright(F.col("h"), j) % 2)).alias(f"b{j}") for j in range(N_BITS)
    ]
    agg = toks.groupBy(id_col).agg(F.count("*").alias("n"), *bit_sums)
    sig = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") * 2 >= F.col("n"), F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
        range(N_BITS),
        F.lit(0).cast("long"),
    )
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a < id_b, hamming) pairs within ``max_hamming``, found via
    chunk-blocking (no all-pairs cross join)."""
    sig = simhash_signatures(docs, id_col, text_col)
    chunks = []
    for c in range(N_CHUNKS):
        chunk = (
            F.shiftright(F.col("simhash"), c * CHUNK_BITS) % F.lit(2**CHUNK_BITS)
        ).alias("chunk_val")
        chunks.append(
            sig.select(F.col(id_col), F.col("simhash"), F.lit(c).alias("chunk"), chunk)
        )
    blocked = reduce(lambda a, b: a.unionByName(b), chunks)
    a = blocked.select(
        "chunk", "chunk_val", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = blocked.select(
        F.col("chunk").alias("chunk_b"), F.col("chunk_val").alias("chunk_val_b"),
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(
            b,
            (a.chunk == b.chunk_b) & (a.chunk_val == b.chunk_val_b) & (a.id_a < b.id_b),
        )
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_oracle_sql(table: str = "documents") -> str:
    """DuckDB SQL reproducing the signatures exactly."""
    from linqonsteroids_spark.dedup.shingles import DUCK_TOKS

    bit_sums = ",\n         ".join(
        f"sum((h >> {j}) & 1) AS b{j}" for j in range(N_BITS)
    )
    sig_sum = " + ".join(
        f"CASE WHEN b{j} * 2 >= n THEN {2**j}::BIGINT ELSE 0 END" for j in range(N_BITS)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({DUCK_TOKS}) AS token FROM {table}
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 12))::BIGINT AS h FROM tok
),
agg AS (
  SELECT doc_id, count(*) AS n,
         {bit_sums}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, {sig_sum} AS simhash FROM agg
"""
