"""SimHash near-duplicate detection (hamming-distance similarity).

48-bit SimHash (48 rather than 64 keeps the hash inside a signed int64 in
both engines): per distinct token, ``h = int(md5(token)[0:12], 16)``; bit
j of the signature is 1 iff at least half the tokens have bit j set.

Deterministic & oracle-reproducible (md5 + integer bit ops agree between
Spark and DuckDB — verified: conv/substr vs ('0x'||…)::BIGINT, xor,
bit_count, shifts).

Scale: signature computation is one groupBy(doc) with 48 conditional
sums (map-side combined). Near-pair search uses multi-block compound-key
blocking (Manku, Jain & Sarma, WWW '07 §3): split the 48 bits into 6
blocks of 8 and equi-join on every C(6, 6-d) combination of (6-d) blocks
concatenated into one compound key. d differing bits touch at most d
blocks, leaving >= 6-d blocks untouched, so some combination's compound
key matches exactly (pigeonhole) — the blocked search finds EXACTLY the
all-pairs Hamming<=d set. For the production d=3 that is C(6,3)=20
combinations of 24-bit keys: ~16.7M distinct buckets whose cardinality
GROWS with corpus size, so expected candidates are ~20·N²/2²⁴ — versus
the previous single-chunk scheme's 4 × 12-bit chunks = a CONSTANT 16,384
buckets, whose per-bucket size (and thus candidate count, O(N²/4096))
grew quadratically with N. Sub-quadratic candidate growth is asserted in
tests/test_dedup.py::test_simhash_candidate_growth_subquadratic.
"""

from __future__ import annotations

from functools import reduce
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.dedup.shingles import tokens_df

N_BITS = 48
N_BLOCKS = 6
BLOCK_BITS = N_BITS // N_BLOCKS


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


def _combo_size(max_hamming: int) -> int:
    """Blocks per compound key: complete for d <= N_BLOCKS - k, so pick
    k = N_BLOCKS - d (clamped to [1, N_BLOCKS-1]; d > N_BLOCKS-1 degrades
    to recall-only, which no production path uses)."""
    return min(N_BLOCKS - 1, max(1, N_BLOCKS - max_hamming))


def simhash_blocked(
    sig: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash, bkey): one row per (doc, block combination), where
    bkey packs the combination id and its blocks' values into one bigint
    equi-join key (Manku WWW'07 multi-block blocking)."""
    k = _combo_size(max_hamming)
    keys = []
    for ci, combo in enumerate(combinations(range(N_BLOCKS), k)):
        key = F.lit(ci * 2 ** (BLOCK_BITS * k)).cast("long")
        for pos, blk in enumerate(combo):
            block_val = F.shiftright(F.col("simhash"), blk * BLOCK_BITS) % F.lit(
                2**BLOCK_BITS
            )
            key = key + block_val * F.lit(2 ** (BLOCK_BITS * pos)).cast("long")
        keys.append(key)
    # max key = 2^(8k) * (C(6,k)-1 + 1) <= 2^45 — comfortably in int64
    return sig.select(
        F.col(id_col), "simhash", F.explode(F.array(*keys)).alias("bkey")
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a < id_b, hamming) pairs within ``max_hamming``, found via
    multi-block compound-key blocking (no all-pairs cross join; exact —
    same pairs as the quadratic form — for max_hamming <= 5).

    Dedup-by-construction, not by distinct(): a close pair matches MANY
    combinations (a hamming-0 pair matches all 20), so each candidate row
    carries its combination id and survives only at the pair's CANONICAL
    combination — the first one whose blocks are all untouched by the
    pair's differing bits, computed row-locally from xor via a 64-entry
    lookup. Every qualifying pair then appears exactly once and the
    multi-million-row distinct() shuffle disappears entirely.
    """
    sig = simhash_signatures(docs, id_col, text_col)
    k = _combo_size(max_hamming)
    combos = list(combinations(range(N_BLOCKS), k))
    # canonical combination per touched-block mask: the first combo fully
    # disjoint from the mask (-1 = none; only possible past the
    # completeness bound, where the hamming filter rejects the pair anyway)
    canon = [
        next(
            (ci for ci, c in enumerate(combos) if not any(m >> b & 1 for b in c)),
            -1,
        )
        for m in range(1 << N_BLOCKS)
    ]
    blocked = simhash_blocked(sig, max_hamming, id_col)
    a = blocked.select(
        "bkey", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = blocked.select(
        F.col("bkey").alias("bkey_b"),
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sig_b"),
    )
    diff = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    mask = reduce(
        lambda acc, i: acc
        + F.when(
            F.shiftright(diff, i * BLOCK_BITS).bitwiseAND(F.lit(2**BLOCK_BITS - 1))
            != 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0)),
        range(N_BLOCKS),
        F.lit(0),
    )
    combo_id = F.shiftright(F.col("bkey"), BLOCK_BITS * k)
    return (
        a.join(b, (a.bkey == b.bkey_b) & (a.id_a < b.id_b))
        .filter(
            (F.bit_count(diff) <= max_hamming)
            & (combo_id == F.element_at(F.array(*[F.lit(c) for c in canon]), mask + 1))
        )
        .select("id_a", "id_b", F.bit_count(diff).alias("hamming"))
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
