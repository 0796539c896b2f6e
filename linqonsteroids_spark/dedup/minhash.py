"""MinHash + LSH near-duplicate detection (Jaccard estimation).

Pipeline: shingle → per-doc minhash signature (N_HASHES minima) → band the
signature (N_BANDS × ROWS_PER_BAND) → bucket-join docs sharing a band key
→ candidate pairs.

Deterministic hash family shared with the oracle, ONE md5 per shingle:
``h1, h2`` are two 32-bit halves of ``md5(shingle)`` and
``h_i(s) = (C_i*h1 + D_i*h2) mod P`` with seeded-random 28-bit constants
and P = 2^31 - 1 — a 2-universal family over the md5 fingerprint. Three
physical lessons are baked in: (a) numeric minima — Spark's HashAggregate
needs mutable agg buffers, so ``min(string)`` silently degrades to
SortAggregate with two extra sorts of the exploded shingle table;
(b) hash once, derive k — 16 independent ``min(md5(i||s))`` aggregates
evaluate 16 md5s per shingle row inside the partial aggregate (~16x the
hashing cost; at 260k shingles that was the whole pipeline's bottleneck);
(c) the modular reduction is NOT optional — ``min(h1 + c*h2)`` without
``mod`` preserves the order of ``h2`` (positive scaling is monotone), so
all 16 "hashes" share one argmin shingle, collapsing a band's 4 match
events into ~1 and inflating candidate pairs ~40x (J vs J^4 collision
probability). Widths: ``C_i*h1 + D_i*h2 < 2^61`` — no BIGINT overflow in
either engine (Spark 4 ANSI mode would throw).

Scale: the only shuffles are the signature groupBy (map-side combined to
one row per doc — each doc's shingles are co-partitioned with the doc row,
so the exchange carries |docs| x 16 longs) and the band-key groupBy
(N_BANDS rows per doc). Band keys are uniform by construction, skew-free
unless true duplicate clusters exist, which is the signal itself. No
driver-side state.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.dedup.shingles import shingles_df

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

#: hex digits parsed per half (32-bit h1 and h2)
HALF_HEX = 8

#: Mersenne prime modulus and seeded-random 28-bit odd coefficient pairs —
#: identical literals in both engines
MOD_P = 2**31 - 1
_rng = random.Random(42)
COEFFS = [
    ((_rng.getrandbits(28) | 1), (_rng.getrandbits(28) | 1)) for _ in range(N_HASHES)
]


def _hex_long(col: F.Column, start: int, n: int) -> F.Column:
    return F.conv(F.substring(col, start, n), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, m0..m15) — the minhash signature; docs with no shingles drop out.

    Shape: explode shingles → md5 once per shingle → groupBy(id).agg(16
    numeric mins). The explode+HashAggregate stays in whole-stage codegen,
    and because every doc's shingles land in the SAME partition as the doc
    row, the partial aggregate already emits one row per doc — the exchange
    carries only |docs| x 16 longs, not the exploded table. A row-local
    array-HOF variant (transform + array_min per hash, zero exchange) was
    measured 5x SLOWER at sf0.1: higher-order-function lambdas evaluate
    interpreted per element, losing codegen — the shuffle this "saves" was
    never material."""
    sh = shingles_df(docs, id_col, text_col)
    # md5 runs ONCE per shingle row in this projection; the 16 aggregate
    # inputs are long arithmetic over (h1, h2).
    hashed = sh.select(
        F.col(id_col),
        _hex_long(F.md5(F.col("shingle")), 1, HALF_HEX).alias("_h1"),
        _hex_long(F.md5(F.col("shingle")), 17, HALF_HEX).alias("_h2"),
    )
    mins = [
        F.min(
            (F.lit(c) * F.col("_h1") + F.lit(d) * F.col("_h2")) % F.lit(MOD_P)
        ).alias(f"m{i}")
        for i, (c, d) in enumerate(COEFFS)
    ]
    return hashed.groupBy(id_col).agg(*mins)


def _banded(sig: DataFrame, id_col: str) -> DataFrame:
    # ONE band-key array + posexplode, not a 4-way union of selects over
    # sig: the union form repeats the signature aggregation subtree once
    # per band, defeating exchange reuse.
    keys = [
        F.md5(
            F.concat_ws(
                "|",
                *[F.col(f"m{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            )
        )
        for b in range(N_BANDS)
    ]
    return sig.select(
        F.col(id_col), F.posexplode(F.array(*keys)).alias("band", "band_key")
    )


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band.

    NOT a self-join: Spark recomputes the full shingle+md5+agg pipeline
    for each join side (exchange reuse does not fire across the join), so
    in-bucket pairs are generated instead by grouping ids per band key and
    expanding i<j combinations with array functions — ONE pass over the
    signatures, one shuffle on the band key. Per-bucket work is quadratic
    in bucket size, exactly like the join, and buckets are small unless
    they hold a true duplicate cluster (the signal itself).
    """
    sig = minhash_signatures(docs, id_col, text_col)
    banded = _banded(sig, id_col)
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = F.flatten(
        F.expr(
            "transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x AS id_a, y AS id_b)))"
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def minhash_oracle_sql(threshold_table: str = "documents") -> dict[str, str]:
    """DuckDB SQL reproducing signatures and candidate pairs exactly."""
    from linqonsteroids_spark.dedup.shingles import DUCK_SHINGLES, DUCK_TOKS

    mins = ",\n       ".join(
        f"min(({c} * h1 + {d} * h2) % {MOD_P}) AS m{i}"
        for i, (c, d) in enumerate(COEFFS)
    )
    band_selects = []
    for b in range(N_BANDS):
        concat = " || '|' || ".join(
            f"CAST(m{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS band_key FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    base = f"""
WITH toks_t AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM {threshold_table}
),
sh AS (
  SELECT doc_id, unnest({DUCK_SHINGLES}) AS shingle FROM toks_t
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, {HALF_HEX}))::BIGINT AS h1,
         ('0x' || substr(md5(shingle), 17, {HALF_HEX}))::BIGINT AS h2
  FROM sh
),
sig AS (
  SELECT doc_id, {mins}
  FROM hashed GROUP BY doc_id
),
bands AS ({bands_sql})
"""
    signatures = base + "SELECT * FROM sig"
    pairs = (
        base
        + """
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""
    )
    # connected components over the candidate pairs: recursive closure of
    # the symmetric edge relation, component = min reachable id
    closure_ctes = (
        base.replace("WITH toks_t", "WITH RECURSIVE toks_t", 1)
        + """
, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION
  SELECT id_b, id_a FROM cand
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
)
"""
    )
    clusters = closure_ctes + "SELECT doc_id, component FROM comp"
    survivors = (
        closure_ctes
        + f"""
SELECT d.doc_id, (c.doc_id IS NOT NULL) AS in_dup_cluster
FROM {threshold_table} d LEFT JOIN comp c USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
"""
    )
    return {
        "signatures": signatures,
        "pairs": pairs,
        "clusters": clusters,
        "survivors": survivors,
    }
