"""MinHash + LSH near-duplicate detection (Jaccard estimation).

Pipeline: shingle → per-doc minhash signature (N_HASHES md5-salted minima)
→ band the signature (N_BANDS × ROWS_PER_BAND) → bucket-join docs sharing
a band key → candidate pairs.

Deterministic hash family: ``h_i(s) = md5(i || ':' || s)``, minimum taken
in lexicographic string order — identical in Spark and DuckDB, so the
oracle reproduces signatures bit-for-bit.

Scale: the only shuffles are the signature groupBy (keyed by doc, map-side
combined: N_HASHES mins) and the band-bucket self-join (keyed by band
hash — uniform by construction, skew-free unless true duplicate clusters
exist, which is the signal itself). No driver-side state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.dedup.shingles import shingles_df

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, m0..m15) — the minhash signature; docs with no shingles drop out."""
    sh = shingles_df(docs, id_col, text_col)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"m{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy(id_col).agg(*mins)


def _banded(sig: DataFrame, id_col: str) -> DataFrame:
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"m{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), bands)


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band."""
    sig = minhash_signatures(docs, id_col, text_col)
    banded = _banded(sig, id_col)
    a = banded.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    b = banded.select(
        F.col("band").alias("band_b"), F.col("band_key").alias("band_key_b"),
        F.col(id_col).alias("id_b"),
    )
    return (
        a.join(
            b,
            (a.band == b.band_b) & (a.band_key == b.band_key_b) & (a.id_a < b.id_b),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_oracle_sql(threshold_table: str = "documents") -> dict[str, str]:
    """DuckDB SQL reproducing signatures and candidate pairs exactly."""
    from linqonsteroids_spark.dedup.shingles import DUCK_SHINGLES, DUCK_TOKS

    mins = ",\n       ".join(
        f"min(md5('{i}:' || shingle)) AS m{i}" for i in range(N_HASHES)
    )
    band_selects = []
    for b in range(N_BANDS):
        concat = " || '|' || ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
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
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
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
    return {"signatures": signatures, "pairs": pairs}
