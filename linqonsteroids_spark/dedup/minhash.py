"""MinHash + LSH near-duplicate detection (Jaccard estimation).

Pipeline: shingle → per-doc minhash signature (N_HASHES minima) → band the
signature (N_BANDS × ROWS_PER_BAND) → bucket-join docs sharing a band key
→ candidate pairs.

Deterministic hash family shared with the oracle, ONE md5 per shingle:
``h1, h2`` are two 32-bit halves of ``md5(shingle)`` and
``h_i(s) = (C_i*h1 + D_i*h2) mod P`` with seeded-random 28-bit constants
and P = 2^31 - 1 — a 2-universal family over the md5 fingerprint. Physical
lessons baked in: (a) hash once, derive k — 16 independent
``min(md5(i||s))`` evaluations per shingle were ~16x the hashing cost;
(b) the modular reduction is NOT optional — ``min(h1 + c*h2)`` without
``mod`` preserves the order of ``h2`` (positive scaling is monotone), so
all 16 "hashes" share one argmin shingle, collapsing a band's 4 match
events into ~1 and inflating candidate pairs ~40x (J vs J^4 collision
probability). Widths: ``C_i*h1 + D_i*h2 < 2^61`` — no int64/BIGINT
overflow in numpy or either engine (Spark 4 ANSI mode would throw).

Scale: signatures are computed row-locally in one Arrow stage (see
``minhash_signatures`` for the measured JVM-vs-Arrow history), so the only
shuffles in the whole pipeline are the band-key groupBy (N_BANDS rows per
doc) and the final pair distinct. Band keys are uniform by construction,
skew-free unless true duplicate clusters exist, which is the signal
itself. No driver-side state.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linqonsteroids_spark.dedup.shingles import SHINGLE_N

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

#: the incremental-dedup split: doc_id % MOD == 0 is the "newly arrived
#: batch", the rest is the already-indexed corpus (queries/dedup.py
#: dedup_incremental_lsh and its oracle share this literal)
INCREMENTAL_BATCH_MOD = 10

#: hex digits parsed per half (32-bit h1 and h2); the oracle SQL parses
#: these from the md5 hex string, the pandas stage slices the same bytes
#: from the binary digest
HALF_HEX = 8

#: Mersenne prime modulus and seeded-random 28-bit odd coefficient pairs —
#: identical literals in both engines
MOD_P = 2**31 - 1
_rng = random.Random(42)
COEFFS = [
    ((_rng.getrandbits(28) | 1), (_rng.getrandbits(28) | 1)) for _ in range(N_HASHES)
]


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, m0..m15) — the minhash signature; docs with no shingles drop out.

    Computed per document in ONE Arrow-batched ``mapInPandas`` stage:
    tokenize, shingle, md5 (hashlib runs the same C digest the JVM does),
    then all 16 minima vectorized in int64 numpy — zero shuffle, and the
    exploded shingle relation (~50× the corpus row count) never exists.
    Bit-identical to the relational form by construction: h1/h2 are the
    first/third 4 bytes of the md5 digest (= hex chars 1-8 and 17-24),
    and (c*h1 + d*h2) % P over int64 cannot overflow (< 2^61). The corpus
    contract is UTF-8 text where Python ``str.lower()`` agrees with SQL
    ``lower()`` (ASCII-safe; exotic locale-sensitive casings are the
    caveat).

    Measured history at sf0.1, the reason this is a pandas stage: the
    explode → md5 → groupBy(16 mins) relational pipeline cost ~1.2 s
    (whole-stage codegen, map-side-combined — the best JVM shape; a
    row-local array-HOF variant was 5× slower still, because
    higher-order-function lambdas evaluate interpreted per element);
    this stage computes the same signatures in ~0.07 s wall — the
    shingle-building transform lambdas were the real cost, and they
    disappear entirely."""
    id_type = dict(docs.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, " + ", ".join(
        f"m{i} long" for i in range(N_HASHES)
    )
    coeffs = COEFFS

    def compute(batches):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        # re.ASCII: Python \s otherwise also matches Unicode whitespace
        # (U+00A0 etc.) that the JVM/RE2 \s in the relational path and the
        # DuckDB oracle do not — tokenization must agree byte-for-byte
        ws = re.compile(r"\s+", re.ASCII)
        C = np.array([c for c, _ in coeffs], dtype=np.int64)[:, None]
        D = np.array([d for _, d in coeffs], dtype=np.int64)[:, None]
        half = HALF_HEX // 2  # hex chars → digest bytes
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue  # NULL text: no shingles, same as the n<=0 drop
                toks = [t for t in ws.split(text.strip().lower()) if t]
                n = len(toks) - (SHINGLE_N - 1)
                if n <= 0:
                    continue
                h1 = np.empty(n, dtype=np.int64)
                h2 = np.empty(n, dtype=np.int64)
                for i in range(n):
                    dig = hashlib.md5(
                        " ".join(toks[i : i + SHINGLE_N]).encode("utf-8")
                    ).digest()
                    h1[i] = int.from_bytes(dig[:half], "big")
                    h2[i] = int.from_bytes(dig[2 * half : 3 * half], "big")
                ids.append(doc_id)
                sigs.append(((C * h1 + D * h2) % MOD_P).min(axis=1))
            if ids:
                out = pd.DataFrame(
                    np.vstack(sigs), columns=[f"m{i}" for i in range(N_HASHES)]
                )
                out.insert(0, id_col, ids)
                yield out

    src = docs.select(id_col, text_col)
    # hashing is CPU-bound: if the scan yields fewer splits than the
    # session's parallelism (e.g. one small parquet file), spread the rows
    # first — the shuffle moves only (id, text). Capped at 8: every Python
    # stage pays a ~0.35 s fixed scheduling/Arrow floor here (measured,
    # flat in partition count up to ~8, rising past 16), so for a corpus
    # small enough to arrive as one split, more tasks cost more than they
    # parallelize. Inputs already split by maxPartitionBytes (the 100 TB
    # case) skip this branch entirely.
    target = int(src.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if src.rdd.getNumPartitions() < max(target // 2, 2):
        src = src.repartition(max(2, min(target, 8)))
    return src.mapInPandas(compute, out_schema)


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
    bands_all = base + "SELECT * FROM bands"
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
    # incremental verdicts: per NEW-batch doc (doc_id % INCREMENTAL_
    # BATCH_MOD = 0), how many already-indexed docs and how many
    # batch-mates share a band. count(CASE ...) stays BIGINT in DuckDB
    # (sum would degrade to HUGEINT through the driver's pandas path).
    incremental = (
        base
        + f"""
, newb AS (SELECT * FROM bands WHERE doc_id % {INCREMENTAL_BATCH_MOD} = 0),
cand AS (
  SELECT DISTINCT n.doc_id, o.doc_id AS other
  FROM newb n JOIN bands o
    ON o.band = n.band AND o.band_key = n.band_key
   AND o.doc_id <> n.doc_id
)
SELECT d.doc_id,
       CAST(count(CASE WHEN c.other % {INCREMENTAL_BATCH_MOD} <> 0
                       THEN 1 END) AS BIGINT) AS n_index_cands,
       CAST(count(CASE WHEN c.other % {INCREMENTAL_BATCH_MOD} = 0
                       THEN 1 END) AS BIGINT) AS n_batch_cands,
       count(c.other) > 0 AS is_dup
FROM (SELECT doc_id FROM {threshold_table}
      WHERE doc_id % {INCREMENTAL_BATCH_MOD} = 0) d
LEFT JOIN cand c ON c.doc_id = d.doc_id
GROUP BY d.doc_id
"""
    )
    # the streaming twin's verdicts: vs-corpus candidates only (a
    # stream cannot see batch-mates that haven't arrived; batch-internal
    # pairs are the batch gate's job)
    incremental_vs_corpus = (
        base
        + f"""
, newb AS (SELECT * FROM bands WHERE doc_id % {INCREMENTAL_BATCH_MOD} = 0),
cand AS (
  SELECT DISTINCT n.doc_id, o.doc_id AS other
  FROM newb n JOIN bands o
    ON o.band = n.band AND o.band_key = n.band_key
   AND o.doc_id % {INCREMENTAL_BATCH_MOD} <> 0
)
SELECT d.doc_id,
       CAST(count(c.other) AS BIGINT) AS n_index_cands,
       count(c.other) > 0 AS is_dup
FROM (SELECT doc_id FROM {threshold_table}
      WHERE doc_id % {INCREMENTAL_BATCH_MOD} = 0) d
LEFT JOIN cand c ON c.doc_id = d.doc_id
GROUP BY d.doc_id
"""
    )
    return {
        "signatures": signatures,
        "bands": bands_all,
        "pairs": pairs,
        "clusters": clusters,
        "survivors": survivors,
        "incremental": incremental,
        "incremental_vs_corpus": incremental_vs_corpus,
    }


def banded_index_rows(docs, id_col: str = "doc_id", key_col: str = "bk"):
    """``(bk, doc_id, band, band_key)`` rows for a MOR-backed band
    index: ``bk = <doc_id>#<band>`` is the table key. Band NUMBERS are
    a fixed set per document, so a re-crawled document's fresh rows
    UPSERT over its old ones with no tombstone bookkeeping — only true
    takedowns need deletes."""
    from pyspark.sql import functions as F

    return _banded(minhash_signatures(docs, id_col=id_col), id_col).select(
        F.concat_ws(
            "#", F.col(id_col).cast("string"), F.col("band").cast("string")
        ).alias(key_col),
        F.col(id_col),
        "band",
        "band_key",
    )


def maintain_band_index(
    table,
    arrivals=None,
    takedown_ids=None,
    id_col: str = "doc_id",
) -> int | None:
    """Maintain an LSH band index stored AS a merge-on-read table
    (``operators/mor.py``) — the takedown-compliance shape a training
    corpus needs: removing a document from the corpus must also remove
    its signatures from the dedup index, or future near-dup decisions
    keep matching against data that is contractually gone.

    One O(changes) delta append per maintenance batch: ``arrivals``
    (new or re-crawled docs) are hashed in O(|batch|) and UPSERT their
    ``<doc>#<band>`` rows (band numbers are stable per doc, so
    re-crawls overwrite in place); ``takedown_ids``' existing rows are
    resolved to delete keys by ONE column-pruned scan of the index
    probed against the broadcast takedown set — the 100 TB index never
    shuffles, and the base file set is never rewritten until the next
    compact folds the log. Returns the committed version (None if
    nothing to do). Multi-writer safety, time travel ("which index
    state produced last week's dedup verdicts"), and the change feed
    all come free from the table format underneath.

    A doc appearing in BOTH ``arrivals`` and ``takedown_ids`` in one
    batch refuses through the table's intra-version uniqueness guard
    (its band keys would be upserted and deleted in the same version —
    an order-dependent outcome): the caller must resolve the intent by
    splitting the batches, takedown first.
    """
    from pyspark.sql import functions as F

    ups = (
        banded_index_rows(arrivals, id_col=id_col, key_col=table.key)
        if arrivals is not None
        else None
    )
    dels = None
    if takedown_ids is not None:
        dels = (
            table.read()
            .join(
                F.broadcast(takedown_ids.select(id_col)),
                id_col,
                "left_semi",
            )
            .select(table.key)
        )
    if ups is None and dels is None:
        return None
    return table.append_delta(upserts=ups, delete_keys=dels)
