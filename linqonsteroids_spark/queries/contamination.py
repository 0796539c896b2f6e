"""Corpus-hygiene operators: benchmark contamination detection and
Bloom-filter membership against a reference corpus.

Two checks every pre-training wash runs before data ships:

- **contamination**: does a training document contain n-grams from the
  evaluation/benchmark set?  The eval set is tiny and fixed, so its
  distinct n-gram set is a BROADCAST side; the corpus streams past it —
  no large shuffle at any scale (the per-doc aggregate is map-side
  combined to one row per doc, as in dedup/minhash.py).
- **reference-corpus dedup**: was this exact document already in a prior
  training run?  At 100 TB the reference key set no longer broadcasts,
  so membership goes through a BLOOM FILTER: k deterministic bit
  positions per key, OR-ed into a fixed bitmap.  The bitmap lives as a
  (word, bits) relation — m/32 rows, always broadcastable no matter how
  many keys went in — and the probe is a broadcast equi-join plus bit
  tests.  False positives are possible (and measurable against the exact
  flag the query also emits); false negatives are not.

Both ops are pure JVM expressions over md5/conv/bit arithmetic with the
same 2-universal hash construction as dedup/minhash.py, so the DuckDB
oracles reproduce them bit-for-bit — approximate SEMANTICS, deterministic
OUTPUT.  No reference-engine analogue (the reference has no corpus-wash
surface); these extend SURVEY §2's north-star additions.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.dedup.shingles import DUCK_SHINGLES, DUCK_TOKS

# --- benchmark contamination ------------------------------------------------
# Eval set: every 97th document plays the held-out benchmark whose n-grams
# must not leak into training data. A doc is contaminated when >= MIN_HITS
# of its distinct 3-gram shingles appear in the eval n-gram set.
EVAL_MOD = 97
CONTAM_MIN_HITS = 3


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc overlap with the eval n-gram set.

    Per-doc DISTINCT shingles come from ``array_distinct`` on the row-local
    shingle array — distinctness never needs a shuffle.  The eval-gram side
    is distinct-ed and broadcast; the only exchange is the final per-doc
    count aggregate (map-side combined, one row per doc)."""
    from linqonsteroids_spark.dedup.shingles import shingles_df

    docs = load_table(spark, sf_dir, "documents")
    # shingle via the Arrow kernel, not the interpreted transform-lambda
    # array (guide §4.2; the dedup family's measured shared bottleneck —
    # see shingles_df). Identical strings by the module's tokenization
    # contract; per-doc dedup happens row-locally in the kernel exactly
    # as array_distinct did.
    eval_grams = (
        shingles_df(docs.filter(F.col("doc_id") % EVAL_MOD == 0))
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = shingles_df(
        docs.filter(F.col("doc_id") % EVAL_MOD != 0), per_doc_distinct=True
    )
    agg = (
        train.join(F.broadcast(eval_grams), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
    )
    # hash-stability: ppm via integer floor division, never a rounded
    # double (identical bit-for-bit on both engines — r4 red-gate policy)
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.expr("n_contaminated * 1000000L div n_shingles").alias(
            "contamination_ppm"
        ),
        (F.col("n_contaminated") >= CONTAM_MIN_HITS).alias("is_contaminated"),
    )


CONTAMINATION_SQL = f"""
WITH toks_t AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM documents
),
sh AS (
  SELECT doc_id, list_distinct({DUCK_SHINGLES}) AS sharr FROM toks_t
),
eval_grams AS (
  SELECT DISTINCT unnest(sharr) AS shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
),
train AS (
  SELECT doc_id, unnest(sharr) AS shingle FROM sh WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT t.doc_id,
       count(*) AS n_shingles,
       count(e.shingle) AS n_contaminated,
       (count(e.shingle) * 1000000) // count(*) AS contamination_ppm,
       count(e.shingle) >= {CONTAM_MIN_HITS} AS is_contaminated
FROM train t LEFT JOIN eval_grams e USING (shingle)
GROUP BY t.doc_id
"""


# --- Bloom-filter reference-corpus dedup ------------------------------------
# Reference corpus: every 7th document stands in for "data already trained
# on".  Key = md5(lower(trim(text))); k bit positions per key via the same
# (a*h1 + b*h2) mod m 2-universal family as minhash.  m is deliberately
# small (4096 bits) so false positives actually occur at sf0.1 and the
# emitted exact_dup flag exposes them — the approximate/exact gap is the
# thing under test.  Bitmap words are 32-bit-positioned inside BIGINTs so
# 1 << (pos % 32) never touches the sign bit in either engine.
BLOOM_M = 4096
BLOOM_K = 4
BLOOM_WORD = 32
REF_MOD = 7

_rng = random.Random(7)
BLOOM_COEFFS = [
    ((_rng.getrandbits(28) | 1), (_rng.getrandbits(28) | 1)) for _ in range(BLOOM_K)
]


def _text_halves() -> tuple[F.Column, F.Column]:
    key = F.md5(F.lower(F.trim(F.col("text"))))
    h1 = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(key, 17, 8), 16, 10).cast("long")
    return h1, h2


def bloom_reference_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bloom_maybe_dup, exact_dup) for every non-reference doc.

    Build: reference keys → k positions → OR into (word, bits); the
    relation has at most m/32 = 128 rows regardless of reference size, so
    it broadcasts at any scale.  Probe: explode each doc's k positions,
    broadcast-join the bitmap, AND the bit tests back together per doc.
    ``exact_dup`` (broadcast semi-check against the true key set) is only
    feasible at THIS scale — it exists to measure the Bloom FP rate."""
    docs = load_table(spark, sf_dir, "documents")
    h1, h2 = _text_halves()
    pos_arr = F.array(
        *[
            (F.lit(a) * h1 + F.lit(b) * h2) % F.lit(BLOOM_M)
            for a, b in BLOOM_COEFFS
        ]
    )
    key = F.md5(F.lower(F.trim(F.col("text"))))

    ref = docs.filter(F.col("doc_id") % REF_MOD == 0)
    bloom = (
        ref.select(F.explode(pos_arr).alias("pos"))
        .select(
            (F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, int(pos % {BLOOM_WORD}))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    ref_keys = ref.select(key.alias("k")).distinct().withColumn("ex", F.lit(1))

    probe = docs.filter(F.col("doc_id") % REF_MOD != 0)
    tested = (
        probe.select("doc_id", F.explode(pos_arr).alias("pos"))
        .select(
            "doc_id",
            (F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, int(pos % {BLOOM_WORD}))").alias("mask"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(
            F.bool_and("hit").alias("bloom_maybe_dup"),
            # partial hit count exposes the bitmap contents in the output
            # even when no doc clears all k bits (low fill factors), so the
            # oracle hash pins every filter bit at every scale
            F.sum(F.col("hit").cast("int")).alias("n_hits"),
        )
    )
    exact = probe.select("doc_id", key.alias("k")).join(
        F.broadcast(ref_keys), "k", "left"
    ).select("doc_id", F.col("ex").isNotNull().alias("exact_dup"))
    return tested.join(exact, "doc_id")


_POS_LIST = ", ".join(
    f"(({a} * h1 + {b} * h2) % {BLOOM_M})" for a, b in BLOOM_COEFFS
)

BLOOM_DEDUP_SQL = f"""
WITH hashed AS (
  SELECT doc_id,
         md5(lower(trim(text))) AS kk,
         ('0x' || substr(md5(lower(trim(text))), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(lower(trim(text))), 17, 8))::BIGINT AS h2
  FROM documents
),
positions AS (
  SELECT doc_id, unnest([{_POS_LIST}]) AS pos FROM hashed
),
bloom AS (
  SELECT pos // {BLOOM_WORD} AS word,
         bit_or(1::BIGINT << (pos % {BLOOM_WORD})) AS bits
  FROM positions WHERE doc_id % {REF_MOD} = 0
  GROUP BY 1
),
probe AS (
  SELECT p.doc_id,
         bool_and(b.bits IS NOT NULL AND
                  (b.bits & (1::BIGINT << (p.pos % {BLOOM_WORD})))
                    = (1::BIGINT << (p.pos % {BLOOM_WORD}))) AS bloom_maybe_dup,
         CAST(sum(CASE WHEN b.bits IS NOT NULL AND
                  (b.bits & (1::BIGINT << (p.pos % {BLOOM_WORD})))
                    = (1::BIGINT << (p.pos % {BLOOM_WORD}))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM positions p LEFT JOIN bloom b ON p.pos // {BLOOM_WORD} = b.word
  WHERE p.doc_id % {REF_MOD} <> 0
  GROUP BY 1
)
SELECT pr.doc_id, pr.bloom_maybe_dup, pr.n_hits,
       (h.kk IN (SELECT kk FROM hashed WHERE doc_id % {REF_MOD} = 0)) AS exact_dup
FROM probe pr JOIN hashed h USING (doc_id)
"""


QUERIES = {
    "benchmark_contamination": (benchmark_contamination, CONTAMINATION_SQL),
    "bloom_reference_dedup": (bloom_reference_dedup, BLOOM_DEDUP_SQL),
}
