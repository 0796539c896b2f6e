"""Dedup-operator behavior tests on synthetic near-duplicates.

The oracle differential covers signature/pair exactness on real tables;
these tests check the *semantics*: near-dups are caught, unrelated docs
are not, and blocking never has to fall back to all-pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and birds sing in the garden outside"
    )
    near = base.replace("warm", "cold")  # one-token edit → near-dup
    other = (
        "completely different subject matter about distributed query engines "
        "processing petabytes of columnar data with vectorized execution"
    )
    return spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base)],  # 4 = exact dup of 1
        "doc_id long, text string",
    )


def test_minhash_finds_near_and_exact_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(docs).collect()}
    assert (1, 4) in pairs  # exact dup: all bands collide
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup: ≥1 band collides
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated


def test_minhash_signature_is_deterministic(docs):
    s1 = sorted(map(tuple, minhash_signatures(docs).collect()))
    s2 = sorted(map(tuple, minhash_signatures(docs).collect()))
    assert s1 == s2


def test_simhash_hamming_ladder(docs):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]  # identical text → identical signature
    ham_near = bin(sigs[1] ^ sigs[2]).count("1")
    ham_far = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham_near < ham_far

    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(docs, max_hamming=6).collect()}
    assert pairs.get((1, 4)) == 0
    assert (1, 3) not in pairs


def test_jaccard_exact_values(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(docs, threshold=0.1).collect()}
    assert pairs[(1, 4)] == 1.0  # identical shingle sets
    assert 0.5 < pairs[(1, 2)] < 1.0  # one-token edit kills ~3 shingles
    assert (1, 3) not in pairs


def test_jaccard_df_cap_drops_stop_shingles(spark):
    # every doc shares 'a b c'; cap=2 must drop it, leaving no pairs
    df = spark.createDataFrame(
        [(i, "a b c unique%d token%d word%d" % (i, i, i)) for i in range(5)],
        "doc_id long, text string",
    )
    with_cap = jaccard_pairs(df, threshold=0.01, df_cap=2).count()
    without_cap = jaccard_pairs(df, threshold=0.01, df_cap=100).count()
    assert with_cap == 0 and without_cap == 10  # all C(5,2) share 'a b c'


def test_minhash_and_shingles_skip_null_text(spark):
    # NULL text must behave like the JVM path (lower(trim(NULL)) -> no
    # shingles, doc silently dropped), not raise AttributeError in the
    # Arrow stage; non-ASCII NBSP whitespace must NOT split tokens (the
    # re.ASCII pin — JVM/RE2 \s parity).
    from linqonsteroids_spark.dedup.minhash import minhash_signatures
    from linqonsteroids_spark.dedup.shingles import shingles_df

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, None),
            (3, "one two three four five"),  # NBSP inside a "token"
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs)
    assert {r.doc_id for r in sigs.select("doc_id").collect()} == {1, 3}
    sh = shingles_df(docs)
    got = {r.shingle for r in sh.filter("doc_id = 3").collect()}
    # NBSP kept inside the first token: 3 tokens -> shingle count matches
    assert got == {"one two three four", "three four five"}
