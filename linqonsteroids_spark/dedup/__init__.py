"""Deduplication operators for training-data pipelines.

The ladder, cheapest first (each a distinct precision/recall/cost point):

1. exact (hash-groupBy)            — ``queries/text.py dedup_exact``
2. fingerprint (normalized hash)   — ``queries/text.py doc_fingerprints``
3. SimHash (hamming near-dup)      — ``simhash.py``
4. MinHash + LSH (Jaccard near-dup)— ``minhash.py``
5. n-gram Jaccard (exact verify)   — ``ngram.py``
6. embedding cosine near-dup       — ``embedding.py``

All operators are deterministic (md5-based hash families) so results are
engine-reproducible — the DuckDB oracles compute the identical signatures.
"""

from linqonsteroids_spark.dedup.minhash import minhash_signatures, lsh_candidate_pairs  # noqa: F401
from linqonsteroids_spark.dedup.simhash import simhash_signatures, simhash_near_pairs  # noqa: F401
from linqonsteroids_spark.dedup.ngram import jaccard_pairs  # noqa: F401
from linqonsteroids_spark.dedup.embedding import embedding_near_pairs  # noqa: F401
from linqonsteroids_spark.dedup.shingles import shingles_df, tokens_df  # noqa: F401
