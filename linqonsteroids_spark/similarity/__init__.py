"""Similarity search over embedding columns: brute-force and LSH-bucketed ANN."""
