"""Dedup-family queries with exact DuckDB oracles.

Every signature/pair set here is deterministic (md5 hash families), so the
oracles reproduce them bit-for-bit — the strongest possible check for
approximate-dedup code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.dedup.embedding import embedding_near_pairs, embedding_oracle_sql
from linqonsteroids_spark.dedup.minhash import lsh_candidate_pairs, minhash_oracle_sql
from linqonsteroids_spark.dedup.ngram import jaccard_pairs, jaccard_oracle_sql
from linqonsteroids_spark.dedup.simhash import simhash_oracle_sql, simhash_signatures

JACCARD_THRESHOLD = 0.2
EMBED_THRESHOLD = 0.25


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs)


def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)


def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, threshold=EMBED_THRESHOLD)


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline's OUTPUT: every document that survives
    near-dup removal (cluster representatives + never-flagged docs) with a
    flag for which it was. Pairs → components → anti-join is the shape a
    100 TB corpus wash actually runs; the anti-join drops non-representative
    cluster members without ever materializing cluster contents."""
    from linqonsteroids_spark.operators.fixpoint import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs)
    comp = connected_components(pairs)
    drops = comp.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(drops, "doc_id", "left_anti")
    flagged = comp.select(F.col("node").alias("doc_id"), F.lit(True).alias("was_flagged"))
    return (
        kept.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("was_flagged", F.lit(False)).alias("in_dup_cluster"),
        )
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs → duplicate CLUSTERS (keep one doc per component):
    min-label propagation over the pair graph (operators/fixpoint.py) —
    the step that turns pairwise near-dup signals into drop decisions.
    Oracle: recursive closure of the same pairs in SQL."""
    from linqonsteroids_spark.operators.fixpoint import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs)
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def dedup_clusters_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` through the bucketed-static-edge scale path:
    the symmetrized pair relation persists as a bucketed+sorted table on
    the join key, so every label-propagation round scans it Exchange-free
    (the plan delta is pinned in tests/test_operators.py). Same oracle as
    the checkpointed path — the physical layout must not move a label."""
    from linqonsteroids_spark.operators.fixpoint import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs)
    comp = connected_components(pairs, bucket_edges=True)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def dedup_source_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection with a POLICY, not just min-id: within each
    duplicate cluster keep the member from the highest-priority source
    (priority asc), ties by doc_id. This is how a real corpus wash picks
    between a curated copy and a crawl copy of the same document. Shape:
    components (log-round label propagation) → join member metadata →
    one ranking window per component — the cluster contents are never
    collected anywhere."""
    from linqonsteroids_spark.operators.fixpoint import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs)
    comp = connected_components(pairs)
    members = comp.join(
        docs.select(F.col("doc_id").alias("node"), "source"), "node"
    ).select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("component"),
        "source",
        # derived priority: curated-tier sources (even index) outrank
        # crawl-tier (odd index); deterministic from the name so both
        # engines compute it identically
        (F.regexp_extract("source", r"(\d+)", 1).cast("int") % 2).alias("priority"),
    )
    w = Window.partitionBy("component").orderBy("priority", "doc_id")
    return (
        members.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .join(
            members.groupBy("component").agg(F.count("*").alias("n_members")),
            "component",
        )
        .select(
            "component",
            F.col("doc_id").alias("keep_id"),
            F.col("source").alias("keep_source"),
            "n_members",
        )
    )


def _source_priority_sql() -> str:
    clusters = minhash_oracle_sql()["clusters"]
    return f"""
WITH comp_t AS ({clusters}),
members AS (
  SELECT c.doc_id, c.component, d.source,
         CAST(regexp_extract(d.source, '(\\d+)', 1) AS INT) % 2 AS priority
  FROM comp_t c JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY component
                               ORDER BY priority, doc_id) AS rnk
  FROM members
),
sizes AS (
  SELECT component, count(*) AS n_members FROM members GROUP BY component
)
SELECT r.component, r.doc_id AS keep_id, r.source AS keep_source, s.n_members
FROM ranked r JOIN sizes s USING (component)
WHERE r.rnk = 1
"""


QUERIES = {
    "dedup_minhash_pairs": (dedup_minhash_pairs, minhash_oracle_sql()["pairs"]),
    "dedup_simhash_signatures": (dedup_simhash_signatures, simhash_oracle_sql()),
    "dedup_ngram_jaccard": (
        dedup_ngram_jaccard,
        jaccard_oracle_sql(threshold=JACCARD_THRESHOLD),
    ),
    "dedup_embedding_pairs": (
        dedup_embedding_pairs,
        embedding_oracle_sql(threshold=EMBED_THRESHOLD),
    ),
    "dedup_clusters": (dedup_clusters, minhash_oracle_sql()["clusters"]),
    "dedup_clusters_bucketed": (
        dedup_clusters_bucketed,
        minhash_oracle_sql()["clusters"],
    ),
    "dedup_survivors": (dedup_survivors, minhash_oracle_sql()["survivors"]),
    "dedup_source_priority": (dedup_source_priority, _source_priority_sql()),
}
