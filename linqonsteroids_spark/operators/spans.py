"""Exact duplicated-span detection (substring-level dedup).

Document-level dedup (exact hash, MinHash, SimHash — `dedup/`) misses the
dominant contamination mode in web corpora: long VERBATIM SPANS repeated
across otherwise-distinct documents (boilerplate, licenses, templated
pages). Removing duplicated substrings rather than whole documents is the
approach of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022, public) — their suffix-array ExactSubstr tool finds
spans >= N tokens occurring twice anywhere in the corpus.

A distributed suffix array is the wrong tool on Spark; the same detection
is expressible relationally: every length-N token window is fingerprinted,
a window whose fingerprint occurs >= 2 times corpus-wide is a duplicated
span seed, and the union of its [start, start+N) intervals is exactly the
set of tokens inside some duplicated span of length >= N. This is the
reference-free analogue of `queries/contamination.py` (which matches
windows against an eval set instead of the corpus itself).

Scale design (100 TB):
- Window fingerprints are emitted in the same zero-shuffle Arrow stage the
  dedup family uses for shingles (`dedup/shingles.py`); the shuffled
  relation carries (doc_id, start, 16-byte md5), never window text.
- The frequency count is one map-side-combined agg on the hash; the
  dup-seed join is a hash-hash equi-join (AQE-balanced; no broadcast
  assumption — the duplicated-window relation grows with the corpus).
- Interval union is computed ROW-LOCALLY per document with one sorted
  `aggregate` pass over the doc's seed starts (bounded by document length,
  the same row-local envelope as `doc_chunks`) — the N-times-larger
  covered-position relation is never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_N = 5


def span_windows_df(
    docs: DataFrame, n: int = SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, start, span) — one row per length-``n`` token window, stride 1.

    Tokenization matches `dedup/shingles.py` exactly (ASCII whitespace
    split of lower(trim(text)), empties dropped; docs with < n tokens emit
    nothing). ``start`` is the 0-based token offset of the window. One
    Arrow-batched mapInPandas stage — zero shuffle."""
    out_type = dict(docs.dtypes)[id_col]
    schema = f"{id_col} {out_type}, start long, span string"

    def emit(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            ids, starts, spans = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue  # NULL text: no windows (JVM lower(trim(NULL)) parity)
                toks = [t for t in ws.split(text.strip().lower()) if t]
                for i in range(len(toks) - n + 1):
                    ids.append(doc_id)
                    starts.append(i)
                    spans.append(" ".join(toks[i : i + n]))
            if ids:
                yield pd.DataFrame({id_col: ids, "start": starts, "span": spans})

    src = docs.select(id_col, text_col)
    target = int(src.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if src.rdd.getNumPartitions() < max(target // 2, 2):
        src = src.repartition(max(2, min(target, 8)))
    return src.mapInPandas(emit, schema)


def covered_token_count(starts: F.Column, n: int) -> F.Column:
    """Length of the union of intervals [s, s+n) for a SORTED ascending
    array of starts — row-local, one `aggregate` pass.

    Equal by construction to `count(DISTINCT position)` over the exploded
    positions (the oracle's formulation) without materializing them."""
    zero = F.struct(
        F.lit(0).cast("long").alias("covered"), F.lit(0).cast("long").alias("nxt")
    )
    return F.aggregate(
        starts,
        zero,
        lambda acc, s: F.struct(
            (
                acc["covered"]
                + F.greatest(F.lit(0).cast("long"), s + n - F.greatest(s, acc["nxt"]))
            ).alias("covered"),
            F.greatest(acc["nxt"], s + n).alias("nxt"),
        ),
        lambda acc: acc["covered"],
    )


def dup_seed_starts(
    docs: DataFrame, n: int = SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, starts) — sorted 0-based starts of this doc's duplicated
    windows (fingerprint occurs >= 2 times corpus-wide). The shared first
    half of the stats and removal pipelines."""
    hashed = span_windows_df(docs, n, id_col, text_col).select(
        id_col, "start", F.md5("span").alias("whash")
    )
    freq = hashed.groupBy("whash").agg(F.count("*").alias("n_occ"))
    seeds = hashed.join(freq.filter(F.col("n_occ") >= 2).select("whash"), "whash")
    return seeds.groupBy(id_col).agg(
        F.sort_array(F.collect_set("start")).alias("starts")
    )


def remove_duplicated_spans(
    docs: DataFrame, n: int = SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The removal half of exact substring dedup (Lee et al.): drop every
    token position covered by a duplicated window and reconstruct the
    document from the survivors.

    Output: (id, clean_text, n_kept) over the canonical token stream
    (lowercased ASCII-whitespace tokens — the same normalization the
    fingerprints use, so removal boundaries align with detection).
    Row-local reconstruction: one positional `filter` over the token
    array with an `exists` probe into the doc's own (tiny) start list —
    no covered-position relation, no second shuffle beyond the seed
    aggregation."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    joined = (
        docs.select(id_col, toks.alias("toks"))
        .join(dup_seed_starts(docs, n, id_col, text_col), id_col, "left")
        .withColumn(
            "starts", F.coalesce(F.col("starts"), F.expr("CAST(array() AS array<long>)"))
        )
        .withColumn(
            "kept",
            F.expr(
                f"filter(toks, (t, i) -> "
                f"NOT exists(starts, s -> i >= s AND i < s + {n}))"
            ),
        )
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", F.col("kept")).alias("clean_text"),
        F.size("kept").cast("long").alias("n_kept"),
    )


def duplicated_span_stats(
    docs: DataFrame, n: int = SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-span exposure.

    Output: (id, n_tokens, n_dup_windows, n_dup_tokens, dup_ppm) where
    n_dup_windows counts this document's windows whose fingerprint occurs
    >= 2 times corpus-wide (within-document repeats count — a doc that
    repeats its own boilerplate is still duplicated text), n_dup_tokens is
    the exact number of token positions covered by at least one such
    window, and dup_ppm is the integer parts-per-million coverage rate
    (floor division — hashed-output discipline: integers only)."""
    hashed = span_windows_df(docs, n, id_col, text_col).select(
        id_col, "start", F.md5("span").alias("whash")
    )
    freq = hashed.groupBy("whash").agg(F.count("*").alias("n_occ"))
    seeds = hashed.join(freq.filter(F.col("n_occ") >= 2).select("whash"), "whash")
    per_doc = seeds.groupBy(id_col).agg(
        F.count("*").alias("n_dup_windows"),
        covered_token_count(F.sort_array(F.collect_set("start")), n).alias(
            "n_dup_tokens"
        ),
    )
    n_tokens = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    )
    return (
        docs.select(id_col, n_tokens.alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_dup_tokens", F.lit(0)).alias("n_dup_tokens"),
            F.expr(
                "coalesce(n_dup_tokens, 0L) * 1000000L div greatest(n_tokens, 1L)"
            ).alias("dup_ppm"),
        )
    )
