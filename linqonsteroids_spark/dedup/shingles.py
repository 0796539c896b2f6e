"""Shared shingling/tokenization for the dedup family.

Canonical definition (must stay in sync with the oracle SQL builders):
tokens = non-empty pieces of whitespace-split ``lower(trim(text))``;
shingles = space-joined 3-grams of consecutive tokens; docs with fewer
than 3 tokens produce no shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_N = 3


def tokens_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) — one row per non-empty token occurrence."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    return docs.select(F.col(id_col), F.explode(toks).alias("token"))


def shingles_array(text_col: str = "text") -> F.Column:
    """Column expression: array of 3-gram shingles for one document row.

    Row-local by design — per-doc signatures (minhash, simhash) should
    consume this array with HOFs instead of exploding it: the exploded
    shingle table is ~50x the corpus row count, and the groupBy that
    re-assembles per-doc aggregates shuffles all of it.

    The token array is bound ONCE via a single-element ``transform`` before
    the per-shingle lambda runs: referencing the raw ``filter(split(...))``
    expression from inside the lambda re-evaluates the whole
    tokenization per sequence element (no CSE across lambda scopes) —
    measured 3.7x slower on the sf0.1 corpus."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    return F.element_at(
        F.transform(
            F.array(toks),
            lambda ts: F.when(
                F.size(ts) >= SHINGLE_N,
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - (SHINGLE_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ts, i, SHINGLE_N)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )


def shingles_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    per_doc_distinct: bool = False,
) -> DataFrame:
    """(id, shingle) — one row per 3-gram shingle occurrence (not distinct).

    Produced in one Arrow-batched ``mapInPandas`` stage: the JVM
    ``shingles_array`` route builds each shingle through interpreted
    transform lambdas (concat_ws + slice per element — measured ~0.7 s
    for 260k shingles at sf0.1, the dedup family's shared bottleneck);
    the Python tokenizer emits identical strings (same whitespace split,
    ASCII-safe lower) at Arrow speed. Zero shuffle either way.

    ``per_doc_distinct=True`` dedupes WITHIN each document row-locally
    (first occurrence kept — row order is not meaningful downstream),
    the kernel form of ``array_distinct(shingles_array(...))``:
    consumers that count per-doc distinct shingles get the dedup for
    free instead of paying a (doc, shingle) shuffle or countDistinct
    expand."""
    out_type = dict(docs.dtypes)[id_col]
    schema = f"{id_col} {out_type}, shingle string"

    def emit(batches):
        import re

        import pandas as pd

        # re.ASCII: match the JVM/RE2 \s class (no Unicode whitespace)
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            ids, shingles = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue  # NULL text: no shingles (JVM lower(trim(NULL)) parity)
                toks = [t for t in ws.split(text.strip().lower()) if t]
                grams = [
                    " ".join(toks[i : i + SHINGLE_N])
                    for i in range(len(toks) - (SHINGLE_N - 1))
                ]
                if per_doc_distinct:
                    grams = list(dict.fromkeys(grams))
                ids.extend([doc_id] * len(grams))
                shingles.extend(grams)
            if ids:
                yield pd.DataFrame({id_col: ids, "shingle": shingles})

    src = docs.select(id_col, text_col)
    # same small-single-split spread rationale as minhash_signatures
    target = int(src.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if src.rdd.getNumPartitions() < max(target // 2, 2):
        src = src.repartition(max(2, min(target, 8)))
    return src.mapInPandas(emit, schema)


# DuckDB-side canonical fragments (used by oracle SQL builders)
DUCK_TOKS = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')"
DUCK_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [] END"
)
