"""Training-data pipeline operators (queries/pipeline.py): semantic
invariants + plan-shape assertions (shuffle counts are the scale contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linqonsteroids_spark.queries.pipeline import (
    _MIX_WEIGHTS,
    _N_SHARDS,
    _PACK_BUDGET,
    corpus_mix_sample,
    doc_repetition_scores,
    pack_sequences,
    pii_scrub,
    training_shards,
)
from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mix_sample_is_deterministic_and_tracks_weights(spark):
    a = {r.doc_id for r in corpus_mix_sample(spark, SF_SMOKE).collect()}
    b = {r.doc_id for r in corpus_mix_sample(spark, SF_SMOKE).collect()}
    assert a == b  # hash sampling, not rand(): re-runs agree exactly
    rates = {
        r.source: r.n
        for r in corpus_mix_sample(spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    w = dict(_MIX_WEIGHTS)
    # 25 docs/source at sf0.001 — loose binomial bounds around w*25
    for src, n in rates.items():
        assert n <= 25
        assert abs(n - 25 * w[src]) <= 12, (src, n, w[src])
    # weight-1.0 sources keep everything
    full = [s for s, wt in _MIX_WEIGHTS if wt == 1.0]
    for s in full:
        assert rates[s] == 25


def test_mix_sample_has_no_shuffle(spark):
    # broadcast dim + row-local predicate: no Exchange anywhere
    plan = _physical(corpus_mix_sample(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")


def test_pack_sequences_offsets_are_contiguous_per_shard(spark):
    rows = pack_sequences(spark, SF_SMOKE).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == _N_SHARDS
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in shard_rows:
            assert offset % _PACK_BUDGET == r.pack_offset
            assert offset // _PACK_BUDGET == r.pack_id
            offset += r.n_tokens


def test_pack_sequences_single_shuffle(spark):
    # one Exchange (hashpartitioning on shard) feeds the window — the
    # shard-parallel design; never a single-partition global sort
    plan = _physical(pack_sequences(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_training_shards_positions_are_dense(spark):
    rows = training_shards(spark, SF_SMOKE).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.position)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_repetition_scores_on_crafted_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "solo")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in _apply_repetition(docs).collect()}
    # "a a a a": 4 tokens, 1 distinct → ttr 0.25; bigrams all "a a" → dup 2/3
    assert out[1].n_tokens == 4 and out[1].ttr == 0.25
    assert abs(out[1].dup_bigram_frac - round(1 - 1 / 3, 6)) < 1e-9
    # all-distinct: ttr 1.0, no dup bigrams
    assert out[2].ttr == 1.0 and out[2].dup_bigram_frac == 0.0
    # single token: no bigrams → 0.0 by definition
    assert out[3].n_tokens == 1 and out[3].dup_bigram_frac == 0.0


def _apply_repetition(docs):
    """Repetition expressions applied to an arbitrary docs frame (the query
    fn is bound to the documents table; tests need crafted rows)."""
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    ttr = F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup = F.when(
        F.size(bigrams) > 0,
        F.round(1 - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams), 6),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id", n.alias("n_tokens"), ttr.alias("ttr"), dup.alias("dup_bigram_frac")
    )


def test_pii_scrub_redacts_planted_contacts(spark):
    out = pii_scrub(spark, SF_SMOKE)
    rows = out.collect()
    # every doc gets exactly one planted email; id digits are 3+ chars from
    # doc_id*7919 (>= 0*7919 .. but 0*7919=0 → '0', shorter) — assert the
    # email always redacts and counts are non-negative
    assert all(r.n_emails == 1 for r in rows)
    assert all(r.n_nums >= 1 for r in rows if r.doc_id > 0)
    # no shuffle: row-local regexp only
    plan = _physical(out)
    assert "Exchange" not in plan


def test_weighted_sample_two_stage_equals_single_window(spark):
    """The subshard prune must be invisible: the two-stage top-k equals the
    single-window per-source top-k (a global top-k member is top-k within
    its own subshard, so pruning never removes one)."""
    from pyspark.sql import Window

    from linqonsteroids_spark.queries.pipeline import (
        _WSAMPLE_K,
        _WSAMPLE_SCALE,
        _WSAMPLE_SEED,
        weighted_sample_per_source,
    )
    from tests.conftest import SF_SMOKE
    from linqonsteroids_spark.catalog import load_table

    got = weighted_sample_per_source(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    hex12 = F.substring(
        F.md5(F.concat(F.lit(_WSAMPLE_SEED), F.col("doc_id").cast("string"))), 1, 12
    )
    single = (
        docs.select("doc_id", "source", F.col("n_chars").cast("bigint").alias("w"))
        .withColumn("u", F.conv(hex12, 16, 10).cast("bigint"))
        .withColumn("priority", F.expr(f"{_WSAMPLE_SCALE}L * w div (u + 1L)"))
        .withColumn(
            "pick_rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("priority"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("pick_rank") <= _WSAMPLE_K)
        .select("doc_id", "source", F.col("pick_rank").cast("long").alias("pick_rank"), "priority")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, single.collect()))
    # deterministic across runs, k bound holds
    again = weighted_sample_per_source(spark, SF_SMOKE)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, got.collect()))
    assert got.groupBy("source").count().agg(F.max("count")).collect()[0][0] <= _WSAMPLE_K


def test_weighted_sample_prefers_heavier_docs(spark):
    """Size-biased inclusion: the mean weight of sampled docs must exceed
    the corpus mean (the point of priority sampling)."""
    from linqonsteroids_spark.queries.pipeline import weighted_sample_per_source
    from tests.conftest import SF_SMOKE
    from linqonsteroids_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    sampled = weighted_sample_per_source(spark, SF_SMOKE).join(docs, "doc_id")
    mean_sampled = sampled.agg(F.avg("n_chars")).collect()[0][0]
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert mean_sampled > mean_all


def test_compression_ratio_bit_exact_vs_local_zlib(spark):
    """Rows-only gate evidence (the bpe_learned_merges pattern): the
    Arrow-staged zlib lengths must equal direct python zlib on the same
    utf-8 bytes, row for row, and the ppm ratio must be the exact floor
    division."""
    import zlib

    from linqonsteroids_spark.catalog import load_table
    from linqonsteroids_spark.queries.text import (
        _ZLIB_LEVEL,
        compression_ratio_scores,
    )
    from tests.conftest import SF_SMOKE

    got = {
        r.doc_id: r for r in compression_ratio_scores(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    assert len(got) == docs.count()
    for r in docs.collect():
        b = (r.text or "").encode("utf-8")
        g = got[r.doc_id]
        assert g.n_bytes == len(b)
        assert g.z_bytes == len(zlib.compress(b, _ZLIB_LEVEL))
        assert g.ratio_ppm == g.z_bytes * 1_000_000 // max(g.n_bytes, 1)
