"""Multimodal plumbing tests: schema, pruning, Arrow-batch stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linqonsteroids_spark.catalog import load_table
from linqonsteroids_spark.multimodal import (
    attach_fake_media,
    decode_image_stats,
    sample_video_frames,
)
from tests.conftest import SF_SMOKE


def _media(spark, n=30):
    docs = load_table(spark, SF_SMOKE, "documents").limit(n)
    return attach_fake_media(docs)


def test_media_schema(spark):
    df = _media(spark)
    assert dict(df.dtypes)["media_bytes"] == "binary"
    meta_type = dict(df.dtypes)["media_meta"]
    assert "format" in meta_type and "n_frames" in meta_type


def test_metadata_only_plan_prunes_payload(spark):
    df = _media(spark).select("doc_id", "media_meta.width").filter(F.col("width") > 100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # payload column must not be materialized for metadata-only queries
    assert "media_bytes" not in plan.split("ReadSchema")[-1]


def test_decode_image_stats_deterministic(spark):
    df = _media(spark)
    out1 = sorted(map(tuple, decode_image_stats(df).collect()))
    out2 = sorted(map(tuple, decode_image_stats(df).collect()))
    assert out1 == out2
    assert len(out1) == df.filter(F.col("media_meta.format") != "mp4").count()
    row = out1[0]
    assert 0.0 <= row[2] <= 1.0 and len(row[4]) == 16


def test_video_frame_sampling_counts(spark):
    df = _media(spark)
    frames = sample_video_frames(df, every_n=30)
    got = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    want = {
        r.doc_id: (r.n_frames + 29) // 30
        for r in df.filter(F.col("media_meta.format") == "mp4")
        .select("doc_id", F.col("media_meta.n_frames").alias("n_frames"))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("kind", ["image", "video"])
def test_decoder_dispatch_stub_vs_real(spark, kind):
    """Both media paths share the decoder-dispatch shape: 'stub' always
    works, 'real' raises NotImplementedError unless the library imports
    (in which case it runs — synthetic payloads then fail to parse, which
    is also proof the real decoder engaged)."""
    from linqonsteroids_spark.multimodal import media as m

    df = _media(spark, n=6)
    if kind == "image":
        have, run = m.HAVE_REAL_DECODER, lambda d: decode_image_stats(df, decoder=d)
    else:
        have, run = (
            m.HAVE_REAL_VIDEO_DECODER,
            lambda d: sample_video_frames(df, every_n=30, extractor=d),
        )
    assert run("stub").count() > 0
    if not have:
        with pytest.raises(Exception) as exc_info:
            run("real").collect()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )
    else:  # pragma: no cover - env lacks media libs
        with pytest.raises(Exception):  # fake payloads are not real containers
            run("real").collect()
