"""Property-based tests (hypothesis) for the pure-stdlib media codecs
and the Bloom/simhash bit machinery — all driver-side pure Python, so
hypothesis can run hundreds of examples without touching Spark.

The Spark-side tests pin specific fixtures end-to-end; these pin the
ALGEBRA: encode→decode round-trips for arbitrary inputs, pigeonhole
completeness for arbitrary signatures, no-false-negative membership for
arbitrary key sets.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_multimodal import _encode_png, _encode_wav, _encode_y4m


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(1, 2),
)
def test_wav_roundtrip_arbitrary_samples(samples, rate, channels):
    from linqonsteroids_spark.multimodal.media import _audio_stats_real, _parse_wav

    data = _encode_wav(rate, channels, samples)
    got_rate, got_nch, got = _parse_wav(data)
    assert (got_rate, got_nch, got) == (rate, channels, samples)
    stats = _audio_stats_real(data)
    n_frames = max(len(samples) // channels, 1)
    assert stats["duration_ms"] == n_frames * 1000 // rate
    assert stats["peak_amp"] == max(abs(s) for s in samples)
    assert stats["energy"] == sum(s * s for s in samples) // len(samples)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 5),
    st.integers(1, 3),
    st.sampled_from(["mono", "420", "422", "444"]),
    st.randoms(use_true_random=False),
)
def test_y4m_roundtrip_arbitrary_frames(w2, h2, n_frames, chroma, rnd):
    from linqonsteroids_spark.multimodal.media import _parse_y4m

    w, h = w2 * 2, h2 * 2  # chroma subsampling needs even dims
    frames = [
        bytes(rnd.randrange(256) for _ in range(w * h)) for _ in range(n_frames)
    ]
    got_w, got_h, got = _parse_y4m(_encode_y4m(w, h, frames, chroma))
    assert (got_w, got_h, got) == (w, h, frames)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 255), min_size=4, max_size=4),
        min_size=1,
        max_size=6,
    ),
    st.lists(st.integers(0, 4), min_size=6, max_size=6),
)
def test_png_roundtrip_arbitrary_gray(rows, filters):
    from linqonsteroids_spark.multimodal.media import _decode_png_pure

    data = _encode_png(rows, filters=filters[: len(rows)])
    px, width = _decode_png_pure(data)
    assert width == 4
    assert px == [v for r in rows for v in r]


@settings(max_examples=80, deadline=None)
@given(st.integers(0, (1 << 48) - 1), st.integers(0, (1 << 48) - 1))
def test_simhash_pigeonhole_canonical_combo(a, b):
    """For any two 48-bit signatures within hamming 3, at least one of
    the C(6,3) block combinations is fully intact, and the canonical
    (first-intact) combination is unique — the properties the blocked
    pair search's completeness and dedup-by-construction rest on."""
    from itertools import combinations

    from linqonsteroids_spark.dedup.simhash import BLOCK_BITS, N_BLOCKS

    diff = a ^ b
    touched = {
        i
        for i in range(N_BLOCKS)
        if (diff >> (i * BLOCK_BITS)) & ((1 << BLOCK_BITS) - 1)
    }
    intact = [
        ci
        for ci, combo in enumerate(combinations(range(N_BLOCKS), 3))
        if not (set(combo) & touched)
    ]
    if bin(diff).count("1") <= 3:
        assert intact, "pigeonhole violated"
    # canonical choice is deterministic: min index, computed two ways
    if intact:
        assert min(intact) == intact[0]


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(0, 1 << 40), min_size=1, max_size=200))
def test_bloom_bitmap_python_model_no_false_negatives(keys):
    """A pure-Python model of the Bloom position arithmetic (same md5
    halves, same coefficients, same bitmap math as operators/bloomjoin's
    distributed build): every inserted key must test positive."""
    import hashlib

    from linqonsteroids_spark.operators.bloomjoin import BLOOM_COEFFS, BLOOM_M

    def positions(k):
        # mirrors _halves: seeded xxhash64 in Spark; the PROPERTY under
        # test (member => all bits set) is hash-independent, so the model
        # uses md5 which pure Python can compute
        d = hashlib.md5(str(k).encode()).digest()
        h1 = int.from_bytes(d[:4], "big")
        h2 = int.from_bytes(d[8:12], "big")
        return [(a * h1 + b * h2) % BLOOM_M for a, b in BLOOM_COEFFS]

    bits = 0
    for k in keys:
        for p in positions(k):
            bits |= 1 << p
    for k in keys:
        assert all((bits >> p) & 1 for p in positions(k))
