"""Multimodal column plumbing: binary payloads + typed metadata, processed
via Arrow-batched pandas iterators.

Design (north-star spec): media is an opaque ``binary`` column with a
``struct`` of typed metadata; decode / feature-extract / resize / frame-
sample run as ``mapInPandas`` stages — Arrow batches in, Arrow batches
out, never row-at-a-time Python. Decode runs in tiers: real libraries
when importable (PIL for images, PyAV for video), pure-stdlib decoders
for the formats that need no codec library (PNG via zlib+unfilter, Y4M
via header demux — both CI-exercised with exact-pixel pins), and a
deterministic stub (``_decode_stub``) for synthetic payloads and formats
whose real decoder is absent, where the plug point raises
``NotImplementedError``. Everything Spark-side — schema, partitioning,
batch iteration, UDF signatures — is real and tested.

Scale: mapInPandas streams Arrow batches per partition; payload bytes
never transit the driver. Size partitions via
``spark.sql.files.maxPartitionBytes`` so batches fit executor memory;
metadata-only transforms (filtering by width, routing by format) operate
on the struct column and never touch the payload — column pruning drops
the binary entirely (verify with .explain: ReadSchema excludes it).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media payload + metadata column pair added by attach_*
MEDIA_SCHEMA = StructType(
    [
        StructField("media_bytes", BinaryType()),
        StructField(
            "media_meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("size_bytes", LongType()),
                ]
            ),
        ),
    ]
)

try:  # auto-activate the real decoder when an imaging library exists
    from PIL import Image as _PIL_Image  # noqa: N813

    HAVE_REAL_DECODER = True
except ImportError:  # this environment ships no imaging libs — stub path
    _PIL_Image = None
    HAVE_REAL_DECODER = False

try:  # same auto-activation shape for video (PyAV wraps ffmpeg)
    import av as _av

    HAVE_REAL_VIDEO_DECODER = True
except ImportError:  # no ffmpeg bindings here — stub path
    _av = None
    HAVE_REAL_VIDEO_DECODER = False


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic synthetic media column derived from the id —
    stands in for ``spark.read.format('binaryFile')`` / a bytes column from
    upstream storage. Real plumbing, fake payload."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    fmt = F.when(F.col(id_col) % 3 == 0, "png").when(F.col(id_col) % 3 == 1, "jpeg").otherwise("mp4")
    meta = F.struct(
        fmt.alias("format"),
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        F.when(fmt == "mp4", (F.col(id_col) % 120 + 1).cast("int"))
        .otherwise(F.lit(1).cast("int"))
        .alias("n_frames"),
        F.length(payload).cast("long").alias("size_bytes"),
    )
    return df.withColumn("media_bytes", payload).withColumn("media_meta", meta)


def _decode_stub(data: bytes) -> dict:
    """Deterministic fake decode: pseudo pixel stats from a content hash.
    Replace with PIL/libav when available."""
    h = hashlib.sha256(data).digest()
    return {
        "mean_luma": h[0] / 255.0,
        "edge_density": h[1] / 255.0,
        "content_hash": h.hex()[:16],
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_pure(data: bytes) -> tuple[list[int], int]:
    """Pure-stdlib PNG decode → (grayscale pixels, width).

    A REAL decoder (zlib inflate + per-scanline unfiltering per the PNG
    spec), not a stub — it exists so the real-decode path has CI coverage
    in environments without PIL. Supports the common still-image subset:
    8-bit depth, color types 0 (gray), 2 (RGB) and 6 (RGBA, alpha
    dropped), no interlace. RGB→luma uses PIL's exact ITU-R 601 integer
    formula ((19595R + 38470G + 7471B + 2^15) >> 16) so the two tiers are
    bit-identical on the same file (pinned by a skipif-PIL parity test).
    """
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG byte stream")
    pos, width, height, bit_depth, color_type, idat = 8, 0, 0, 0, 0, b""
    while pos < len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or color_type not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    f"pure PNG tier supports 8-bit gray/RGB/RGBA non-interlaced; "
                    f"got depth={bit_depth} color={color_type} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    raw = zlib.decompress(idat)
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * nch
    px: list[int] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        filt, line = raw[off], bytearray(raw[off + 1 : off + 1 + stride])
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0  # left
            b = prev[i]  # up
            c = prev[i - nch] if i >= nch else 0  # up-left
            if filt == 1:
                line[i] = (line[i] + a) & 0xFF
            elif filt == 2:
                line[i] = (line[i] + b) & 0xFF
            elif filt == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif filt == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        for i in range(0, stride, nch):
            if nch == 1:
                px.append(line[i])
            else:
                r, g, bl = line[i], line[i + 1], line[i + 2]
                px.append((19595 * r + 38470 * g + 7471 * bl + 0x8000) >> 16)
        prev = line
    return px, width


def _luma_stats(px: list[int], width: int, data: bytes) -> dict:
    """Shared stats over decoded grayscale pixels — both real tiers (PIL
    and pure-PNG) land here, so their outputs agree by construction."""
    n = max(len(px), 1)
    w = width or 1
    edges = sum(
        1 for i in range(len(px) - 1) if (i + 1) % w and abs(px[i + 1] - px[i]) > 32
    )
    return {
        "mean_luma": sum(px) / (255.0 * n),
        "edge_density": edges / n,
        "content_hash": hashlib.sha256(data).hexdigest()[:16],
    }


def _decode_real(data: bytes) -> dict:
    """Real decode tier: PIL when importable (any format), else the
    pure-stdlib PNG decoder for PNG payloads. Same output contract as the
    stub (mean_luma, edge_density in [0,1], 16-hex content hash) so
    downstream schemas never change."""
    if _PIL_Image is not None:  # pragma: no cover - env lacks PIL
        import io

        img = _PIL_Image.open(io.BytesIO(data)).convert("L")
        return _luma_stats(list(img.getdata()), img.width, data)
    if data[:8] == _PNG_SIG:
        return _luma_stats(*_decode_png_pure(data), data)
    raise NotImplementedError(
        "real decode of non-PNG formats requires PIL, not present in this "
        "environment; the stub path (_decode_stub) remains active for them"
    )


DECODE_RESULT_SCHEMA = (
    "doc_id long, format string, mean_luma double, edge_density double, content_hash string"
)


def decode_image_stats(
    df: DataFrame, id_col: str = "doc_id", decoder: str = "auto"
) -> DataFrame:
    """Decode media → per-item stats via mapInPandas (Arrow batches).

    Filter pushes down BEFORE decode: only image rows reach Python.
    ``decoder``: "auto" uses PIL when importable, else the stub; "stub"
    forces the deterministic fake (required for synthetic payloads — e.g.
    the oracle-gated query, whose bytes are hashes, not images); "real"
    forces PIL and raises without it.
    """
    images = df.filter(F.col("media_meta.format").isin("png", "jpeg")).select(
        F.col(id_col).alias("doc_id"),
        F.col("media_meta.format").alias("format"),
        F.col("media_bytes"),
    )
    use_real = HAVE_REAL_DECODER if decoder == "auto" else decoder == "real"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if use_real else _decode_stub
        for pdf in batches:
            stats = [decode(bytes(b)) for b in pdf["media_bytes"]]
            out = pd.DataFrame(stats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "format", pdf["format"].values)
            yield out

    return images.mapInPandas(decode_batches, schema=DECODE_RESULT_SCHEMA)


# --- resize (the remaining multimodal verb: decode/feature/RESIZE/sample) ----


def _resize_nearest(
    px: list[int], width: int, new_w: int, new_h: int
) -> list[int]:
    """Nearest-neighbor grayscale resize, integer-exact: src index =
    floor(dst * src_dim / dst_dim). Deliberately OUR kernel rather than
    PIL's NEAREST (whose sampling offsets differ): the library tier only
    DECODES, resize always runs here, so every tier produces identical
    bytes (the _luma_stats sharing discipline)."""
    height = len(px) // max(width, 1)
    out: list[int] = []
    for y in range(new_h):
        row = (y * height // new_h) * width
        for x in range(new_w):
            out.append(px[row + x * width // new_w])
    return out


def _resize_stats_stub(data: bytes, new_w: int, new_h: int) -> dict:
    """Deterministic fake resize stats, SQL-replayable (ASCII payload →
    byte concat == string concat): sha256(payload || '#WxH')."""
    h = hashlib.sha256(
        data + f"#{new_w}x{new_h}".encode()
    ).digest()
    return {
        "out_w": new_w,
        "out_h": new_h,
        "mean_luma": h[0],
        "resized_hash": h.hex()[:16],
    }


def _resize_stats_real(data: bytes, new_w: int, new_h: int) -> dict:
    """Real tier: decode (PIL when importable, pure-stdlib PNG
    otherwise), resize with the shared integer kernel, integer floor
    mean + content hash of the resized plane — every value exact."""
    if _PIL_Image is not None:  # pragma: no cover - env lacks PIL
        import io

        img = _PIL_Image.open(io.BytesIO(data)).convert("L")
        px, width = list(img.getdata()), img.width
    elif data[:8] == _PNG_SIG:
        px, width = _decode_png_pure(data)
    else:
        raise NotImplementedError(
            "real resize of non-PNG formats requires PIL, not present in "
            "this environment; the stub path remains active for them"
        )
    out = _resize_nearest(px, width, new_w, new_h)
    return {
        "out_w": new_w,
        "out_h": new_h,
        "mean_luma": sum(out) // max(len(out), 1),
        "resized_hash": hashlib.sha256(bytes(out)).hexdigest()[:16],
    }


RESIZE_RESULT_SCHEMA = (
    "doc_id long, format string, out_w int, out_h int, "
    "mean_luma int, resized_hash string"
)


def resize_images(
    df: DataFrame,
    new_w: int,
    new_h: int,
    id_col: str = "doc_id",
    decoder: str = "auto",
) -> DataFrame:
    """Image resize → per-item (dims, integer mean luma, resized-plane
    hash) via mapInPandas, the standard thumbnail/normalization pass of
    a multimodal training pipeline. Same dispatch contract as
    decode_image_stats ("auto" tries the real tier per payload and
    degrades undecodable bytes to the stub); only image rows reach
    Python; row-local, zero shuffle."""
    images = df.filter(F.col("media_meta.format").isin("png", "jpeg")).select(
        F.col(id_col).alias("doc_id"),
        F.col("media_meta.format").alias("format"),
        F.col("media_bytes"),
    )

    def one(b: bytes) -> dict:
        if decoder == "real":
            return _resize_stats_real(b, new_w, new_h)
        if decoder == "stub":
            return _resize_stats_stub(b, new_w, new_h)
        try:
            return _resize_stats_real(b, new_w, new_h)
        except Exception:  # noqa: BLE001 — degrade, don't fail the stage
            return _resize_stats_stub(b, new_w, new_h)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [one(bytes(b)) for b in pdf["media_bytes"]]
            out = pd.DataFrame(stats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "format", pdf["format"].values)
            yield out

    return images.mapInPandas(batches, schema=RESIZE_RESULT_SCHEMA)


FRAME_RESULT_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def _extract_frame_stub(data: bytes, frame_idx: int) -> str:
    """Deterministic fake frame feature: hash of payload + frame index."""
    return hashlib.sha256(data + int(frame_idx).to_bytes(4, "big")).hexdigest()[:16]


_Y4M_SIG = b"YUV4MPEG2"

#: luma-plane size multiplier for the chroma subsampling tags the Y4M
#: spec defines (we only ever read the Y plane, but must skip chroma)
_Y4M_CHROMA = {
    "mono": 0.0,
    "420": 0.5, "420jpeg": 0.5, "420paldv": 0.5, "420mpeg2": 0.5,
    "422": 1.0,
    "444": 2.0,
}


def _parse_y4m(data: bytes) -> tuple[int, int, list[bytes]]:
    """Pure-stdlib YUV4MPEG2 (.y4m) demux → (width, height, [Y plane per
    frame]).

    A REAL video decode path, not a stub: Y4M is ffmpeg's standard
    uncompressed interchange container (plain-text stream header, then
    ``FRAME`` + planar YUV per frame — the published mjpegtools format),
    so it is parseable without any codec library, the same role the
    pure-PNG tier plays for images. The row-major Y plane is byte-
    identical to PyAV's ``frame.to_ndarray(format="gray")`` for the same
    stream (swscale's gray8 from planar YUV copies luma), so the two
    tiers hash identically.
    """
    nl = data.index(b"\n")
    toks = data[:nl].decode("ascii").split()
    if toks[0] != _Y4M_SIG.decode():
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = "420"
    for t in toks[1:]:
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "C":
            chroma = t[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    y_size = w * h
    frame_size = y_size + int(y_size * _Y4M_CHROMA[chroma])
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1  # FRAME line may carry params
        frames.append(data[pos : pos + y_size])
        pos += frame_size
    return w, h, frames


def _extract_frame_real(data: bytes, frame_idx: int) -> str:
    """Real frame extraction: PyAV when importable (any container), else
    the pure-stdlib Y4M demuxer for Y4M payloads. Same output contract as
    the stub (16-hex hash of the gray frame content) so downstream
    schemas never change."""
    if data[: len(_Y4M_SIG)] == _Y4M_SIG:
        _, _, frames = _parse_y4m(data)
        if frame_idx >= len(frames):
            raise IndexError(f"frame {frame_idx} out of range")
        return hashlib.sha256(frames[frame_idx]).hexdigest()[:16]
    if _av is None:
        raise NotImplementedError(
            "real frame extraction of non-Y4M containers requires PyAV "
            "(ffmpeg bindings), not present in this environment; the stub "
            "path (_extract_frame_stub) remains active for them"
        )
    import io  # pragma: no cover - env lacks PyAV

    with _av.open(io.BytesIO(data)) as container:  # pragma: no cover
        for i, frame in enumerate(container.decode(video=0)):
            if i == frame_idx:
                payload = frame.to_ndarray(format="gray").tobytes()
                return hashlib.sha256(payload).hexdigest()[:16]
    raise IndexError(f"frame {frame_idx} out of range")  # pragma: no cover


def _frame_luma_stub(data: bytes, frame_idx: int) -> int:
    """Deterministic fake per-frame mean luma in 0..255. The synthetic
    payload is ASCII (a hex string cast to binary), so the byte concat
    here equals STRING concat — which is what makes the stub
    SQL-replayable: sha256(payload_str || ':' || idx), first hex byte."""
    h = hashlib.sha256(data + b":" + str(int(frame_idx)).encode()).hexdigest()
    return int(h[:2], 16)


def _frame_luma_real(data: bytes, frame_idx: int) -> int:
    """Real per-frame mean luma (integer floor mean of the Y plane):
    pure-stdlib Y4M demux, PyAV for compressed containers when present."""
    if data[: len(_Y4M_SIG)] == _Y4M_SIG:
        _, _, frames = _parse_y4m(data)
        if frame_idx >= len(frames):
            raise IndexError(f"frame {frame_idx} out of range")
        plane = frames[frame_idx]
        return sum(plane) // max(len(plane), 1)
    if _av is None:
        raise NotImplementedError(
            "real frame luma of non-Y4M containers requires PyAV, not "
            "present in this environment; the stub tier remains active"
        )
    import io  # pragma: no cover - env lacks PyAV

    with _av.open(io.BytesIO(data)) as container:  # pragma: no cover
        for i, frame in enumerate(container.decode(video=0)):
            if i == frame_idx:
                plane = frame.to_ndarray(format="gray").tobytes()
                return sum(plane) // max(len(plane), 1)
    raise IndexError(f"frame {frame_idx} out of range")  # pragma: no cover


LUMA_RESULT_SCHEMA = "doc_id long, frame_idx int, luma int"


def frame_lumas(
    df: DataFrame, id_col: str = "doc_id", extractor: str = "auto"
) -> DataFrame:
    """(doc_id, frame_idx, luma) for EVERY frame of every video row —
    the feature pass keyframe selection consumes. Same dispatch contract
    as sample_video_frames; the explode is JVM-side, only video rows
    reach the Arrow stage."""
    videos = df.filter(F.col("media_meta.format").isin("mp4", "y4m")).select(
        F.col(id_col).alias("doc_id"),
        "media_bytes",
        F.col("media_meta.n_frames").alias("n_frames"),
    )
    # n_frames == 0 must emit no rows (sequence(0, -1) is [0, -1])
    frames = videos.filter(F.col("n_frames") > 0).select(
        "doc_id",
        "media_bytes",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
    use_real = HAVE_REAL_VIDEO_DECODER if extractor == "auto" else extractor == "real"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _frame_luma_real if use_real else _frame_luma_stub
        for pdf in batches:
            lumas = [
                fn(bytes(b), int(i))
                for b, i in zip(pdf["media_bytes"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "luma": lumas,
                }
            )

    return frames.mapInPandas(extract, schema=LUMA_RESULT_SCHEMA)


def select_keyframes(lumas: DataFrame, threshold: int = 64) -> DataFrame:
    """Scene-change keyframe selection — the frame-level near-dup filter
    a video training pipeline runs before feature extraction (consecutive
    frames are overwhelmingly redundant): keep frame 0 and every frame
    whose |luma - previous luma| exceeds ``threshold``. Relational and
    integer-exact: one window shuffled on doc_id. Input is any
    (doc_id, frame_idx, luma) relation (frame_lumas output)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(F.col("luma") - F.lag("luma").over(w))
    return (
        lumas.withColumn("delta", delta)
        .filter(F.col("delta").isNull() | (F.col("delta") > threshold))
        .select("doc_id", "frame_idx", "luma")
    )


# --- audio ------------------------------------------------------------------

_WAV_SIG = b"RIFF"


def _parse_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib RIFF/WAVE PCM16 parse → (sample_rate, n_channels,
    interleaved samples). The audio counterpart of the pure-PNG/Y4M
    tiers: WAV's chunked RIFF layout (canonical fmt + data chunks) is a
    published container needing no codec library for PCM payloads."""
    import struct

    if data[:4] != _WAV_SIG or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE byte stream")
    pos, rate, nch, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, nch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"pure WAV tier supports PCM16; got format={fmt_tag} bits={bits}"
                )
        elif cid == b"data":
            samples = list(
                struct.unpack(f"<{len(body) // 2}h", body[: len(body) // 2 * 2])
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, nch, samples


AUDIO_RESULT_SCHEMA = (
    "doc_id long, format string, duration_ms long, peak_amp long, "
    "energy long, content_hash string"
)


def _audio_stats_stub(data: bytes) -> dict:
    """Deterministic fake audio stats from a content hash — all-integer
    output (duration / peak / mean-square energy), SQL-replayable like
    the image stub."""
    h = hashlib.sha256(data).digest()
    return {
        "duration_ms": (h[0] << 8) | h[1],
        "peak_amp": (h[2] << 8) | h[3],
        "energy": (h[4] << 8) | h[5],
        "content_hash": h.hex()[:16],
    }


def _audio_stats_real(data: bytes) -> dict:
    """Real decode tier: stdlib WAV parse for RIFF payloads (exact
    integer duration, peak amplitude, and mean-square energy — no float
    summation anywhere), NotImplementedError plug point for compressed
    formats (mp3/flac need codec libraries absent here)."""
    if data[:4] == _WAV_SIG:
        rate, nch, samples = _parse_wav(data)
        n_frames = max(len(samples) // max(nch, 1), 1)
        sumsq = 0
        peak = 0
        for s in samples:
            a = -s if s < 0 else s
            if a > peak:
                peak = a
            sumsq += s * s
        return {
            "duration_ms": n_frames * 1000 // rate,
            "peak_amp": peak,
            "energy": sumsq // max(len(samples), 1),
            "content_hash": hashlib.sha256(data).hexdigest()[:16],
        }
    raise NotImplementedError(
        "real decode of compressed audio requires codec libraries not "
        "present in this environment; the stub path remains active for them"
    )


def attach_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthetic audio column: sha2-derived payload + typed metadata
    (wav/mp3 alternating by id) — the binaryFile-source stand-in."""
    payload = F.sha2(F.concat(F.lit("aud:"), F.col(id_col).cast("string")), 256).cast(
        "binary"
    )
    fmt = F.when(F.col(id_col) % 2 == 0, "wav").otherwise("mp3")
    meta = F.struct(
        fmt.alias("format"),
        F.lit(16000).alias("sample_rate"),
        (F.col(id_col) % 2 + 1).cast("int").alias("n_channels"),
        F.length(payload).cast("long").alias("size_bytes"),
    )
    return df.withColumn("media_bytes", payload).withColumn("media_meta", meta)


def decode_audio_stats(
    df: DataFrame, id_col: str = "doc_id", decoder: str = "auto"
) -> DataFrame:
    """Audio decode → per-item stats via mapInPandas (Arrow batches),
    mirroring decode_image_stats' dispatch: "auto" tries the real tier
    per payload (WAV parses, anything else falls back to the stub),
    "stub"/"real" force a tier. Only audio-format rows reach Python."""
    audio = df.filter(F.col("media_meta.format").isin("wav", "mp3")).select(
        F.col(id_col).alias("doc_id"),
        F.col("media_meta.format").alias("format"),
        F.col("media_bytes"),
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = []
            for b in pdf["media_bytes"]:
                raw = bytes(b)
                if decoder == "stub":
                    stats.append(_audio_stats_stub(raw))
                elif decoder == "real":
                    stats.append(_audio_stats_real(raw))
                else:  # auto: real when the payload is a parseable WAV
                    # Catch Exception, not just NotImplementedError: a
                    # RIFF-prefixed but malformed payload raises
                    # ValueError/struct.error from _parse_wav, and a
                    # corpus-washing pipeline must degrade such bytes to
                    # the stub instead of failing the whole Spark stage.
                    try:
                        stats.append(_audio_stats_real(raw))
                    except Exception:  # noqa: BLE001
                        stats.append(_audio_stats_stub(raw))
            out = pd.DataFrame(stats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "format", pdf["format"].values)
            yield out

    return audio.mapInPandas(decode_batches, schema=AUDIO_RESULT_SCHEMA)


def _frame_energy_stub(data: bytes, frame_idx: int) -> int:
    """Deterministic fake per-frame energy in 0..65535. Same
    SQL-replayability contract as ``_frame_luma_stub`` (ASCII payload →
    byte concat == string concat), '@' separator so energies and lumas
    draw from independent hash streams: sha256(payload || '@' || idx),
    first two hex bytes big-endian."""
    h = hashlib.sha256(data + b"@" + str(int(frame_idx)).encode()).digest()
    return (h[0] << 8) | h[1]


def _frame_energy_real(data: bytes, frame_idx: int, frame_ms: int = 20) -> int:
    """Real tier: integer mean-square energy of one ``frame_ms`` window
    of a stdlib-parsed PCM16 WAV — no float anywhere, so the value is
    exact and environment-independent."""
    rate, nch, samples = _parse_wav(data)
    spf = max(rate * frame_ms // 1000, 1) * max(nch, 1)
    seg = samples[frame_idx * spf : (frame_idx + 1) * spf]
    if not seg:
        raise IndexError(f"frame {frame_idx} out of range")
    sumsq = 0
    for s in seg:
        sumsq += s * s
    return sumsq // len(seg)


ENERGY_RESULT_SCHEMA = "doc_id long, frame_idx int, energy long"


def frame_energies(
    df: DataFrame,
    n_frames,
    id_col: str = "doc_id",
    extractor: str = "auto",
    frame_ms: int = 20,
) -> DataFrame:
    """(doc_id, frame_idx, energy) for every ``frame_ms`` window of
    every audio row — the feature pass VAD segmentation consumes.
    ``n_frames`` is a Column giving the per-row frame count (derived
    from metadata for stubs, ``duration/frame_ms`` for real audio). The
    explode is JVM-side; only audio rows reach the Arrow stage."""
    # sequence(0, -1) is DESCENDING [0, -1], not empty — a 0-frame row
    # must emit no rows, not two spurious frames (round-8 ADVICE)
    audio = (
        df.filter(F.col("media_meta.format").isin("wav", "mp3"))
        .filter(n_frames.cast("int") > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            "media_bytes",
            F.explode(F.sequence(F.lit(0), n_frames.cast("int") - 1)).alias(
                "frame_idx"
            ),
        )
    )
    def one(b: bytes, i: int) -> int:
        if extractor == "real":
            return _frame_energy_real(b, i, frame_ms)
        if extractor == "stub":
            return _frame_energy_stub(b, i)
        # auto: real when the payload is a parseable WAV window, stub
        # otherwise (same degrade-don't-fail contract as
        # decode_audio_stats — malformed bytes must not kill the stage)
        try:
            return _frame_energy_real(b, i, frame_ms)
        except Exception:  # noqa: BLE001
            return _frame_energy_stub(b, i)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                one(bytes(b), int(i))
                for b, i in zip(pdf["media_bytes"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "energy": pd.Series(vals, dtype="int64"),
                }
            )

    return audio.mapInPandas(extract, schema=ENERGY_RESULT_SCHEMA)


def vad_segments(energies: DataFrame, threshold: int) -> DataFrame:
    """Energy-threshold voice-activity segmentation — the ASR-pipeline
    segmenter that turns raw audio into training utterances: maximal
    runs of consecutive frames with energy >= threshold become segments
    (gaps-and-islands: a run starts where an active frame follows an
    inactive/absent one; segment id = running count of starts). Fully
    relational and integer-exact: two windows over the same (doc_id,
    frame_idx) ordering — ONE shuffle — then a grouped aggregate.
    Input is any (doc_id, frame_idx, energy) relation (frame_energies
    output). Returns (doc_id, seg_id, start_frame, end_frame, n_frames,
    sum_energy)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    active = F.col("energy") >= threshold
    prev_active = F.lag(active.cast("int")).over(w)
    start = active & (F.coalesce(prev_active, F.lit(0)) == 0)
    seg_id = F.sum(start.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        energies.withColumn("_seg", seg_id)
        .filter(active)
        .groupBy("doc_id", F.col("_seg").alias("seg_id"))
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count("*").alias("n_frames"),
            F.sum("energy").alias("sum_energy"),
        )
    )


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    id_col: str = "doc_id",
    extractor: str = "auto",
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    The shape — filter to videos, explode sampled indices JVM-side, derive
    per-frame features in a pandas stage — is the real pipeline.
    ``extractor`` mirrors ``decode_image_stats``'s decoder dispatch:
    "auto" uses PyAV when importable, else the deterministic stub; "stub"
    forces the fake (required for synthetic payloads, e.g. the
    oracle-gated query whose bytes are hashes, not containers); "real"
    forces PyAV and raises without it.
    """
    videos = df.filter(F.col("media_meta.format").isin("mp4", "y4m")).select(
        F.col(id_col).alias("doc_id"),
        F.col("media_bytes"),
        F.col("media_meta.n_frames").alias("n_frames"),
    )
    # n_frames == 0 must emit no rows (sequence(0, -1) is [0, -1])
    sampled = videos.filter(F.col("n_frames") > 0).select(
        "doc_id",
        "media_bytes",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
    )
    use_real = HAVE_REAL_VIDEO_DECODER if extractor == "auto" else extractor == "real"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _extract_frame_real if use_real else _extract_frame_stub
        for pdf in batches:
            hashes = [
                fn(bytes(b), int(i))
                for b, i in zip(pdf["media_bytes"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "frame_idx": pdf["frame_idx"], "frame_hash": hashes}
            )

    return sampled.mapInPandas(extract, schema=FRAME_RESULT_SCHEMA)
