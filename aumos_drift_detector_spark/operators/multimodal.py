"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the storage/partitioning/UDF-batching side is fully real. Codec coverage is
split honestly:

- REAL decoders (pure stdlib/numpy, fully tested end-to-end): PNG (8-bit
  gray/RGB/palette/RGBA, filters 0-4, zlib inflate — RFC 2083), baseline
  JPEG (T.81 sequential DCT — see jpeg.py), PPM (P6) and uncompressed
  24-bit BMP images; PCM WAV audio (via the stdlib ``wave`` module) with
  RMS / zero-crossing / duration features and nearest-neighbour resize.
- Codecs needing external libraries (progressive JPEG, h264, mp3) raise
  ``DecoderUnavailable`` — PIL/ffmpeg are not in this container; swapping
  them in changes ONLY the inner decode call, never the distributed plan.
- A sha256-seeded deterministic fake decoder remains for tests that need
  stable "pixels" from arbitrary payloads.

Schema convention:
  media (doc_id string, kind string /* image|audio|video */,
         payload binary, meta struct<width:int, height:int, sample_rate:int,
         n_frames:int, codec:string>)

All transforms are ``mapInPandas`` — Arrow batches in, Arrow batches out —
so swapping the fake decoder for a real one changes ONLY the inner function,
not the distributed plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decode path: codec libraries are not in this container."""


def decode_image_real(payload: bytes) -> np.ndarray:
    """Decode a REAL image payload to (h, w, 3) uint8.

    Dispatches on magic bytes: binary PPM (P6), uncompressed 24-bit BMP,
    PNG (stdlib zlib + filter reversal below), and baseline JPEG (the
    pure-numpy T.81 codec in jpeg.py). Other formats raise
    ``DecoderUnavailable`` — their codecs are not in this container.
    """
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    if payload[:8] == _PNG_SIGNATURE:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg  # deferred: jpeg.py imports this module

        return decode_jpeg(payload)
    raise DecoderUnavailable(
        "only PPM(P6)/BMP24/PNG/baseline-JPEG decode in-container"
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): header 'P6 <w> <h> <maxval>' then raw RGB bytes."""
    # header tokens may be separated by arbitrary whitespace/comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise DecoderUnavailable("only 8-bit PPM supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield (type, data) for each PNG chunk (layout per RFC 2083 §3.2)."""
    import struct

    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        yield ctype, payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def _decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + per-row filter reversal).

    Supports the common non-interlaced 8-bit-depth color types: grayscale
    (0), RGB (2), palette (3), gray+alpha (4), RGBA (6); filter types 0-4
    per RFC 2083 §6. Adam7 interlace and bit depths != 8 raise
    ``DecoderUnavailable`` (rare in training corpora; a PIL swap-in covers
    them without touching the distributed plan). Output is (h, w, 3) uint8
    — palette expanded, gray broadcast, alpha dropped — matching the
    PPM/BMP decoders.
    """
    import struct
    import zlib

    ihdr = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            if len(data) < 13:
                raise DecoderUnavailable("truncated PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            if len(data) == 0 or len(data) % 3:
                raise DecoderUnavailable("malformed PNG PLTE chunk length")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise DecoderUnavailable("PNG missing IHDR/IDAT chunks")
    w, h, depth, color, compression, filter_method, interlace = ihdr
    if depth != 8 or compression != 0 or filter_method != 0 or interlace != 0:
        raise DecoderUnavailable(
            "only 8-bit non-interlaced PNG supported in-container"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise DecoderUnavailable(f"unknown PNG color type {color}")
    if color == 3 and palette is None:
        raise DecoderUnavailable("palette PNG without PLTE chunk")

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise DecoderUnavailable(f"corrupt PNG IDAT stream: {exc}") from exc
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise DecoderUnavailable("PNG IDAT shorter than h x (stride + 1)")
    bpp = channels  # bytes per pixel at depth 8
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = row.astype(np.int32)
        elif ftype == 2:  # Up
            cur = (row.astype(np.int32) + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in-row
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:  # Paeth predictor (RFC 2083 §6.6)
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                cur[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise DecoderUnavailable(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    px = out.reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 3:
        if int(px[:, :, 0].max(initial=0)) >= len(palette):
            raise DecoderUnavailable("PNG palette index beyond PLTE length")
        return palette[px[:, :, 0]]
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA -> RGB


def encode_png(
    img: np.ndarray, filter_type: int | str = 0, color: str = "rgb"
) -> bytes:
    """Minimal PNG encoder (test/round-trip companion to ``_decode_png``).

    ``filter_type``: a fixed per-row filter 0-4, or ``"mixed"`` to cycle
    through all five (exercises every reversal branch). ``color``: "rgb"
    for (h, w, 3) input, "gray" for (h, w). Standard chunk layout with
    zlib CRCs — public-knowledge RFC 2083 structure, no codec deps.
    """
    import struct
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if color == "gray":
        h, w = img.shape
        channels, ctype = 1, 0
        flat = img.reshape(h, w)
    else:
        h, w, _ = img.shape
        channels, ctype = 3, 2
        flat = img.reshape(h, w * 3)
    stride = w * channels
    bpp = channels

    def forward_filter(ft: int, row: np.ndarray, prev: np.ndarray) -> np.ndarray:
        row32 = row.astype(np.int32)
        out = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = int(row32[i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[i] = (int(row32[i]) - pred) & 0xFF
        return out.astype(np.uint8)

    scan = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        row = flat[y]
        scan.append(ft)
        scan += forward_filter(ft, row, prev).tobytes()
        prev = row.astype(np.int32)

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype_b
            + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def _decode_bmp24(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP: bottom-up rows, 4-byte padded, BGR order."""
    import struct

    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise DecoderUnavailable("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rows = rows[::-1] if flip else rows        # bottom-up storage
    return rows[:, :, ::-1].copy()             # BGR -> RGB


def decode_audio_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float64 samples in [-1, 1] per channel-mean, sample_rate).

    Pure stdlib ``wave`` decode — a REAL audio path, no fake.
    """
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise DecoderUnavailable("only 8/16-bit PCM WAV supported")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def resize_nearest(px: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize of (h, w, c) — pure-numpy index gather."""
    h, w = px.shape[:2]
    oh, ow = out_hw
    ri = (np.arange(oh) * (h / oh)).astype(np.int64)
    ci = (np.arange(ow) * (w / ow)).astype(np.int64)
    return px[ri][:, ci]


def _fake_decode(payload: bytes, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic fake decoder: payload bytes -> pseudo-pixel block.

    sha256-seeded so tests get stable 'pixels' from stable payloads; keeps
    batch shapes, dtypes, and downstream feature math real.
    """
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    use_fake_decoder: bool = True,
    resize_to: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode -> resize -> channel-mean feature per media row (mapInPandas).

    The Arrow batch shape, schema, and partition behavior are production-
    real; only the decode call is faked (flagged by ``use_fake_decoder``).
    """
    h, w = resize_to

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                if use_fake_decoder:
                    px = _fake_decode(bytes(payload or b""), h, w)
                else:
                    px = resize_nearest(
                        decode_image_real(bytes(payload or b"")), (h, w)
                    )
                flat = px.astype(np.float32) / 255.0
                rows.append(
                    (
                        doc_id,
                        kind,
                        float(flat.mean()),
                        float(flat.std()),
                        flat.mean(axis=(0, 1)).tolist(),  # per-channel mean
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "feat_mean", "feat_std", "feature"]
            )

    return df.select("doc_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL WAV decode -> RMS / zero-crossing / duration per audio row.

    ``mapInPandas`` over the binary payload column — the same Arrow-batch
    shape as the image path, with an actual stdlib PCM decoder inside.
    Non-WAV payloads raise ``DecoderUnavailable`` (fail the task loudly
    rather than emit silent garbage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x, rate = decode_audio_wav(bytes(payload or b""))
                n = int(x.size)
                zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
                rows.append(
                    (
                        doc_id,
                        int(rate),
                        n,
                        n / rate if rate else 0.0,
                        float(np.sqrt(np.mean(x**2))) if n else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples",
                    "duration_sec", "rms", "zero_crossing_rate",
                ],
            )

    return (
        df.where(F.col("kind") == "audio")
        .select("doc_id", "payload")
        .mapInPandas(run, AUDIO_FEATURE_SCHEMA)
    )


def synth_ppm(w: int, h: int, seed: int) -> bytes:
    """A REAL binary PPM payload (deterministic pixels) for tests."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def synth_wav(freq_hz: float, duration_sec: float, rate: int, seed: int = 0) -> bytes:
    """A REAL 16-bit PCM WAV payload (sine + seeded noise) for tests."""
    import io
    import wave

    t = np.arange(int(rate * duration_sec)) / rate
    rng = np.random.default_rng(seed)
    x = 0.5 * np.sin(2 * np.pi * freq_hz * t) + 0.01 * rng.normal(size=t.size)
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame index.

    Pure metadata expansion (no decode): explodes ``sequence(0, n_frames-1,
    every_n)`` so downstream decode UDFs parallelize per frame. Real frame
    extraction would replace the payload passthrough with an ffmpeg seek.
    """
    return (
        df.where(F.col("kind") == "video")
        .select(
            "doc_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synth_media_table(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                (
                    64 if kind == "image" else None,
                    64 if kind == "image" else None,
                    16000 if kind == "audio" else None,
                    300 if kind == "video" else None,
                    {"image": "png", "audio": "wav", "video": "h264"}[kind],
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
