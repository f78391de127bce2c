"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the storage/partitioning/UDF-batching side is fully real; only the codec
calls are stubbed (no PIL/ffmpeg in this container) behind
``DecoderUnavailable`` or a deterministic fake, clearly marked.

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
    """STUB — real implementation needs PIL/opencv (absent here)."""
    raise DecoderUnavailable(
        "image decode requires PIL/opencv; not installed in this environment"
    )


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
                    px = decode_image_real(bytes(payload or b""))
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
