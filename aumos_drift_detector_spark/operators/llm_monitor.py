"""LLM output monitoring: text -> embedding -> MMD drift (reference GAP-168).

Spark-first restatement of reference adapters/llm_output_monitor.py:21-99 +
its embedding_client: the embedder is a pluggable BATCH function
``(list[str]) -> ndarray (n, dim)`` executed inside ``mapInPandas`` — Arrow
batches of text go in, embedding arrays come out, fully parallel across
partitions. Any local model callable this way plugs in (sentence
transformers, ONNX, an HTTP client looping over the batch); the default is a
deterministic hash-projection embedder — an honest stand-in (this sandbox has
no embedding model) whose statistical role matches: identical texts map to
identical vectors, token-overlapping texts to nearby vectors, so MMD sees
real distribution shift when the text distribution shifts.

The MMD half is ``operators/mmd.mmd_test`` (seeded subsample cap 1000,
median-heuristic bandwidth — reference mmd.py:56-59 caps at 500).
"""

from __future__ import annotations

import zlib
from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.mmd import mmd_test

Embedder = Callable[[list[str]], "np.ndarray"]


def hash_projection_embedder(dim: int = 64, seed: int = 42) -> Embedder:
    """Deterministic batch embedder: token-hash bag-of-words -> random
    projection -> L2 normalize.

    A real embedding model is not available in this environment; this
    preserves the geometry the monitor needs (shared tokens => nearby
    vectors) with zero dependencies. Swap in any ``(texts) -> (n, dim)``
    callable for production.
    """
    rng = np.random.default_rng(seed)
    n_buckets = 1024
    proj = rng.normal(size=(n_buckets, dim)) / np.sqrt(dim)

    def embed(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            counts = np.zeros(n_buckets)
            for tok in (t or "").lower().split():
                # crc32, NOT builtin hash(): hash() is salted per Python
                # process (PYTHONHASHSEED), so on a multi-executor cluster
                # identical tokens would land in different buckets across
                # workers and MMD would report spurious drift
                counts[zlib.crc32(tok.encode("utf-8")) % n_buckets] += 1.0
            v = counts @ proj
            norm = float(np.linalg.norm(v))
            out[i] = v / norm if norm > 0 else v
        return out

    return embed


def embed_text_column(
    df: DataFrame,
    text_col: str,
    embedder: Embedder | None = None,
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """Append an ``array<double>`` embedding column via Arrow-batched
    mapInPandas (the engine-side analogue of the reference's async
    embedding_client.embed loop — but distributed and batched)."""
    emb = embedder or hash_projection_embedder(dim)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = emb(pdf[text_col].fillna("").astype(str).tolist())
            pdf = pdf.copy()
            pdf[out_col] = list(np.asarray(vecs, dtype=np.float64))
            yield pdf

    return df.mapInPandas(run, out_schema)


class LLMOutputMonitor:
    """Semantic-drift monitor over LLM output DataFrames.

    Mirrors the reference class (llm_output_monitor.py:22-99): embeds both
    text populations, runs MMD², returns the same result dict shape
    (test / drift_detected / mmd_squared / counts, empty-input short-circuit).
    """

    def __init__(
        self,
        embedder: Embedder | None = None,
        mmd_threshold: float = 0.05,
        dim: int = 64,
    ) -> None:
        self._embedder = embedder or hash_projection_embedder(dim)
        self._dim = dim
        self._threshold = mmd_threshold

    def detect(
        self,
        reference_df: DataFrame,
        production_df: DataFrame,
        text_col: str = "text",
    ) -> dict[str, Any]:
        n_ref = reference_df.count()
        n_prod = production_df.count()
        if n_ref == 0 or n_prod == 0:
            return {
                "test": "llm_output_mmd",
                "drift_detected": False,
                "mmd_squared": 0.0,
                "reason": "empty_inputs",
            }
        ref_emb = embed_text_column(reference_df, text_col, self._embedder, self._dim)
        prod_emb = embed_text_column(production_df, text_col, self._embedder, self._dim)
        verdict = mmd_test(ref_emb, prod_emb, "embedding", self._threshold)
        return {
            "test": "llm_output_mmd",
            "drift_detected": bool(verdict.is_drifted),
            "mmd_squared": float(verdict.score),
            "threshold": float(verdict.threshold),
            "n_reference_texts": int(n_ref),
            "n_production_texts": int(n_prod),
            "bandwidth": verdict.details.get("bandwidth"),
            "embedding_dim": verdict.details.get("embedding_dim"),
        }
