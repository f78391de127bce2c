"""MMD^2 drift test over embedding columns (SURVEY T8).

The unbiased RBF-kernel U-statistic is O(n^2), so the reference already
subsamples (mmd.py:56-59 caps the median heuristic at 500 points, seed 42).
Our Spark design keeps that contract: a seeded distributed ``df.sample`` +
cap bounds each side, the sampled matrices (<= cap x dim floats) collect to
the driver, and the kernel math runs vectorized in numpy — the same
"aggregate to a sketch, finalize small" architecture as the histogram tests.
For larger caps the kernel-block path would be a crossJoin over row blocks;
not needed while cap <= a few thousand.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aumos_drift_detector_spark.functions.kernels import DriftVerdict

MEDIAN_HEURISTIC_CAP = 500


def _collect_sample(df: DataFrame, column: str, cap: int, seed: int) -> np.ndarray:
    n = df.count()
    if n > cap:
        frac = min(1.0, cap * 1.2 / n)
        df = df.sample(fraction=frac, seed=seed).limit(cap)
    rows = df.select(column).collect()
    return np.asarray([r[0] for r in rows], dtype=float)


def _rbf_block(x: np.ndarray, y: np.ndarray, bandwidth: float) -> np.ndarray:
    sq = ((x[:, None, :] - y[None, :, :]) ** 2).sum(axis=-1)
    return np.exp(-sq / (2.0 * bandwidth))


def median_bandwidth(x: np.ndarray, y: np.ndarray, seed: int = 42) -> float:
    """Median heuristic sigma^2 over combined pairwise squared distances,
    subsampled to MEDIAN_HEURISTIC_CAP points (reference mmd.py:41-64)."""
    combined = np.vstack([x, y])
    if len(combined) > MEDIAN_HEURISTIC_CAP:
        rng = np.random.default_rng(seed)
        combined = combined[rng.choice(len(combined), MEDIAN_HEURISTIC_CAP, replace=False)]
    sq = ((combined[:, None, :] - combined[None, :, :]) ** 2).sum(axis=-1)
    positive = sq[sq > 0]
    med = float(np.median(positive)) if positive.size else 1e-6
    return max(med, 1e-6)


def mmd_test(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str = "embedding",
    threshold: float = 0.05,
    bandwidth: float | None = None,
    sample_cap: int = 1000,
    seed: int = 42,
) -> DriftVerdict:
    """Unbiased MMD^2 between two embedding populations.

    MMD^2 = sum K_XX / (n(n-1)) + sum K_YY / (m(m-1)) - 2 mean(K_XY)
    with RBF kernel, diagonals excluded (reference mmd.py:100-110).
    Drift iff MMD^2 > threshold.
    """
    x = _collect_sample(ref_df, column, sample_cap, seed)
    y = _collect_sample(prod_df, column, sample_cap, seed + 1)
    if x.ndim == 1:
        x = x.reshape(-1, 1)
    if y.ndim == 1:
        y = y.reshape(-1, 1)
    if len(x) < 2 or len(y) < 2:
        raise ValueError("MMD requires at least 2 samples per side")
    bw = bandwidth if bandwidth is not None else median_bandwidth(x, y, seed)
    n, m = len(x), len(y)
    k_xx = _rbf_block(x, x, bw)
    k_yy = _rbf_block(y, y, bw)
    k_xy = _rbf_block(x, y, bw)
    np.fill_diagonal(k_xx, 0.0)
    np.fill_diagonal(k_yy, 0.0)
    mmd_sq = float(
        k_xx.sum() / (n * (n - 1)) + k_yy.sum() / (m * (m - 1)) - 2.0 * k_xy.mean()
    )
    return DriftVerdict(
        test="mmd",
        score=mmd_sq,
        threshold=threshold,
        is_drifted=bool(mmd_sq > threshold),
        reference_size=n,
        production_size=m,
        feature_name=column,
        details={"bandwidth": bw, "embedding_dim": int(x.shape[1])},
    )
