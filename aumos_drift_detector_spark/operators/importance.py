"""Feature-importance proxies for drift explanation (SURVEY F3-F5).

- SHAP proxy: |mean shift| / pooled_std + 0.5*|ln(std ratio)| — pure column
  math over two baseline sketch row sets (reference
  feature_importance.py:195-209); already exposed as
  ``baseline.compare_baselines.cohens_d_proxy``; this module adds the
  ranked multi-feature view.
- LIME weight: seeded Gaussian-kernel-weighted neighbourhood mean around the
  production centroid vs the reference mean, / production std (reference
  feature_importance.py:218-265 — seed 42, neighbourhood 50). The
  neighbourhood draw is tiny by construction, so it runs on a seeded
  distributed sample collected to the driver; the means/stds feeding it are
  distributed aggregates.
- Ranking + contribution: row_number over combined score; score / sum(score).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.profile import clean_values


def lime_weights(
    ref_df: DataFrame,
    prod_df: DataFrame,
    columns: Sequence[str],
    neighbourhood_size: int = 50,
    seed: int = 42,
) -> dict[str, float]:
    """Per-feature LIME drift weight (reference semantics incl. seed).

    One aggregation computes every feature's means/stds; per feature a
    seeded sample of `neighbourhood_size` production values collects to the
    driver (50 floats), then the kernel-weighted mean formula applies.
    """
    # distributed stats pass: one agg per side covering all features
    def stats(df: DataFrame) -> dict[str, tuple[float, float, int]]:
        aggs = []
        for c in columns:
            v = F.col(c).cast("double")
            good = F.when(~F.isnan(v) & v.isNotNull(), v)
            aggs += [
                F.avg(good).alias(f"{c}__mean"),
                F.stddev_pop(good).alias(f"{c}__std"),
                F.count(good).alias(f"{c}__n"),
            ]
        row = df.agg(*aggs).collect()[0]
        return {
            c: (row[f"{c}__mean"], row[f"{c}__std"], row[f"{c}__n"]) for c in columns
        }

    ref_stats = stats(ref_df)
    prod_stats = stats(prod_df)

    # ONE sampling pass for every feature (previously one collect job per
    # feature, serialized — N features meant N Spark jobs). Per feature the
    # projection keeps the value only when its seeded hash bucket samples it;
    # rows where no feature sampled are filtered out, so the collect is
    # ~features x 20*neighbourhood floats.
    # Hash-based sampling stays deterministic BY VALUE regardless of
    # partitioning/row order (df.sample isn't reproducible across re-uploads
    # of local data); sorted pool -> stable rng.choice. (Reference draws from
    # the full array with rng(42); the seeded distributed sample plays the
    # same statistical role — documented deviation since a full collect is
    # not scale-safe.)
    sample_cols = []
    sampled_features = []
    for c in columns:
        p_n = prod_stats[c][2] or 0
        if p_n < 2:
            continue
        sampled_features.append(c)
        v = F.col(c).cast("double")
        finite = v.isNotNull() & ~F.isnan(v) & (F.abs(v) != float("inf"))
        frac = min(1.0, (neighbourhood_size * 20) / max(p_n, 1))
        bucket = F.pmod(F.xxhash64(v, F.lit(seed)), F.lit(10_000))
        sample_cols.append(
            F.when(finite & (bucket < int(frac * 10_000)), v).alias(c)
        )
    pools: dict[str, np.ndarray] = {c: np.array([]) for c in columns}
    if sampled_features:
        keep_any = sample_cols[0].isNotNull()
        for sc in sample_cols[1:]:
            keep_any = keep_any | sc.isNotNull()
        pdf = prod_df.select(*sample_cols).where(keep_any).toPandas()
        for c in sampled_features:
            pools[c] = np.sort(pdf[c].dropna().to_numpy(dtype=np.float64))

    weights: dict[str, float] = {}
    for c in columns:
        r_mean, _, r_n = ref_stats[c]
        p_mean, p_std, p_n = prod_stats[c]
        pool = pools[c]
        if (r_n or 0) < 2 or (p_n or 0) < 2 or pool.size < 2:
            weights[c] = 0.0
            continue
        p_std = float(p_std) or 1.0
        rng = np.random.default_rng(seed)
        k = min(neighbourhood_size, pool.size)
        neighbourhood = rng.choice(pool, size=k, replace=False)
        kernel = np.exp(-0.5 * ((neighbourhood - float(p_mean)) / p_std) ** 2)
        weighted_mean = float(np.average(neighbourhood, weights=kernel))
        weights[c] = abs(weighted_mean - float(r_mean)) / p_std
    return weights


def rank_features(scores_df: DataFrame, score_col: str = "score") -> DataFrame:
    """Rank 1..n by descending score + contribution pct (F5, W3)."""
    w = Window.orderBy(F.desc(score_col))
    total = Window.partitionBy()
    return scores_df.select(
        "*",
        F.row_number().over(w).alias("rank"),
        F.try_divide(F.col(score_col), F.sum(score_col).over(total)).alias(
            "contribution_pct"
        ),
    )
