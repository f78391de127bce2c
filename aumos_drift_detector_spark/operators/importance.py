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


def _hash_sample_pools(
    df: DataFrame,
    columns: Sequence[str],
    n_rows: dict[str, int],
    target_per_feature: int,
    seed: int,
) -> dict[str, np.ndarray]:
    """ONE seeded sampling job over every feature at once.

    Per feature the projection keeps the value only when its seeded hash
    bucket samples it; rows where no feature sampled are filtered, so the
    collect is ~features x target floats. Hash-based sampling is
    deterministic BY VALUE regardless of partitioning/row order; the sorted
    pool makes downstream ``rng.choice`` stable.
    """
    sample_cols = []
    for c in columns:
        v = F.col(c).cast("double")
        finite = v.isNotNull() & ~F.isnan(v) & (F.abs(v) != float("inf"))
        frac = min(1.0, target_per_feature / max(n_rows.get(c, 0), 1))
        bucket = F.pmod(F.xxhash64(v, F.lit(seed)), F.lit(10_000))
        sample_cols.append(
            F.when(finite & (bucket < int(frac * 10_000)), v).alias(c)
        )
    if not sample_cols:
        return {}
    keep_any = sample_cols[0].isNotNull()
    for sc in sample_cols[1:]:
        keep_any = keep_any | sc.isNotNull()
    pdf = df.select(*sample_cols).where(keep_any).toPandas()
    return {
        c: np.sort(pdf[c].dropna().to_numpy(dtype=np.float64)) for c in columns
    }


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
    pools = _hash_sample_pools(
        prod_df,
        [c for c in columns if (prod_stats[c][2] or 0) >= 2],
        {c: prod_stats[c][2] or 0 for c in columns},
        neighbourhood_size * 20,
        seed,
    )
    pools = {**{c: np.array([]) for c in columns}, **pools}

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


def beeswarm_data(
    ref_df: DataFrame,
    prod_df: DataFrame,
    columns: Sequence[str],
    importance_weights: dict[str, float],
    samples_per_feature: int = 100,
    seed: int = 42,
) -> dict[str, list[dict[str, float]]]:
    """Sample-level beeswarm scatter payload (feature_importance.py:399-455).

    Per production sample: shap ~= importance_weight * (value - ref_mean) /
    ref_std. ONE aggregation computes every feature's reference stats and ONE
    seeded sampling job draws every feature's pool (the reference loops a
    full in-memory array per feature). Deviation: the reference seeds each
    feature's rng with builtin ``hash(feature_name)`` — salted per process,
    irreproducible — so we derive the per-feature seed from crc32 instead.
    """
    import zlib

    aggs = []
    for c in columns:
        v = F.col(c).cast("double")
        good = F.when(~F.isnan(v) & v.isNotNull(), v)
        aggs += [
            F.avg(good).alias(f"{c}__mean"),
            F.stddev_pop(good).alias(f"{c}__std"),
        ]
    ref_row = ref_df.agg(*aggs).collect()[0]
    n_rows = {
        c: n
        for c, n in zip(
            columns,
            prod_df.agg(
                *[F.count(F.col(c).cast("double")).alias(c) for c in columns]
            ).collect()[0],
        )
    }
    pools = _hash_sample_pools(
        prod_df, list(columns), n_rows, samples_per_feature * 4, seed
    )
    out: dict[str, list[dict[str, float]]] = {}
    for c in columns:
        if c not in importance_weights:
            continue
        pool = pools.get(c, np.array([]))
        if pool.size == 0:
            out[c] = []
            continue
        rng = np.random.default_rng(zlib.crc32(c.encode("utf-8")) % (2**31))
        k = min(samples_per_feature, pool.size)
        sampled = rng.choice(pool, size=k, replace=False)
        ref_mean = float(ref_row[f"{c}__mean"] or 0.0)
        ref_std = float(ref_row[f"{c}__std"] or 0.0) or 1.0
        w = float(importance_weights[c])
        out[c] = [
            {
                "value": float(s),
                "shap_value": w * (float(s) - ref_mean) / ref_std,
            }
            for s in sampled
        ]
    return out


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
