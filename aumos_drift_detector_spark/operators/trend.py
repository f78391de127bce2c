"""Trend analysis over drift-score history (SURVEY A13-A15, W8, F5).

These run on the RESULTS table (per-monitor score sequences) — small relative
to the fact table, but all computations are still expressed as grouped
aggregations/windows so 10^5 monitors x 10^4 points parallelize.

- OLS slope/intercept/R^2 per key (closed form from covar_pop/var_pop — one
  aggregation, no iterative fit; reference trend_analyzer.py:300-314)
- lagged cross-correlation (lag 0..k) between two series
  (trend_analyzer.py:384-423)
- autocorrelation at a period (seasonality check, trend_analyzer.py:638-669:
  seasonal iff acf(period) > 0.3 and > acf(period-1), > acf(period+1))
- linear forecast with 80% prediction interval
  (margin = 1.282 * RSE * sqrt(1 + 1/n + (x-xbar)^2/SSxx), clamp >= 0;
  trend_analyzer.py:425-510)
- contribution percentage (score / sum(score) over group, F5)
"""

from __future__ import annotations

import math
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ols_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Closed-form OLS per key: slope, intercept, r2, n — one aggregation."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*key_cols).agg(
        F.count(y).alias("n"),
        F.avg(x).alias("x_mean"),
        F.avg(y).alias("y_mean"),
        F.covar_pop(x, y).alias("sxy"),
        F.var_pop(x).alias("sxx"),
        F.var_pop(y).alias("syy"),
    )
    slope = F.try_divide(F.col("sxy"), F.col("sxx"))
    r2 = F.when(
        (F.col("sxx") > 0) & (F.col("syy") > 0),
        (F.col("sxy") ** 2) / (F.col("sxx") * F.col("syy")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        *key_cols,
        "n",
        slope.alias("slope"),
        (F.col("y_mean") - slope * F.col("x_mean")).alias("intercept"),
        r2.alias("r2"),
    )


def lagged_correlation(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    a_col: str,
    b_col: str,
    max_lag: int = 2,
) -> DataFrame:
    """corr(a, b shifted by lag) for lag 0..max_lag per key (A13).

    One window pass materializes all lags, one aggregation computes every
    correlation — not a job per lag.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    lag_cols = [F.lag(b_col, k).over(w).alias(f"_b_lag{k}") for k in range(max_lag + 1)]
    lagged = df.select(*key_cols, F.col(a_col), *lag_cols)
    aggs = [
        F.corr(a_col, f"_b_lag{k}").alias(f"corr_lag{k}") for k in range(max_lag + 1)
    ]
    return lagged.groupBy(*key_cols).agg(*aggs)


def autocorrelation(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """ACF at (period-1, period, period+1) + seasonal verdict per key (A15)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    lags = [period - 1, period, period + 1]
    lag_cols = [
        F.lag(value_col, k).over(w).alias(f"_lag{k}") for k in lags
    ]
    lagged = df.select(*key_cols, F.col(value_col), *lag_cols)
    aggs = [F.corr(value_col, f"_lag{k}").alias(f"acf_{k}") for k in lags]
    out = lagged.groupBy(*key_cols).agg(*aggs)
    p, lo, hi = f"acf_{period}", f"acf_{period-1}", f"acf_{period+1}"
    seasonal = (
        (F.col(p) > 0.3)
        & (F.col(p) > F.coalesce(F.col(lo), F.lit(-1.0)))
        & (F.col(p) > F.coalesce(F.col(hi), F.lit(-1.0)))
    )
    return out.select(*key_cols, lo, p, hi, seasonal.alias("is_seasonal"))


FORECAST_SCHEMA_TAIL = [
    T.StructField("step", T.IntegerType()),
    T.StructField("predicted", T.DoubleType()),
    T.StructField("lower_80", T.DoubleType()),
    T.StructField("upper_80", T.DoubleType()),
    T.StructField("crosses_threshold", T.BooleanType()),
]


def linear_forecast(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    horizon: int = 5,
    threshold: float | None = None,
) -> DataFrame:
    """OLS extrapolation with 80% prediction interval per key (W8).

    The per-key series is small (bounded history); each group fits and
    extrapolates inside an Arrow batch — the cross-key fan-out is the
    distributed axis. margin = z80 * RSE * sqrt(1 + 1/n + (x-xbar)^2/SSxx),
    z80 = 1.282; lower bound clamped at 0 (reference trend_analyzer.py:488).
    """
    key_fields = [df.schema[k] for k in key_cols]
    out_schema = T.StructType(key_fields + FORECAST_SCHEMA_TAIL)
    z80 = 1.282

    def forecast(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        keys = {k: pdf.iloc[0][k] for k in key_cols}
        y = pdf[value_col].astype(float).to_numpy()
        n = len(y)
        if n < 3:
            return pd.DataFrame(columns=[*key_cols, *[f.name for f in FORECAST_SCHEMA_TAIL]])
        import numpy as np

        x = np.arange(n, dtype=float)
        xbar = x.mean()
        sxx = float(((x - xbar) ** 2).sum())
        slope = float(((x - xbar) * (y - y.mean())).sum() / sxx) if sxx else 0.0
        intercept = float(y.mean() - slope * xbar)
        resid = y - (intercept + slope * x)
        rse = math.sqrt(float((resid**2).sum()) / (n - 2)) if n > 2 else 0.0
        rows = []
        for step in range(1, horizon + 1):
            xf = n - 1 + step
            pred = intercept + slope * xf
            margin = z80 * rse * math.sqrt(1.0 + 1.0 / n + (xf - xbar) ** 2 / sxx)
            lower = max(0.0, pred - margin)
            upper = pred + margin
            rows.append(
                {
                    **keys,
                    "step": step,
                    "predicted": pred,
                    "lower_80": lower,
                    "upper_80": upper,
                    "crosses_threshold": bool(
                        threshold is not None and pred > threshold
                    ),
                }
            )
        return pd.DataFrame(rows, columns=[*key_cols, *[f.name for f in FORECAST_SCHEMA_TAIL]])

    return (
        df.select(*key_cols, order_col, value_col)
        .groupBy(*key_cols)
        .applyInPandas(forecast, out_schema)
    )


def contribution_pct(
    df: DataFrame, group_cols: Sequence[str], score_col: str
) -> DataFrame:
    """score / sum(score) within group (F5, feature_importance.py:290,311)."""
    w = Window.partitionBy(*group_cols)
    return df.withColumn(
        "contribution_pct",
        F.try_divide(F.col(score_col), F.sum(score_col).over(w)),
    )


def drift_rate(
    df: DataFrame, group_cols: Sequence[str], drifted_col: str = "is_drifted"
) -> DataFrame:
    """Fraction of drifted observations per group (A17)."""
    return df.groupBy(*group_cols).agg(
        F.avg(F.col(drifted_col).cast("double")).alias("drift_rate"),
        F.count(F.lit(1)).alias("n_checks"),
    )
