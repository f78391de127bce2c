"""Label-free performance estimation: CBPE and DLE (reference GAP-165).

Spark-first restatement of the reference's sklearn-backed estimators
(reference adapters/cbpe.py:20-137, adapters/dle.py:21-159):

- **CBPE** estimates accuracy-style metrics on unlabeled production data by
  calibrating P(prediction correct | confidence) on a labeled reference set.
  The distributed shape: one aggregation collapses the reference rows to a
  ``(confidence, n_correct, n_total)`` sketch (confidence rounded to
  ``CONF_DECIMALS`` so the sketch is bounded at <=10^6 rows regardless of
  input size), then the calibrator — isotonic PAV or Platt sigmoid — fits
  driver-side on the sketch. Estimation is again one aggregation (production
  confidence sketch) + a driver-side map through the calibrator. No sklearn:
  PAV and Platt are implemented here from the published algorithms
  (Barlow et al. 1972; Platt 1999 incl. the target-smoothing prior sklearn
  uses).
- **DLE** trains a gradient-boosted regressor from features to per-sample
  loss on the labeled reference (pyspark.ml GBTRegressor — distributed
  histogram-based boosting, the Spark analogue of sklearn's
  GradientBoostingRegressor at reference dle.py:85-90), then estimates
  aggregate loss on production as mean/std of the predicted per-row losses.

Both mirror the reference's result dict SHAPES exactly (keys, method tags,
bootstrap CI for CBPE with rng seed 42 / 200 resamples, cbpe.py:115-119);
the CI values are statistically equivalent rather than bit-equal — the
resampled array is expanded in sketch (ascending-confidence) order, not the
reference's row order (documented deviation).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONF_DECIMALS = 6          # sketch key rounding: <=10^6 distinct confidences
BOOTSTRAP_ITERS = 200      # reference cbpe.py:117
BOOTSTRAP_SEED = 42        # reference cbpe.py:115
# below this row count the bootstrap replays the reference's per-index
# rng(42) resampling over the expanded array (sketch-ordered — see
# estimate()); above it the bootstrap resamples the bounded confidence
# sketch (multinomial) instead — statistically identical, scale-safe
BOOTSTRAP_EXACT_CAP = 100_000


def _confidence_correct(df: DataFrame, probs_col: str, label_col: str | None):
    """(confidence, correct?) projection: max class prob + argmax==label.

    NULL/empty probability rows are dropped here: array_max yields NULL for
    them, and a NaN confidence key would silently poison the sketch sort
    feeding PAV/Platt (np.interp requires increasing xp; Newton gradients go
    NaN) — every calibrated output would become NaN with no error.
    """
    probs = F.col(probs_col)
    df = df.where(probs.isNotNull() & (F.size(probs) > 0))
    conf = F.round(F.array_max(probs), CONF_DECIMALS).alias("conf")
    if label_col is None:
        return df.select(conf)
    # argmax via array_position of the max (1-indexed); ties: first max wins,
    # matching numpy argmax on the reference side
    pred = (F.array_position(probs, F.array_max(probs)) - 1).cast("int")
    correct = (pred == F.col(label_col).cast("int")).cast("int").alias("correct")
    return df.select(conf, correct)


def _pav_isotonic(x: np.ndarray, y_sum: np.ndarray, w: np.ndarray):
    """Weighted pool-adjacent-violators: increasing fit of y_sum/w over x.

    Inputs are the per-distinct-confidence sketch (x ascending). Returns the
    fitted value per input point; prediction interpolates linearly between
    points and clips at the ends (sklearn IsotonicRegression out_of_bounds=
    'clip' semantics, which CalibratedClassifierCV uses).
    """
    # blocks as (total_y, total_w) with running merge while decreasing
    vals: list[float] = []
    ws: list[float] = []
    counts: list[int] = []
    for i in range(len(x)):
        vals.append(float(y_sum[i]))
        ws.append(float(w[i]))
        counts.append(1)
        while len(vals) > 1 and vals[-2] * ws[-1] >= vals[-1] * ws[-2]:
            # means violate monotonicity (prev_mean >= cur_mean): pool
            vals[-2] += vals[-1]
            ws[-2] += ws[-1]
            counts[-2] += counts[-1]
            vals.pop(); ws.pop(); counts.pop()
    out = np.empty(len(x), dtype=np.float64)
    pos = 0
    for v, wt, c in zip(vals, ws, counts):
        out[pos : pos + c] = v / wt
        pos += c
    return out


def _platt_sigmoid(x: np.ndarray, y_sum: np.ndarray, w: np.ndarray):
    """Platt scaling on the weighted sketch: P(y=1|x) = 1/(1+exp(a*x+b)).

    Newton-Raphson on the smoothed targets sklearn's _SigmoidCalibration
    uses (t+ = (N+ + 1)/(N+ + 2), t- = 1/(N- + 2)) — Platt 1999 §2.2.
    """
    n_pos = float(y_sum.sum())
    n_neg = float(w.sum() - n_pos)
    t = y_sum / w  # per-bin empirical correctness rate
    hi = (n_pos + 1.0) / (n_pos + 2.0)
    lo = 1.0 / (n_neg + 2.0)
    # per-sample smoothed targets (positives->hi, negatives->lo) average to
    # this per-bin blend; cross-entropy is linear in the target, so binning
    # is exact
    target = t * hi + (1.0 - t) * lo
    a, b = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
    for _ in range(100):
        z = a * x + b
        p = 1.0 / (1.0 + np.exp(z))
        g = target - p            # dNLL/dz per unit weight (p = sigma(-z))
        grad_a = float(np.sum(w * g * x))
        grad_b = float(np.sum(w * g))
        h = p * (1.0 - p)
        h_aa = float(np.sum(w * h * x * x)) + 1e-12
        h_ab = float(np.sum(w * h * x))
        h_bb = float(np.sum(w * h)) + 1e-12
        det = h_aa * h_bb - h_ab * h_ab
        if abs(det) < 1e-18:
            break
        da = (h_bb * grad_a - h_ab * grad_b) / det
        db = (h_aa * grad_b - h_ab * grad_a) / det
        a -= da
        b -= db
        if abs(da) < 1e-12 and abs(db) < 1e-12:
            break
    return a, b


class CBPEEstimator:
    """Confidence-Based Performance Estimation on Spark DataFrames.

    Mirrors reference adapters/cbpe.py:20-137 (fit on labeled reference,
    estimate on unlabeled production, 95% bootstrap CI with seed 42 / 200
    iters). ``metric`` is echoed in the result exactly as the reference does
    (its estimate is the calibrated expected-correctness mean regardless of
    the chosen metric name — cbpe.py:110-111).
    """

    def __init__(
        self,
        metric: str = "accuracy",
        calibration_method: str = "isotonic",
    ) -> None:
        if calibration_method not in ("isotonic", "sigmoid"):
            raise ValueError("calibration_method must be 'isotonic' or 'sigmoid'")
        self._metric = metric
        self._method = calibration_method
        self._fitted = False
        self._iso_x: np.ndarray | None = None
        self._iso_y: np.ndarray | None = None
        self._sig_ab: tuple[float, float] | None = None

    def fit(
        self,
        reference_df: DataFrame,
        probs_col: str = "probabilities",
        label_col: str = "label",
    ) -> "CBPEEstimator":
        sketch = (
            _confidence_correct(reference_df, probs_col, label_col)
            .groupBy("conf")
            .agg(
                F.sum("correct").alias("n_correct"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("conf")
            .toPandas()
        )
        if sketch.empty:
            raise ValueError("reference data must not be empty")
        x = sketch["conf"].to_numpy(dtype=np.float64)
        y = sketch["n_correct"].to_numpy(dtype=np.float64)
        w = sketch["n"].to_numpy(dtype=np.float64)
        if self._method == "isotonic":
            self._iso_x = x
            self._iso_y = _pav_isotonic(x, y, w)
        else:
            self._sig_ab = _platt_sigmoid(x, y, w)
        self._fitted = True
        return self

    def _calibrate(self, conf: np.ndarray) -> np.ndarray:
        if self._method == "isotonic":
            return np.interp(conf, self._iso_x, self._iso_y)  # clips at ends
        a, b = self._sig_ab
        return 1.0 / (1.0 + np.exp(a * conf + b))

    def estimate(
        self,
        production_df: DataFrame,
        probs_col: str = "probabilities",
    ) -> dict[str, Any]:
        if not self._fitted:
            raise RuntimeError("Call fit() before estimate()")
        sketch = (
            _confidence_correct(production_df, probs_col, None)
            .groupBy("conf")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("conf")
            .toPandas()
        )
        n_samples = int(sketch["n"].sum()) if not sketch.empty else 0
        if n_samples == 0:
            raise ValueError("production data must not be empty")
        conf = sketch["conf"].to_numpy(dtype=np.float64)
        cnt = sketch["n"].to_numpy(dtype=np.int64)
        cal = self._calibrate(conf)
        estimated = float(np.average(cal, weights=cnt))

        rng = np.random.default_rng(BOOTSTRAP_SEED)
        boots = np.empty(BOOTSTRAP_ITERS, dtype=np.float64)
        if n_samples <= BOOTSTRAP_EXACT_CAP:
            # reference-SHAPED replay (cbpe.py:113-119): per-index resampling
            # of the expanded calibrated-probability array. NOT value-exact
            # vs the reference: our expansion is ordered by ascending
            # confidence (the sketch sort) while the reference resamples in
            # original row order, so the same rng(42) index draws select a
            # different multiset — the CI is statistically equivalent
            # (documented deviation; identical estimator, same iteration
            # count/seeded generator, distribution-identical resamples)
            expanded = np.repeat(cal, cnt)
            for i in range(BOOTSTRAP_ITERS):
                idx = rng.integers(0, n_samples, size=n_samples)
                boots[i] = float(expanded[idx].mean())
        else:
            # scale path: multinomial resampling of the bounded sketch —
            # identical sampling distribution, no O(n) expansion
            p = cnt / n_samples
            for i in range(BOOTSTRAP_ITERS):
                draw = rng.multinomial(n_samples, p)
                boots[i] = float(np.dot(draw, cal) / n_samples)
        lower = float(np.percentile(boots, 2.5))
        upper = float(np.percentile(boots, 97.5))
        return {
            "metric": self._metric,
            "estimated_value": estimated,
            "confidence_interval_95": {"lower": lower, "upper": upper},
            "n_samples": n_samples,
            "method": "cbpe",
        }


# ---------------------------------------------------------------------------
# DLE
# ---------------------------------------------------------------------------

def _per_sample_loss(loss_function: str, probs_col: str, label_col: str):
    """Column expression for the reference's per-sample loss (dle.py:134-159)."""
    probs = F.col(probs_col)
    label = F.col(label_col).cast("int")
    if loss_function == "log_loss":
        p_true = F.element_at(probs, label + 1)  # 1-indexed
        clipped = F.least(F.greatest(p_true, F.lit(1e-7)), F.lit(1 - 1e-7))
        return -F.log(clipped)
    pred = (F.array_position(probs, F.array_max(probs)) - 1).cast("double")
    if loss_function == "absolute_error":
        return F.abs(pred - label.cast("double"))
    return (pred - label.cast("double")) ** 2  # squared_error


class DLEEstimator:
    """Direct Loss Estimation via a distributed GBT error predictor.

    Mirrors reference adapters/dle.py:21-159: per-sample loss computed on the
    labeled reference, a gradient-boosted regressor (pyspark.ml GBTRegressor,
    seed 42) learns features -> loss, production loss is the mean/std of the
    model's predictions. Features are an ``array<double>`` column.
    """

    def __init__(
        self,
        loss_function: str = "log_loss",
        n_estimators: int = 100,
        max_depth: int = 3,
    ) -> None:
        if loss_function not in ("log_loss", "absolute_error", "squared_error"):
            raise ValueError(f"unsupported loss_function {loss_function!r}")
        self._loss_function = loss_function
        self._n_estimators = n_estimators
        self._max_depth = max_depth
        self._model = None

    def fit(
        self,
        reference_df: DataFrame,
        features_col: str = "features",
        label_col: str = "label",
        probs_col: str = "probabilities",
    ) -> "DLEEstimator":
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.regression import GBTRegressor

        train = reference_df.select(
            array_to_vector(F.col(features_col).cast("array<double>")).alias("_fv"),
            _per_sample_loss(self._loss_function, probs_col, label_col)
            .cast("double")
            .alias("_loss"),
        )
        gbt = GBTRegressor(
            featuresCol="_fv",
            labelCol="_loss",
            maxIter=self._n_estimators,
            maxDepth=self._max_depth,
            seed=42,
        )
        self._model = gbt.fit(train)
        return self

    def estimate(
        self,
        production_df: DataFrame,
        features_col: str = "features",
    ) -> dict[str, Any]:
        if self._model is None:
            raise RuntimeError("Call fit() before estimate()")
        from pyspark.ml.functions import array_to_vector

        feats = production_df.select(
            array_to_vector(F.col(features_col).cast("array<double>")).alias("_fv")
        )
        preds = self._model.transform(feats)
        row = preds.agg(
            F.avg("prediction").alias("mean"),
            F.stddev_pop("prediction").alias("std"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if int(row["n"]) == 0:
            raise ValueError("production data must not be empty")
        return {
            "loss_function": self._loss_function,
            "estimated_loss": float(row["mean"]),
            "loss_std": float(row["std"] or 0.0),
            "n_samples": int(row["n"]),
            "method": "dle",
        }
