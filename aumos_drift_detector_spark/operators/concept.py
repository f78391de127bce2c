"""Sequential concept-drift detectors replayed per key in Arrow batches.

ADWIN (Bifet & Gavalda 2007, SDM), DDM (Gama et al. 2004, SBIA), and EDDM
(Baena-Garcia et al. 2006) are one-element-at-a-time state machines — there is
no distributed formulation of their intra-stream semantics. The Spark-first
answer (SURVEY §2.7): parallelism ACROSS streams, exact sequential replay
WITHIN a stream — ``df.groupBy(keys).applyInPandas(replay)`` where each group
arrives as one Arrow batch, is sorted by its sequence column, and feeds a
pure-Python detector whose behavior matches the reference implementations
(reference adapters/concept_drift/{adwin,ddm}.py — algorithm parameters,
thresholds, reset rules, and the simplified ADWIN epsilon_cut
``sqrt(ln(4W/delta) / (2W))``, adwin.py:303-319).

State snapshots serialize to dicts so a streaming variant
(``applyInPandasWithState``) can persist them between micro-batches.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NORMAL, WARNING, DRIFT = "normal", "warning", "drift"


class AdwinDetector:
    """ADaptive WINdowing with an exponential-histogram window.

    Simplified variant: per-level capacity ``max_buckets``; overflow merges
    the two oldest buckets of a level into the next level; the drift test
    scans every sub-window split from newest to oldest with
    ``eps = sqrt(ln(4W/delta)/(2W))`` and, on detection, drops the old
    portion (fractionally inside the oldest bucket if needed).
    """

    def __init__(self, delta: float = 0.002, max_buckets: int = 5) -> None:
        if not (0.0 < delta < 1.0):
            raise ValueError(f"delta must be in (0, 1), got {delta}")
        self.delta = delta
        self.max_buckets = max_buckets
        self.reset()

    def reset(self) -> None:
        # levels[i] = list of [total, variance, size] with size 2^i, oldest first
        self._levels: list[list[list[float]]] = [[]]
        self._sum = 0.0
        self._var = 0.0
        self._count = 0
        self._updates = 0
        self._last_drift = False

    @property
    def width(self) -> int:
        return self._count

    @property
    def mean(self) -> float:
        return self._sum / self._count if self._count else 0.0

    def update(self, value: float) -> None:
        self._updates += 1
        self._last_drift = False
        self._levels[0].append([float(value), 0.0, 1])
        prev_mean = self._sum / self._count if self._count else float(value)
        self._count += 1
        self._sum += value
        self._var += (value - prev_mean) * (value - self._sum / self._count)
        self._compact()
        self._last_drift = self._scan_for_cut()

    def detect(self) -> str:
        return DRIFT if self._last_drift else NORMAL

    def get_state(self) -> dict:
        return {
            "detector": "adwin",
            "drift_detected": self._last_drift,
            "window_size": self._count,
            "window_mean": self.mean,
            "total_updates": self._updates,
            "delta": self.delta,
        }

    def dump(self) -> dict:
        """FULL state (incl. histogram buckets) for checkpoint resume."""
        return {
            "levels": self._levels,
            "sum": self._sum,
            "var": self._var,
            "count": self._count,
            "updates": self._updates,
            "last_drift": self._last_drift,
            "delta": self.delta,
            "max_buckets": self.max_buckets,
        }

    @classmethod
    def load(cls, d: dict) -> "AdwinDetector":
        det = cls(delta=d["delta"], max_buckets=d["max_buckets"])
        det._levels = [[list(b) for b in lv] for lv in d["levels"]]
        det._sum = d["sum"]
        det._var = d["var"]
        det._count = d["count"]
        det._updates = d["updates"]
        det._last_drift = d["last_drift"]
        return det

    def _compact(self) -> None:
        i = 0
        while i < len(self._levels):
            level = self._levels[i]
            if len(level) > self.max_buckets:
                if i + 1 == len(self._levels):
                    self._levels.append([])
                a = level.pop(0)
                b = level.pop(0)
                n = a[2] + b[2]
                ma, mb = a[0] / a[2] if a[2] else 0.0, b[0] / b[2] if b[2] else 0.0
                merged_var = a[1] + b[1] + (a[2] * b[2] / n) * (ma - mb) ** 2
                self._levels[i + 1].append([a[0] + b[0], merged_var, n])
            i += 1

    def _scan_for_cut(self) -> bool:
        w = self._count
        if w < 2:
            return False
        eps = math.sqrt(math.log(4.0 * w / self.delta) / (2.0 * w))
        head_sum = 0.0
        head_var = 0.0
        head_n = 0
        # newest first: level 0 holds the most recent singletons; within a
        # level the most recently appended bucket is newest
        for level in self._levels:
            for bucket in reversed(level):
                head_sum += bucket[0]
                head_var += bucket[1]
                head_n += bucket[2]
                tail_n = w - head_n
                if tail_n <= 0:
                    continue
                tail_mean = (self._sum - head_sum) / tail_n
                head_mean = head_sum / head_n
                if abs(head_mean - tail_mean) >= eps:
                    self._evict_tail(tail_n)
                    self._sum, self._var, self._count = head_sum, head_var, head_n
                    return True
        return False

    def _evict_tail(self, n_drop: int) -> None:
        remaining = n_drop
        for level in reversed(self._levels):
            while level and remaining > 0:
                oldest = level[0]
                if oldest[2] <= remaining:
                    remaining -= oldest[2]
                    level.pop(0)
                else:
                    frac = remaining / oldest[2]
                    oldest[0] *= 1.0 - frac
                    oldest[1] *= 1.0 - frac
                    oldest[2] -= remaining
                    remaining = 0


class DdmDetector:
    """DDM: Bernoulli error-rate tracking with p_min/s_min envelope.

    WARNING at ``p + s >= p_min + warning_level*s_min``, DRIFT at
    ``>= p_min + drift_level*s_min`` followed by self-reset; detection
    begins after ``min_num_instances`` samples.
    """

    def __init__(
        self,
        warning_level: float = 2.0,
        drift_level: float = 3.0,
        min_num_instances: int = 30,
    ) -> None:
        if warning_level >= drift_level:
            raise ValueError("warning_level must be < drift_level")
        self.warning_level = warning_level
        self.drift_level = drift_level
        self.min_num_instances = min_num_instances
        self.reset()

    def reset(self) -> None:
        self._n = 0
        self._p = 1.0
        self._s = 0.0
        self._p_min = math.inf
        self._s_min = math.inf
        self._level = NORMAL

    def update(self, error: float) -> None:
        if self._level == DRIFT:  # post-drift recovery: drift is one-shot
            self._level = NORMAL
        self._n += 1
        self._p += (error - self._p) / self._n
        self._s = math.sqrt(self._p * (1.0 - self._p) / self._n)
        if self._n < self.min_num_instances:
            return
        if self._p + self._s <= self._p_min + self._s_min:
            self._p_min, self._s_min = self._p, self._s
        if math.isinf(self._p_min):
            return
        metric = self._p + self._s
        if metric >= self._p_min + self.drift_level * self._s_min:
            # NOTE: the reference resets and thereby erases the DRIFT level
            # before callers can observe it (ddm.py:194-196 vs its own test
            # test_ddm.py:23-36, which fails on the reference). We follow the
            # reference's TESTS (the spec): reset state, keep DRIFT visible
            # until the next update.
            self.reset()
            self._level = DRIFT
        elif metric >= self._p_min + self.warning_level * self._s_min:
            self._level = WARNING
        else:
            self._level = NORMAL

    def detect(self) -> str:
        return self._level

    def get_state(self) -> dict:
        return {
            "detector": "ddm",
            "level": self._level,
            "n_samples": self._n,
            "error_rate": self._p,
            "min_error_rate": 0.0 if math.isinf(self._p_min) else self._p_min,
        }

    def dump(self) -> dict:
        return {
            "n": self._n, "p": self._p, "s": self._s,
            "p_min": None if math.isinf(self._p_min) else self._p_min,
            "s_min": None if math.isinf(self._s_min) else self._s_min,
            "level": self._level,
            "warning_level": self.warning_level,
            "drift_level": self.drift_level,
            "min_num_instances": self.min_num_instances,
        }

    @classmethod
    def load(cls, d: dict) -> "DdmDetector":
        det = cls(d["warning_level"], d["drift_level"], d["min_num_instances"])
        det._n, det._p, det._s = d["n"], d["p"], d["s"]
        det._p_min = math.inf if d["p_min"] is None else d["p_min"]
        det._s_min = math.inf if d["s_min"] is None else d["s_min"]
        det._level = d["level"]
        return det


class EddmDetector:
    """EDDM: inter-error-distance tracking, ratio vs the max (mean+2std)^2.

    DRIFT when the ratio falls below ``drift_level`` (0.90), WARNING below
    ``warning_level`` (0.95); requires ``min_num_errors`` errors first;
    self-resets on drift. Values >= 0.5 count as errors.
    """

    def __init__(
        self,
        warning_level: float = 0.95,
        drift_level: float = 0.90,
        min_num_errors: int = 30,
    ) -> None:
        if drift_level >= warning_level:
            raise ValueError("drift_level must be < warning_level")
        self.warning_level = warning_level
        self.drift_level = drift_level
        self.min_num_errors = min_num_errors
        self.reset()

    def reset(self) -> None:
        self._n = 0
        self._n_err = 0
        self._last_err_at = 0
        self._dist_mean = 0.0
        self._dist_m2 = 0.0
        self._max_metric = 0.0
        self._level = NORMAL

    def update(self, error: float) -> None:
        if self._level == DRIFT:  # post-drift recovery (see DdmDetector note)
            self._level = NORMAL
        self._n += 1
        if error < 0.5:
            return
        self._n_err += 1
        gap = float(self._n - self._last_err_at)
        self._last_err_at = self._n
        d1 = gap - self._dist_mean
        self._dist_mean += d1 / self._n_err
        self._dist_m2 += d1 * (gap - self._dist_mean)
        if self._n_err < self.min_num_errors:
            return
        std = math.sqrt(self._dist_m2 / self._n_err) if self._n_err > 1 else 0.0
        metric = (self._dist_mean + 2.0 * std) ** 2
        if metric > self._max_metric:
            self._max_metric = metric
        if self._max_metric == 0.0:
            return
        ratio = metric / self._max_metric
        if ratio < self.drift_level:
            self.reset()
            self._level = DRIFT
        elif ratio < self.warning_level:
            self._level = WARNING
        else:
            self._level = NORMAL

    def detect(self) -> str:
        return self._level

    def get_state(self) -> dict:
        return {
            "detector": "eddm",
            "level": self._level,
            "n_samples": self._n,
            "mean_distance": self._dist_mean,
        }

    def dump(self) -> dict:
        return {
            "n": self._n, "n_err": self._n_err, "last_err_at": self._last_err_at,
            "dist_mean": self._dist_mean, "dist_m2": self._dist_m2,
            "max_metric": self._max_metric, "level": self._level,
            "warning_level": self.warning_level, "drift_level": self.drift_level,
            "min_num_errors": self.min_num_errors,
        }

    @classmethod
    def load(cls, d: dict) -> "EddmDetector":
        det = cls(d["warning_level"], d["drift_level"], d["min_num_errors"])
        det._n, det._n_err = d["n"], d["n_err"]
        det._last_err_at = d["last_err_at"]
        det._dist_mean, det._dist_m2 = d["dist_mean"], d["dist_m2"]
        det._max_metric, det._level = d["max_metric"], d["level"]
        return det


def cusum_change_points(
    scores: Sequence[float],
    threshold: float = 4.0,
    min_separation: int = 3,
) -> list[int]:
    """Two-sided CUSUM change-point indices over a full score series (W6).

    Reference semantics (trend_analyzer.py:577-636): normalize by the global
    mean and SAMPLE std, drift allowance k = 0.5 in normalized units,
    two-sided accumulators, hit when either exceeds ``threshold``; hits
    recorded only when > ``min_separation`` apart; accumulators reset after
    every hit; series shorter than 5 returns no change points.
    """
    n = len(scores)
    if n < 5:
        return []
    mean = sum(scores) / n
    var = sum((x - mean) ** 2 for x in scores) / (n - 1) if n > 1 else 1.0
    std = math.sqrt(var) or 1.0

    pos = neg = 0.0
    hits: list[int] = []
    # start OUTSIDE the separation window: with last=0 a change point at
    # index <= min_separation would reset the accumulators yet never be
    # reported (round-3 review)
    last = -(min_separation + 1)
    for i, x in enumerate(scores):
        z = (x - mean) / std
        pos = max(0.0, pos + z - 0.5)
        neg = max(0.0, neg - z - 0.5)
        if pos > threshold or neg > threshold:
            if i - last > min_separation:
                hits.append(i)
                last = i
            pos = neg = 0.0
    return hits


def cusum_grouped(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    threshold: float = 4.0,
) -> DataFrame:
    """CUSUM change points per key via ordered replay in applyInPandas."""
    key_fields = [df.schema[k] for k in key_cols]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("change_index", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {k: pdf.iloc[0][k] for k in key_cols}
        # drop NULL/NaN values BEFORE the replay: one NaN poisons mean/std
        # and every z-score, silently reporting zero change points
        # (replay_detector does the same skip)
        pdf = (
            pdf[pdf[value_col].notna()]
            .sort_values(order_col, kind="mergesort")
            .reset_index(drop=True)
        )
        if pdf.empty:
            return pd.DataFrame(
                [], columns=[*key_cols, "change_index", "seq", "value"]
            )
        vals = pdf[value_col].astype(float).tolist()
        hits = cusum_change_points(vals, threshold)
        return pd.DataFrame(
            [
                {**keys, "change_index": i, "seq": int(pdf[order_col].iloc[i]),
                 "value": float(vals[i])}
                for i in hits
            ],
            columns=[*key_cols, "change_index", "seq", "value"],
        )

    return (
        df.select(*key_cols, order_col, F.col(value_col).cast("double").alias(value_col))
        .groupBy(*key_cols)
        .applyInPandas(replay, out_schema)
    )


DETECTORS = {
    "adwin": AdwinDetector,
    "ddm": DdmDetector,
    "eddm": EddmDetector,
}

REPLAY_SCHEMA_TAIL = [
    T.StructField("seq", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("level", T.StringType()),
    T.StructField("window_size", T.LongType()),
    T.StructField("n_updates", T.LongType()),
]


def replay_detector(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    detector: str = "adwin",
    events_only: bool = True,
    **params,
) -> DataFrame:
    """Replay a concept-drift detector over each key's ordered stream.

    One shuffle (groupBy keys); within each Arrow batch rows are sorted by
    ``order_col`` and fed sequentially — exact call-order semantics of the
    reference's ``detector.update(value); detector.detect()`` loop
    (reference adwin.py:159-201). Emits transition/drift event rows (or every
    row when ``events_only=False``) plus the detector's window stats.

    Parallelism is across keys (streams), never within one — document this
    when sizing jobs: 10^6 independent streams saturate a cluster; one giant
    stream is inherently sequential.
    """
    if detector not in DETECTORS:
        raise ValueError(f"unknown detector {detector!r}; choose {sorted(DETECTORS)}")
    cls = DETECTORS[detector]
    key_fields = [df.schema[k] for k in key_cols]
    out_schema = T.StructType(key_fields + REPLAY_SCHEMA_TAIL)

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        det = cls(**params)
        keys = {k: pdf.iloc[0][k] for k in key_cols}
        rows = []
        n = 0
        for seq, val in zip(pdf[order_col].to_numpy(), pdf[value_col].to_numpy()):
            if val is None or (isinstance(val, float) and math.isnan(val)):
                continue
            n += 1
            det.update(float(val))
            level = det.detect()
            if not events_only or level != NORMAL:
                rows.append(
                    {
                        **keys,
                        "seq": int(seq),
                        "value": float(val),
                        "level": level,
                        "window_size": int(getattr(det, "width", 0) or det.get_state().get("n_samples", 0)),
                        "n_updates": n,
                    }
                )
        if not rows and events_only:
            # always emit a terminal row so silent streams are visible
            state = det.get_state()
            rows.append(
                {
                    **keys,
                    "seq": int(pdf[order_col].iloc[-1]) if len(pdf) else -1,
                    "value": float("nan"),
                    "level": NORMAL,
                    "window_size": int(getattr(det, "width", 0) or state.get("n_samples", 0)),
                    "n_updates": n,
                }
            )
        return pd.DataFrame(rows, columns=[*key_cols, "seq", "value", "level", "window_size", "n_updates"])

    return (
        df.select(*key_cols, order_col, F.col(value_col).cast("double").alias(value_col))
        .groupBy(*key_cols)
        .applyInPandas(replay, out_schema)
    )
