"""Custom drift-check registry — the engine's plugin surface (SURVEY §2.9).

The reference sandboxes user plugins in a subprocess with a timeout
(plugin_sandbox.py:1-40, template `drift_test(reference_data,
production_data) -> dict`). The Spark-first equivalent: a registered check is
a VECTORIZED pandas function run over bounded, seeded samples (executor-side
isolation comes free — a failing check fails its task, not the engine), never
a per-row Python UDF.

Two shapes are supported:
- sample checks:  fn(ref_values: np.ndarray, prod_values: np.ndarray) -> dict
  with at least {"score", "threshold", "is_drifted"} — the reference's
  plugin contract, fed from seeded distributed samples capped at
  ``sample_cap`` per side.
- sketch checks:  fn(ref_counts, prod_counts, edges) -> dict — fed from the
  engine's histogram sketch, for checks that must see full-population
  (not sampled) evidence at scale.

Timeout semantics (reference plugin_sandbox.py:23-40 enforces 30s +
process isolation): the user function itself runs DRIVER-side on the
collected sample/sketch, so ``run_custom_check`` wraps it in a watchdog
thread with a ``check_timeout`` deadline (default 30s, the reference's
number) and raises ``CheckTimeoutError`` cleanly on expiry. Python cannot
kill a hung thread — the abandoned daemon thread is documented cost of
in-process plugins; checks needing hard kill should be subprocess-wrapped
by the caller. The distributed half (sampling/sketch jobs) relies on
Spark's own task reaper (`spark.task.reaper.*`) as every engine job does.
"""

from __future__ import annotations

import threading
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame

from aumos_drift_detector_spark.functions.kernels import DriftVerdict
from aumos_drift_detector_spark.operators.profile import clean_values

_SAMPLE_CHECKS: dict[str, Callable] = {}
_SKETCH_CHECKS: dict[str, Callable] = {}


class CheckTimeoutError(TimeoutError):
    """A registered check exceeded its deadline (plugin_sandbox.py parity)."""


def _call_with_deadline(fn: Callable, args: tuple, timeout: float, name: str):
    if timeout is None or timeout <= 0:
        return fn(*args)
    result: list = []
    error: list = []

    def target() -> None:
        try:
            result.append(fn(*args))
        except BaseException as e:  # surfaced to the caller below
            error.append(e)

    # a daemon Thread (NOT ThreadPoolExecutor, whose workers would block
    # interpreter exit if the check truly hangs) — abandoned on timeout
    t = threading.Thread(target=target, name=f"check-{name}", daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise CheckTimeoutError(
            f"custom check {name!r} exceeded {timeout}s deadline"
        )
    if error:
        raise error[0]
    return result[0]


def register_check(name: str, fn: Callable, kind: str = "sample") -> None:
    """Register a custom check under `name` ('sample' or 'sketch' kind)."""
    if kind == "sample":
        _SAMPLE_CHECKS[name] = fn
    elif kind == "sketch":
        _SKETCH_CHECKS[name] = fn
    else:
        raise ValueError(f"kind must be 'sample' or 'sketch', got {kind!r}")


def registered_checks() -> dict[str, str]:
    return {**{k: "sample" for k in _SAMPLE_CHECKS},
            **{k: "sketch" for k in _SKETCH_CHECKS}}


def unregister_check(name: str) -> None:
    _SAMPLE_CHECKS.pop(name, None)
    _SKETCH_CHECKS.pop(name, None)


def run_custom_check(
    name: str,
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    sample_cap: int = 10_000,
    seed: int = 42,
    n_bins: int = 20,
    check_timeout: float = 30.0,
) -> DriftVerdict:
    """Execute a registered check against two DataFrames.

    Sample checks receive seeded bounded samples (cap logged in details — no
    silent caps); sketch checks receive full-population histogram counts.
    The user function runs under a ``check_timeout``-second deadline
    (reference plugin_sandbox.py:23-40; raises ``CheckTimeoutError``);
    pass 0/None to disable.
    """
    if name in _SAMPLE_CHECKS:
        def draw(df: DataFrame, s: int) -> np.ndarray:
            clean = clean_values(df, column)
            n = clean.count()
            frac = min(1.0, sample_cap * 1.2 / max(n, 1))
            rows = clean.sample(frac, seed=s).limit(sample_cap).collect()
            return np.asarray([r["v"] for r in rows], dtype=float)

        ref = draw(ref_df, seed)
        prod = draw(prod_df, seed + 1)
        out = _call_with_deadline(
            _SAMPLE_CHECKS[name], (ref, prod), check_timeout, name
        )
        details = {k: v for k, v in out.items()
                   if k not in ("score", "threshold", "is_drifted")}
        details["sample_cap"] = sample_cap
        return DriftVerdict(
            test=name,
            score=float(out["score"]),
            threshold=float(out.get("threshold", float("nan"))),
            is_drifted=bool(out["is_drifted"]),
            reference_size=len(ref),
            production_size=len(prod),
            feature_name=column,
            details=details,
        )

    if name in _SKETCH_CHECKS:
        from aumos_drift_detector_spark.operators.drift import (
            _binned_counts_shared_range,
        )

        pdf = _binned_counts_shared_range(ref_df, prod_df, column, (), n_bins)
        rc = np.zeros(n_bins, dtype=np.int64)
        pc = np.zeros(n_bins, dtype=np.int64)
        for _, r in pdf.iterrows():
            (rc if r["side"] == 0 else pc)[int(r["bin"])] += int(r["cnt"])
        out = _call_with_deadline(
            _SKETCH_CHECKS[name], (rc, pc), check_timeout, name
        )
        return DriftVerdict(
            test=name,
            score=float(out["score"]),
            threshold=float(out.get("threshold", float("nan"))),
            is_drifted=bool(out["is_drifted"]),
            reference_size=int(rc.sum()),
            production_size=int(pc.sum()),
            feature_name=column,
            details={k: v for k, v in out.items()
                     if k not in ("score", "threshold", "is_drifted")},
        )

    raise KeyError(f"no check registered under {name!r}")
