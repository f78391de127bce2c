"""Drift-report assembly from the results table (SURVEY S7, F2, F10, W4).

The reference builds nested report dataclasses from in-memory histories
(report_generator.py:236-466); here every input is an aggregation over the
engine's RESULTS table — tiny by construction — so assembly is one grouped
pass + driver-side dict shaping. Rolling-window metrics (W1) are proper
``rowsBetween`` windows, the distributed analogue of the reference's
``deque(maxlen=window_size)`` (performance_monitor.py:207).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aumos_drift_detector_spark.functions.kernels import recommended_action


def rolling_metrics(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    window_size: int = 500,
) -> DataFrame:
    """Size-bounded rolling mean/std/min/max per key (W1).

    ``rowsBetween(-(window_size-1), 0)`` over an ordered per-key window —
    exactly the reference's deque(maxlen=N) semantics, computed for EVERY
    row position in one pass.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_size - 1), Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    return df.select(
        *key_cols,
        F.col(order_col),
        v.alias(value_col),
        F.avg(v).over(w).alias("rolling_mean"),
        F.stddev_pop(v).over(w).alias("rolling_std"),
        F.min(v).over(w).alias("rolling_min"),
        F.max(v).over(w).alias("rolling_max"),
        F.count(v).over(w).alias("rolling_n"),
    )


def risk_level(
    drift_fraction: float,
    accuracy_delta: float | None = None,
) -> str:
    """Reference risk bands (report_generator.py:596-615)."""
    if accuracy_delta is not None:
        if accuracy_delta < -0.1:
            return "high"
        if accuracy_delta < -0.05:
            return "medium"
        return "low"
    if drift_fraction > 0.5:
        return "high"
    if drift_fraction > 0.2:
        return "medium"
    return "low"


def time_to_critical_hours(
    baseline_accuracy: float,
    current_accuracy: float,
    delta_window_hours: float = 24.0,
    critical_drop: float = 0.15,
) -> float | None:
    """Linear extrapolation to the critical accuracy floor
    (report_generator.py:618-624: rate = |delta|/24h, target = 85% of baseline)."""
    delta = current_accuracy - baseline_accuracy
    if delta >= 0 or not baseline_accuracy:
        return None
    rate_per_hour = abs(delta) / delta_window_hours
    target = baseline_accuracy * (1.0 - critical_drop)
    if rate_per_hour > 0 and current_accuracy > target:
        return (current_accuracy - target) / rate_per_hour
    return 0.0


def build_drift_report(
    results_df: DataFrame,
    run_id: str,
    top_k: int = 3,
    baseline_accuracy: float | None = None,
    current_accuracy: float | None = None,
) -> dict:
    """Assemble the reference's drift-report shape from results rows.

    One aggregation pass for the summary + one ordered limit for the top
    contributing checks (reference takes top-3, report_generator.py:347).
    """
    rr = results_df.where(F.col("run_id") == run_id)
    drift_rows = rr.where(F.col("check_name").isin(
        "psi", "ks", "jensen_shannon", "token_hist_js", "token_hist_chi2"
    ) & F.col("is_drifted").isNotNull())
    summary = drift_rows.agg(
        F.count(F.lit(1)).alias("total_checks"),
        F.sum(F.col("is_drifted").cast("long")).alias("drifted"),
        F.max("severity").alias("_"),
    ).collect()[0]
    total = int(summary["total_checks"] or 0)
    drifted = int(summary["drifted"] or 0)
    drift_fraction = drifted / total if total else 0.0

    top = [
        {
            "partition": r["partition_value"],
            "check": r["check_name"],
            "feature": r["feature"],
            "score": r["score"],
            "severity": r["severity"],
        }
        for r in drift_rows.where(F.col("is_drifted"))
        .orderBy(F.desc("score"))
        .limit(top_k)
        .collect()
    ]

    sev_counts = {
        r["severity"]: r["n"]
        for r in rr.groupBy("severity").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    overall_sev = (
        "critical" if sev_counts.get("critical") else
        "warning" if sev_counts.get("warning") else "info"
    )
    accuracy_delta = (
        current_accuracy - baseline_accuracy
        if baseline_accuracy is not None and current_accuracy is not None
        else None
    )
    risk = risk_level(drift_fraction, accuracy_delta)
    # high performance risk forces RETRAIN (report_generator.py:708-740)
    action = (
        "retrain" if risk == "high"
        else recommended_action(drifted > 0, overall_sev)
    )
    report = {
        "run_id": run_id,
        "total_drift_checks": total,
        "drifted_checks": drifted,
        "drift_fraction": round(drift_fraction, 4),
        "severity_counts": sev_counts,
        "overall_severity": overall_sev,
        "risk_level": risk,
        "recommended_action": action,
        "top_contributors": top,
    }
    if accuracy_delta is not None:
        report["accuracy_delta"] = round(accuracy_delta, 6)
        ttc = time_to_critical_hours(baseline_accuracy, current_accuracy)
        report["time_to_critical_hours"] = (
            round(ttc, 2) if ttc is not None else None
        )
    return report
