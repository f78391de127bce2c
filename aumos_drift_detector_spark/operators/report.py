"""Drift-report assembly from the results table (SURVEY S7, F2, F10, W4).

The reference builds nested report dataclasses from in-memory histories
(report_generator.py:236-466); here every input is an aggregation over the
engine's RESULTS table — tiny by construction — so assembly is one grouped
pass + driver-side dict shaping. Rolling-window metrics (W1) are proper
``rowsBetween`` windows, the distributed analogue of the reference's
``deque(maxlen=window_size)`` (performance_monitor.py:207).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
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


def build_heatmap(
    results_df: DataFrame,
    run_id: str,
    history_df: DataFrame | None = None,
    feature_col: str = "feature",
    default_threshold: float = 0.25,
) -> dict | None:
    """Feature x time drift-score heatmap payload (report_generator.py:635-688).

    Without history (or with an EMPTY history frame): one "now" column from
    the run's drift rows. With ``history_df`` (feature, ts, score — i.e. the
    results table over past runs): the full matrix, missing cells filled 0.0
    like the reference. The pivot collects only (features x timestamps)
    cells — a visualization payload is driver-sized by definition; the
    grouping that produces it is distributed.

    ``threshold`` follows the reference's (arbitrary) choice of the FIRST
    result row's threshold (report_generator.py:651: feature_results[0]);
    since runs can mix tests with different thresholds, the payload also
    carries a per-feature ``thresholds`` list for renderers that want the
    accurate per-row line.
    """
    rows = (
        results_df.where((F.col("run_id") == run_id) & F.col("is_drifted").isNotNull())
        .groupBy(feature_col)
        .agg(
            F.max("score").alias("score"),
            F.max("threshold").alias("threshold"),
        )
        .orderBy(feature_col)
        .collect()
    )
    if not rows:
        return None
    features = [str(r[feature_col]) for r in rows]
    thr = rows[0]["threshold"]
    threshold = float(thr) if thr is not None and thr == thr else default_threshold
    per_feature_thr = [
        float(r["threshold"])
        if r["threshold"] is not None and r["threshold"] == r["threshold"]
        else default_threshold
        for r in rows
    ]

    hist = (
        history_df.groupBy(feature_col, "ts")
        .agg(F.max("score").alias("score"))
        .collect()
        if history_df is not None
        else []
    )
    stamps = sorted({r["ts"] for r in hist})
    if not stamps:
        # no usable history (None OR empty frame): single current column
        return {
            "features": features,
            "time_labels": ["now"],
            "scores_matrix": [[float(r["score"] or 0.0)] for r in rows],
            "threshold": threshold,
            "thresholds": per_feature_thr,
        }
    cells = {(str(r[feature_col]), r["ts"]): float(r["score"] or 0.0) for r in hist}
    return {
        "features": features,
        "time_labels": [ts.isoformat() for ts in stamps],
        "scores_matrix": [
            [cells.get((f, ts), 0.0) for ts in stamps] for f in features
        ],
        "threshold": threshold,
        "thresholds": per_feature_thr,
    }


def build_time_series(
    history_df: DataFrame,
    feature_col: str = "feature",
    ts_col: str = "ts",
    score_col: str = "score",
) -> dict[str, list[dict]]:
    """Serializable per-feature drift-score time series
    (report_generator.py:687-706 `_build_time_series` parity).

    Input is the distributed results-history table (feature, ts, score);
    output is {feature: [{"timestamp": iso, "score": float}, ...]} with each
    feature's points sorted by timestamp — the reference's serialization
    shape. One grouped aggregation collects (features x timestamps) cells;
    like the heatmap, a visualization payload is driver-sized by definition.

    Documented deviations from ``_build_time_series`` (deliberate, tested):
    duplicate (feature, ts) points collapse to ``max(score)`` — the
    reference keeps every pair verbatim, but a distributed history table
    can legitimately hold one row per partition per timestamp and a chart
    payload wants one point per x — and a NULL score serializes as 0.0
    rather than ``null`` (the reference never stores NULL scores; the
    distributed error-verdict rows do).
    """
    rows = (
        history_df.where(
            F.col(feature_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(feature_col, ts_col)
        .agg(F.max(score_col).alias("score"))
        .collect()
    )
    out: dict[str, list[dict]] = {}
    for r in sorted(rows, key=lambda r: (str(r[feature_col]), r[ts_col])):
        out.setdefault(str(r[feature_col]), []).append(
            {
                "timestamp": r[ts_col].isoformat(),
                "score": float(r["score"] or 0.0),
            }
        )
    return out


def pdf_placeholder(report: dict) -> str:
    """Structured-text PDF placeholder (report_generator.py:466-516 parity:
    the reference also only emits a text block — full PDF rendering needs
    reportlab/WeasyPrint, absent there and here; header/section layout and
    per-feature line format match field-for-field).

    ``report`` is the dict produced by ``build_drift_report`` plus the
    metadata keys used below; missing keys render as ``None`` rather than
    raising, mirroring the reference's attribute access on a fully-populated
    dataclass.
    """
    perf = report.get("performance_impact", {})
    lines: list[str] = [
        "=" * 80,
        "AUMOS DRIFT DETECTOR — DRIFT ASSESSMENT REPORT",
        "=" * 80,
        f"Report ID:    {report.get('report_id')}",
        f"Monitor ID:   {report.get('monitor_id')}",
        f"Model ID:     {report.get('model_id')}",
        f"Generated At: {report.get('generated_at')}",
        f"Period:       {report.get('period_start')} → {report.get('period_end')}",
        "",
        "EXECUTIVE SUMMARY",
        "-" * 40,
        str(report.get("executive_summary", "")),
        "",
        "OVERALL RECOMMENDATION",
        "-" * 40,
        f"Action:  {str(report.get('overall_recommended_action', '')).upper()}",
        f"Drifted: {report.get('drifted_feature_count')} / "
        f"{report.get('total_features_monitored')} features",
        "",
        "PERFORMANCE IMPACT",
        "-" * 40,
        f"Risk Level:              {str(perf.get('risk_level', '')).upper()}",
        f"Baseline Accuracy:       {perf.get('baseline_accuracy')}",
        f"Current Accuracy:        {perf.get('current_accuracy')}",
        f"Accuracy Delta:          {perf.get('accuracy_delta')}",
        f"Drift Contribution:      {float(perf.get('estimated_drift_contribution', 0.0)):.1%}",
        "",
        "PER-FEATURE ASSESSMENT",
        "-" * 40,
    ]
    assessments = sorted(
        report.get("feature_assessments", []),
        key=lambda a: a.get("importance_rank", 0),
    )
    for a in assessments:
        lines.append(
            f"  [{a.get('importance_rank', 0):2d}] {a.get('feature_name', ''):<30} "
            f"score={float(a.get('drift_score', 0.0)):.4f}  "
            f"threshold={float(a.get('threshold', 0.0)):.4f}  "
            f"{'DRIFTED' if a.get('is_drifted') else 'OK':<8}  "
            f"action={a.get('recommended_action', '')}"
        )
    lines.extend(["", "=" * 80])
    return "\n".join(lines)


def executive_summary(
    drifted_count: int,
    total_features: int,
    overall_action: str,
    top_features: Sequence[str],
    period_start: datetime,
    now: datetime | None = None,
    accuracy_delta: float | None = None,
    risk: str = "low",
) -> str:
    """Plain-text executive summary (report_generator.py:743-805, same
    sentence templates and ordering)."""
    now = now or datetime.now(tz=timezone.utc)
    duration_hours = max(1, int((now - period_start).total_seconds() / 3600))
    drift_summary = (
        f"{drifted_count} of {total_features} monitored features"
        if total_features > 0
        else "0 features"
    )
    top_feat_str = ", ".join(top_features) if top_features else "none identified"
    if drifted_count == 0:
        status_text = "No data drift was detected during this assessment period."
        action_text = "No immediate action is required."
    else:
        status_text = (
            f"Data drift was detected in {drift_summary} over the past "
            f"{duration_hours} hours. The primary contributing features are: "
            f"{top_feat_str}."
        )
        action_map = {
            "retrain": "Immediate model retraining is recommended to restore performance.",
            "investigate": (
                "Investigation of the drifted features is recommended before "
                "deciding on retraining."
            ),
            "monitor": (
                "Continued monitoring is recommended; drift is within "
                "acceptable bounds."
            ),
            "ignore": "No action required at this time.",
        }
        action_text = action_map.get(
            overall_action, "Review the feature assessments below."
        )
    perf_text = ""
    if accuracy_delta is not None:
        direction = "decreased" if accuracy_delta < 0 else "improved"
        perf_text = (
            f" Model accuracy has {direction} by {abs(accuracy_delta):.2%} "
            f"(risk level: {risk})."
        )
    return f"{status_text}{perf_text} {action_text}"


@dataclass
class ReportSchedule:
    """Scheduled-report configuration (report_generator.py:249-275).

    Notification-channel dispatch (email/Slack senders) is external I/O and
    out of engine scope; the schedule registry + history below are the
    bookkeeping surface the reference exposes.
    """

    schedule_id: str
    monitor_id: str
    cron_expression: str
    recipients_email: list[str] = field(default_factory=list)
    recipients_slack_webhook: list[str] = field(default_factory=list)
    report_format: str = "json"
    include_heatmap: bool = True
    enabled: bool = True
    last_run_at: datetime | None = None


class ReportRegistry:
    """Schedule CRUD + report history (report_generator.py:388-466).

    Driver-side registry over engine-built report dicts; persistence of the
    reports themselves is the results/violations tables — this mirrors the
    reference's in-memory bookkeeping exactly.
    """

    def __init__(self) -> None:
        self._history: list[dict] = []
        self._schedules: dict[str, ReportSchedule] = {}

    # -- schedules ---------------------------------------------------------
    def register_schedule(self, schedule: ReportSchedule) -> None:
        self._schedules[schedule.schedule_id] = schedule

    def remove_schedule(self, schedule_id: str) -> bool:
        return self._schedules.pop(schedule_id, None) is not None

    def list_schedules(self, monitor_id: str | None = None) -> list[ReportSchedule]:
        out = list(self._schedules.values())
        if monitor_id is not None:
            out = [s for s in out if s.monitor_id == monitor_id]
        return out

    # -- history -----------------------------------------------------------
    def record(self, report: dict, monitor_id: str | None = None) -> dict:
        entry = dict(report)
        entry.setdefault("report_id", uuid.uuid4().hex)
        entry.setdefault(
            "generated_at", datetime.now(tz=timezone.utc).isoformat()
        )
        if monitor_id is not None:
            entry["monitor_id"] = monitor_id
        self._history.append(entry)
        return entry

    def get_report_history(
        self, monitor_id: str | None = None, limit: int = 50
    ) -> list[dict]:
        reports = list(reversed(self._history))  # newest-first
        if monitor_id is not None:
            reports = [r for r in reports if r.get("monitor_id") == monitor_id]
        return reports[:limit]

    def export_report_json(self, report_id: str, indent: int = 2) -> str:
        report = next(
            (r for r in self._history if r.get("report_id") == report_id), None
        )
        if report is None:
            raise ValueError(f"Report {report_id} not found")
        return json.dumps(report, indent=indent, default=str)
