"""Alert gating: dedup keys, cooldown suppression, retrain-trigger direction.

Batch restatement of the reference's in-memory alert/trigger state
(alert_system.py:300-340, retrain_trigger.py:239-244,521-534): the "state"
is the alerts/triggers table itself — gating is a join against the last-fired
row per dedup key plus timestamp arithmetic, so it is idempotent and
cluster-safe (no in-process dict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# p-value tests fire when score < threshold; score-style tests when score >
# (reference retrain_trigger.py:239-244). Comparison strictness follows each
# kernel's own drift verdict: only PSI declares drift on >= (psi.py:181); the
# distance tests (JS/Hellinger/Wasserstein/MMD) use strict >, so a boundary
# score must not fire a retrain signal without a matching drift verdict.
# P_VALUE_TESTS is the ONE authoritative registry (kernels.py) — a local
# copy would silently diverge when a new p-value kernel is added
from aumos_drift_detector_spark.functions.kernels import P_VALUE_TESTS  # noqa: E402

GTE_TESTS = {"psi"}


def threshold_crossed(test_col, score_col, threshold_col):
    """Direction-aware trigger predicate (F7), matching kernel strictness."""
    return (
        F.when(test_col.isin(*P_VALUE_TESTS), score_col < threshold_col)
        .when(test_col.isin(*GTE_TESTS), score_col >= threshold_col)
        .otherwise(score_col > threshold_col)
    )


def dedup_key(rule_col, monitor_col, metric_col):
    """Stable alert dedup key (F9, alert_system.py:310-330)."""
    return F.sha2(F.concat_ws("|", rule_col, monitor_col, metric_col), 256)


def gate_alerts(
    candidates: DataFrame,
    alert_history: DataFrame | None,
    cooldown_minutes: int = 60,
    ts_col: str = "detected_at",
) -> DataFrame:
    """Suppress candidate alerts whose dedup key fired inside the cooldown.

    ``candidates`` must carry a ``dedup_key`` column and ``ts_col``;
    ``alert_history`` is the previously-written alerts table (or None for the
    first run). Emits every candidate with ``status`` = 'dispatched' |
    'suppressed' — suppressed rows are kept, matching the reference's
    suppressed-history behavior (alert_system.py:322-330).

    Cooldown resolves SEQUENTIALLY per dedup key (applyInPandas, the same
    shape as the trigger engine): two candidates for one key inside one
    batch suppress each other exactly as the reference's in-memory event
    loop would — a backfill batch can never double-dispatch a key
    (round-3 review). Keys are many, candidates per key per batch are few.
    """
    import pandas as pd

    if alert_history is not None:
        last_fired = (
            alert_history.where(F.col("status") == "dispatched")
            .groupBy("dedup_key")
            .agg(F.max(ts_col).alias("_last_ts"))
        )
        joined = candidates.join(F.broadcast(last_fired), "dedup_key", "left")
    else:
        joined = candidates.withColumn("_last_ts", F.lit(None).cast("timestamp"))
    # per-rule cooldown when the candidates carry one (evaluate_rules path),
    # else the global parameter (alert_system.py:313: rule.cooldown_minutes)
    has_cd = "cooldown_minutes" in candidates.columns
    cand_cols = candidates.columns
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("status", T.StringType())]
    )

    def resolve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        last = pdf["_last_ts"].iloc[0]
        last = None if pd.isna(last) else last.to_pydatetime()
        statuses = []
        for _, r in pdf.iterrows():
            cd = pd.Timedelta(
                minutes=int(r["cooldown_minutes"]) if has_cd else cooldown_minutes
            )
            ts = r[ts_col].to_pydatetime()
            if last is not None and (ts - last) < cd:
                statuses.append("suppressed")
            else:
                statuses.append("dispatched")
                last = ts
        out = pdf[cand_cols].copy()
        out["status"] = statuses
        return out

    return joined.groupBy("dedup_key").applyInPandas(resolve, out_schema)


class AlertRuleSet:
    """Driver-side alert-rule registry (alert_system.py:219-265 CRUD parity).

    Rules live as plain dicts; ``to_df`` materializes the broadcastable rule
    dimension ``evaluate_rules`` consumes. add/remove/update mirror the
    reference's AlertSystem rule management.
    """

    _FIELDS = (
        "rule_id", "metric", "threshold", "comparison", "severity",
        "monitor_id", "model_id", "cooldown_minutes", "enabled",
    )

    def __init__(self) -> None:
        self._rules: dict[str, dict] = {}

    def add_rule(self, rule_id: str, metric: str, threshold: float,
                 comparison: str = "gt", severity: str = "warning",
                 monitor_id: str | None = None, model_id: str | None = None,
                 cooldown_minutes: int = 60, enabled: bool = True) -> None:
        if comparison not in ("gt", "lt"):
            raise ValueError("comparison must be 'gt' or 'lt'")
        self._rules[str(rule_id)] = dict(
            rule_id=str(rule_id), metric=metric, threshold=float(threshold),
            comparison=comparison, severity=severity, monitor_id=monitor_id,
            model_id=model_id, cooldown_minutes=int(cooldown_minutes),
            enabled=bool(enabled),
        )

    def remove_rule(self, rule_id: str) -> bool:
        return self._rules.pop(str(rule_id), None) is not None

    def update_rule(self, rule_id: str, **kwargs) -> bool:
        rule = self._rules.get(str(rule_id))
        if rule is None:
            return False
        merged = {**rule, **{k: v for k, v in kwargs.items() if k in rule}}
        # re-route through add_rule so updates get the SAME validation and
        # type coercion as creation — an unvalidated comparison like 'ge'
        # would silently fall through evaluate_rules' otherwise-branch and
        # fire in the 'lt' direction (round-3 review)
        self.add_rule(**merged)
        return True

    def get_rule(self, rule_id: str) -> dict | None:
        r = self._rules.get(str(rule_id))
        return dict(r) if r else None

    def to_df(self, spark) -> DataFrame:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("rule_id", T.StringType()),
                T.StructField("metric", T.StringType()),
                T.StructField("threshold", T.DoubleType()),
                T.StructField("comparison", T.StringType()),
                T.StructField("severity", T.StringType()),
                T.StructField("monitor_id", T.StringType()),
                T.StructField("model_id", T.StringType()),
                T.StructField("cooldown_minutes", T.IntegerType()),
                T.StructField("enabled", T.BooleanType()),
            ]
        )
        rows = [tuple(r[f] for f in self._FIELDS) for r in self._rules.values()]
        return spark.createDataFrame(rows, schema)


def evaluate_rules(
    metrics: DataFrame,
    rules: DataFrame,
    ts_col: str = "detected_at",
) -> DataFrame:
    """Evaluate alert rules against metric rows (alert_system.py:267-344).

    ``metrics``: (monitor_id, model_id, metric, value, <ts_col>).
    ``rules``: (rule_id, metric, threshold, comparison 'gt'|'lt', severity,
    monitor_id?, model_id?, cooldown_minutes, enabled) — a small config
    dimension, broadcast. A rule scoped to a monitor/model only matches rows
    with that id (NULL scope matches everything, reference :293-296).

    Returns candidate alerts (threshold crossed only) with the reference's
    dedup key; feed through ``gate_alerts`` for cooldown suppression.
    """
    r = F.broadcast(
        rules.where(F.col("enabled")).select(
            F.col("rule_id").cast("string").alias("_rule_id"),
            F.col("metric").alias("_metric"),
            F.col("threshold").alias("_threshold"),
            F.col("comparison").alias("_comparison"),
            F.col("severity").alias("_severity"),
            F.col("monitor_id").cast("string").alias("_rule_monitor"),
            F.col("model_id").cast("string").alias("_rule_model"),
            F.col("cooldown_minutes").alias("cooldown_minutes"),
        )
    )
    joined = metrics.join(
        r,
        (F.col("metric") == F.col("_metric"))
        & (F.col("_rule_monitor").isNull() | (F.col("_rule_monitor") == F.col("monitor_id")))
        & (F.col("_rule_model").isNull() | (F.col("_rule_model") == F.col("model_id"))),
        "inner",
    )
    crossed = F.when(
        F.col("_comparison") == "gt", F.col("value") > F.col("_threshold")
    ).otherwise(F.col("value") < F.col("_threshold"))
    return joined.where(crossed).select(
        F.col("_rule_id").alias("rule_id"),
        F.col("monitor_id"),
        F.col("model_id"),
        F.col("metric"),
        F.col("value").alias("metric_value"),
        F.col("_threshold").alias("threshold"),
        F.col("_severity").alias("severity"),
        F.col("cooldown_minutes"),
        F.col(ts_col),
        dedup_key(F.col("_rule_id"), F.col("monitor_id"), F.col("metric")).alias(
            "dedup_key"
        ),
        F.format_string(
            "%s crossed threshold: value=%.4f threshold=%.4f",
            F.col("metric"),
            F.col("value").cast("double"),
            F.col("_threshold").cast("double"),
        ).alias("message"),
    )


def escalate_overdue_alerts(
    alerts: DataFrame,
    escalation_timeout_minutes: int = 120,
    now_ts=None,
    ts_col: str = "detected_at",
) -> DataFrame:
    """Escalate unacknowledged WARNING alerts past the timeout.

    Reference alert_system.py:346-383: dispatched + warning + older than the
    timeout -> severity CRITICAL, status 'escalated', message prefixed
    '[ESCALATED] ', escalated_at stamped. Returns exactly the escalated rows
    (append them to the alerts table; the dispatched originals remain as
    history, the idempotent batch analogue of the reference's in-place
    mutation).
    """
    now_expr = F.lit(now_ts).cast("timestamp") if now_ts is not None else F.current_timestamp()
    overdue = (
        (F.col("status") == "dispatched")
        & (F.col("severity") == "warning")
        & F.col(ts_col).isNotNull()
        & (
            F.unix_timestamp(now_expr) - F.unix_timestamp(F.col(ts_col))
            >= escalation_timeout_minutes * 60
        )
    )
    return (
        alerts.where(overdue)
        .withColumn("status", F.lit("escalated"))
        .withColumn("severity", F.lit("critical"))
        .withColumn("escalated_at", now_expr)
        .withColumn("message", F.concat(F.lit("[ESCALATED] "), F.col("message")))
    )


def cooldown_clear(
    trigger_history: DataFrame | None,
    model_col: str = "model_id",
    ts_col: str = "triggered_at",
    cooldown_hours: int = 24,
) -> DataFrame | None:
    """Per-model cooldown state (F8, retrain_trigger.py:521-534).

    Returns (model_id, last_triggered, cooldown_clear boolean) — join this to
    trigger candidates; models never triggered are trivially clear (use a
    left join + coalesce(cooldown_clear, true)).
    """
    if trigger_history is None:
        return None
    return (
        trigger_history.groupBy(model_col)
        .agg(F.max(ts_col).alias("last_triggered"))
        .withColumn(
            "cooldown_clear",
            F.unix_timestamp(F.current_timestamp())
            - F.unix_timestamp(F.col("last_triggered"))
            >= cooldown_hours * 3600,
        )
    )
