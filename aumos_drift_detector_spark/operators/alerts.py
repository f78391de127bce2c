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

# p-value tests fire when score < threshold; score-style tests when score >
# (reference retrain_trigger.py:239-244). Comparison strictness follows each
# kernel's own drift verdict: only PSI declares drift on >= (psi.py:181); the
# distance tests (JS/Hellinger/Wasserstein/MMD) use strict >, so a boundary
# score must not fire a retrain signal without a matching drift verdict.
P_VALUE_TESTS = {"ks", "chi_squared", "chi2", "ks_2samp", "anderson_darling"}
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
    """
    if alert_history is None:
        return candidates.withColumn("status", F.lit("dispatched"))
    last_fired = (
        alert_history.where(F.col("status") == "dispatched")
        .groupBy("dedup_key")
        .agg(F.max(ts_col).alias("_last_ts"))
    )
    joined = candidates.join(F.broadcast(last_fired), "dedup_key", "left")
    # per-rule cooldown when the candidates carry one (evaluate_rules path),
    # else the global parameter (alert_system.py:313: rule.cooldown_minutes)
    cd_minutes = (
        F.col("cooldown_minutes")
        if "cooldown_minutes" in candidates.columns
        else F.lit(cooldown_minutes)
    )
    in_cooldown = (
        F.col("_last_ts").isNotNull()
        & (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.col("_last_ts"))
            < cd_minutes * 60
        )
    )
    return joined.withColumn(
        "status", F.when(in_cooldown, "suppressed").otherwise("dispatched")
    ).drop("_last_ts")


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
        for k, v in kwargs.items():
            if k in rule:
                rule[k] = v
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
