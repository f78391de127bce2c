"""Retrain-trigger policy engine (reference adapters/retrain_trigger.py:197-493).

Batch restatement of the reference's async per-event evaluator: trigger
evaluation is a DataFrame transformation over a detections/metrics table
joined with a broadcast policy dimension and the persisted trigger-history
table. The reference's in-process ``_last_triggered`` dict becomes the
history table itself (max triggered_at per model), so evaluation is
idempotent and cluster-safe.

Semantics parity (retrain_trigger.py):
- direction-aware threshold: p-value tests fire when score < threshold,
  score tests when score > threshold (:239-244). The p-value set is
  ``kernels.P_VALUE_TESTS`` (includes chi_squared / anderson_darling, which
  the reference's hard-coded tuple misses — documented reference-bug fix)
- outcomes: triggered | suppressed_threshold | suppressed_cooldown |
  suppressed_disabled, each with the reference's message text (:224-310)
- cooldown: a model triggers at most once per ``cooldown_hours``; within one
  evaluation batch the EARLIEST crossing event triggers and later crossings
  inside its cooldown window are suppressed (the sequential semantics of the
  reference's event loop), resolved per-model in an ``applyInPandas`` group —
  models are many, events per model per batch are few, so the sequential
  part is embarrassingly parallel across models  (:264-296, :521-534)
- scheduled triggers fire when now - last_trigger >= interval  (:419-492)
- performance triggers fire on accuracy < floor or rmse > ceiling (:312-417)

Every evaluated event is returned (suppressed included) — appending the
output to the history table reproduces the reference's full trigger history
(:494-515).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference hard-codes ("ks", "chi2", "ks_2samp")
# (retrain_trigger.py:240), which misses the very names its own chi-squared
# and AD kernels emit — a drifted chi_squared detection (tiny p-value) would
# take the score>threshold branch and be SUPPRESSED while a non-drifted one
# fires. We use the kernel-level registry (a superset that includes the
# reference's strings) so every engine-emitted p-value test routes to the
# inverted comparison. Documented deviation (reference-bug fix).
from aumos_drift_detector_spark.functions.kernels import (  # noqa: E402
    P_VALUE_TESTS,
)

TRIGGER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("monitor_id", T.StringType()),
        T.StructField("model_id", T.StringType()),
        T.StructField("detection_id", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("triggered", T.BooleanType()),
        T.StructField("drift_score", T.DoubleType()),
        T.StructField("test_name", T.StringType()),
        T.StructField("evaluated_at", T.TimestampType()),
        # the TRIGGER-time clock (detection time for drift triggers, `now`
        # for performance/scheduled), NULL on suppressed rows. Cooldown
        # comparisons read this column, NOT evaluated_at: a backfilled
        # batch evaluates old detections with a late evaluated_at, and
        # mixing the two clocks would make outcomes depend on how events
        # were batched (round-3 review).
        T.StructField("triggered_at", T.TimestampType()),
        T.StructField("message", T.StringType()),
    ]
)


@dataclass(frozen=True)
class TriggerPolicy:
    """Per-model trigger policy (reference retrain_trigger.py:50-74)."""

    drift_score_threshold: float = 0.25
    performance_accuracy_threshold: float | None = None
    performance_rmse_threshold: float | None = None
    cooldown_hours: int = 24
    scheduled_interval_hours: int = 0
    enabled: bool = True


class RetrainTriggerEngine:
    """Distributed trigger evaluation with per-model policies.

    ``configure_policy`` registers per-model overrides (driver-side config,
    broadcast at evaluation time — the Spark analogue of the reference's
    ``_policies`` dict, retrain_trigger.py:163-195).
    """

    def __init__(self, default_policy: TriggerPolicy | None = None) -> None:
        self._default = default_policy or TriggerPolicy()
        self._policies: dict[str, TriggerPolicy] = {}

    def configure_policy(self, model_id: str, policy: TriggerPolicy) -> None:
        self._policies[str(model_id)] = policy

    def get_policy(self, model_id: str) -> TriggerPolicy:
        return self._policies.get(str(model_id), self._default)

    # -- policy dimension -----------------------------------------------------

    def _policy_df(self, spark: SparkSession, model_ids_df: DataFrame) -> DataFrame:
        """Broadcastable (model_id -> effective policy) dimension.

        Models without an explicit policy get the default via a left join +
        coalesce, so unseen model_ids still evaluate (reference get_policy).
        """
        d = self._default
        rows = [
            (
                m,
                p.drift_score_threshold,
                p.performance_accuracy_threshold,
                p.performance_rmse_threshold,
                p.cooldown_hours,
                p.scheduled_interval_hours,
                p.enabled,
            )
            for m, p in self._policies.items()
        ]
        schema = T.StructType(
            [
                T.StructField("model_id", T.StringType()),
                T.StructField("drift_score_threshold", T.DoubleType()),
                T.StructField("performance_accuracy_threshold", T.DoubleType()),
                T.StructField("performance_rmse_threshold", T.DoubleType()),
                T.StructField("cooldown_hours", T.IntegerType()),
                T.StructField("scheduled_interval_hours", T.IntegerType()),
                T.StructField("enabled", T.BooleanType()),
            ]
        )
        overrides = spark.createDataFrame(rows, schema)
        return (
            model_ids_df.select(F.col("model_id").cast("string")).distinct()
            .join(F.broadcast(overrides), "model_id", "left")
            .select(
                "model_id",
                F.coalesce("drift_score_threshold", F.lit(d.drift_score_threshold)).alias(
                    "drift_score_threshold"
                ),
                F.coalesce(
                    "performance_accuracy_threshold",
                    F.lit(d.performance_accuracy_threshold),
                ).alias("performance_accuracy_threshold"),
                F.coalesce(
                    "performance_rmse_threshold", F.lit(d.performance_rmse_threshold)
                ).alias("performance_rmse_threshold"),
                F.coalesce("cooldown_hours", F.lit(d.cooldown_hours)).alias(
                    "cooldown_hours"
                ),
                F.coalesce(
                    "scheduled_interval_hours", F.lit(d.scheduled_interval_hours)
                ).alias("scheduled_interval_hours"),
                F.coalesce("enabled", F.lit(d.enabled)).alias("enabled"),
            )
        )

    @staticmethod
    def _last_triggered(history: DataFrame | None) -> DataFrame | None:
        if history is None:
            return None
        cols = set(history.columns)
        # triggered_at is the consistent cooldown clock; fall back to
        # evaluated_at for histories written before the column existed
        clock = (
            F.coalesce(F.col("triggered_at"), F.col("evaluated_at"))
            if "triggered_at" in cols
            else F.col("evaluated_at")
        )
        return (
            history.where(F.col("triggered"))
            .groupBy("model_id")
            .agg(F.max(clock).alias("last_triggered"))
        )

    # -- drift triggers --------------------------------------------------------

    def evaluate_drift_triggers(
        self,
        detections: DataFrame,
        history: DataFrame | None = None,
        now: datetime | None = None,
    ) -> DataFrame:
        """Evaluate drift detections (one TriggerEvent row per detection).

        ``detections`` columns: tenant_id, monitor_id, model_id, detection_id,
        drift_score, test_name, and an event-time column ``detected_at`` used
        to order same-model events (reference evaluates them sequentially).
        """
        spark = detections.sparkSession
        now = now or datetime.now(tz=timezone.utc)
        pol = self._policy_df(spark, detections)
        joined = detections.withColumn(
            "model_id", F.col("model_id").cast("string")
        ).join(F.broadcast(pol), "model_id", "left")

        last = self._last_triggered(history)
        if last is not None:
            joined = joined.join(F.broadcast(last), "model_id", "left")
        else:
            joined = joined.withColumn("last_triggered", F.lit(None).cast("timestamp"))

        crossed = F.when(
            F.col("test_name").isin(*P_VALUE_TESTS),
            F.col("drift_score") < F.col("drift_score_threshold"),
        ).otherwise(F.col("drift_score") > F.col("drift_score_threshold"))
        pre = joined.select(
            "*",
            crossed.alias("_crossed"),
        )

        def resolve(pdf: pd.DataFrame) -> pd.DataFrame:
            """Sequential per-model cooldown resolution (tiny group)."""
            pdf = pdf.sort_values("detected_at", kind="mergesort")
            out = []
            last_trig = pdf["last_triggered"].iloc[0]
            last_trig = None if pd.isna(last_trig) else last_trig.to_pydatetime()
            for _, r in pdf.iterrows():
                thr = float(r["drift_score_threshold"])
                score = float(r["drift_score"])
                cd = pd.Timedelta(hours=int(r["cooldown_hours"]))
                ts = r["detected_at"].to_pydatetime()
                if not bool(r["enabled"]):
                    outcome, trig = "suppressed_disabled", False
                    msg = f"Trigger disabled by policy for model {r['model_id']}."
                elif not bool(r["_crossed"]):
                    outcome, trig = "suppressed_threshold", False
                    msg = (
                        f"{r['test_name']} score {score:.4f} did not cross "
                        f"trigger threshold {thr:.4f}."
                    )
                elif last_trig is not None and (ts - last_trig) < cd:
                    outcome, trig = "suppressed_cooldown", False
                    msg = (
                        f"Cooldown active — last trigger at "
                        f"{last_trig.isoformat()}, cooldown={int(r['cooldown_hours'])}h."
                    )
                else:
                    outcome, trig = "triggered", True
                    reason = (
                        f"{r['test_name']} drift score {score:.4f} crossed "
                        f"threshold {thr:.4f}"
                    )
                    msg = f"Retraining triggered: {reason}."
                    last_trig = ts
                out.append(
                    dict(
                        event_id=f"{r['model_id']}|{r['detection_id']}",
                        tenant_id=r["tenant_id"],
                        monitor_id=r["monitor_id"],
                        model_id=r["model_id"],
                        detection_id=r["detection_id"],
                        reason="drift_score",
                        outcome=outcome,
                        triggered=trig,
                        drift_score=score,
                        test_name=r["test_name"],
                        evaluated_at=now,
                        triggered_at=ts if trig else None,
                        message=msg,
                    )
                )
            return pd.DataFrame(out, columns=[f.name for f in TRIGGER_EVENT_SCHEMA])

        return pre.groupBy("model_id").applyInPandas(resolve, TRIGGER_EVENT_SCHEMA)

    # -- performance triggers ---------------------------------------------------

    def evaluate_performance_triggers(
        self,
        metrics: DataFrame,
        history: DataFrame | None = None,
        now: datetime | None = None,
        ts_col: str = "measured_at",
    ) -> DataFrame:
        """Evaluate (model_id, accuracy?, rmse?) metric rows (:312-417).

        One event row per input; RMSE breach takes message precedence over
        accuracy when both cross, matching the reference's sequential
        overwrite. Within-batch cooldown resolves SEQUENTIALLY per model
        (same applyInPandas shape as the drift path): even when every metric
        row crosses, a model triggers at most once per ``cooldown_hours``
        and event_ids stay unique. Rows order by ``ts_col`` when the input
        has it; otherwise every row carries ``now`` and ordering within the
        batch is arbitrary-but-stable (the at-most-once guarantee holds
        either way).
        """
        spark = metrics.sparkSession
        now = now or datetime.now(tz=timezone.utc)
        pol = self._policy_df(spark, metrics)
        has_ts = ts_col in metrics.columns
        joined = metrics.withColumn(
            "model_id", F.col("model_id").cast("string")
        ).join(F.broadcast(pol), "model_id", "left")
        if not has_ts:
            joined = joined.withColumn(ts_col, F.lit(now))
        last = self._last_triggered(history)
        if last is not None:
            joined = joined.join(F.broadcast(last), "model_id", "left")
        else:
            joined = joined.withColumn("last_triggered", F.lit(None).cast("timestamp"))

        def resolve(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            out = []
            last_trig = pdf["last_triggered"].iloc[0]
            last_trig = None if pd.isna(last_trig) else last_trig.to_pydatetime()
            for i, r in pdf.iterrows():
                acc = r.get("accuracy")
                rmse = r.get("rmse")
                acc_thr = r["performance_accuracy_threshold"]
                rmse_thr = r["performance_rmse_threshold"]
                acc_bad = (
                    acc is not None and not pd.isna(acc)
                    and acc_thr is not None and not pd.isna(acc_thr)
                    and float(acc) < float(acc_thr)
                )
                rmse_bad = (
                    rmse is not None and not pd.isna(rmse)
                    and rmse_thr is not None and not pd.isna(rmse_thr)
                    and float(rmse) > float(rmse_thr)
                )
                ts = r[ts_col].to_pydatetime()
                cd = pd.Timedelta(hours=int(r["cooldown_hours"]))
                if not bool(r["enabled"]):
                    outcome, msg = "suppressed_disabled", "Trigger disabled by policy."
                elif not (acc_bad or rmse_bad):
                    outcome, msg = (
                        "suppressed_threshold",
                        "Performance within acceptable range.",
                    )
                elif last_trig is not None and (ts - last_trig) < cd:
                    outcome, msg = "suppressed_cooldown", "Cooldown active."
                else:
                    outcome = "triggered"
                    reason = (
                        f"RMSE {float(rmse):.4f} above threshold {float(rmse_thr):.4f}"
                        if rmse_bad
                        else f"Accuracy {float(acc):.4f} below threshold {float(acc_thr):.4f}"
                    )
                    msg = f"Retraining triggered by performance: {reason}."
                    last_trig = ts
                out.append(
                    dict(
                        event_id=f"{r['model_id']}|performance|{i}",
                        tenant_id=r["tenant_id"],
                        monitor_id=r["monitor_id"],
                        model_id=r["model_id"],
                        detection_id=None,
                        reason="performance_degradation",
                        outcome=outcome,
                        triggered=outcome == "triggered",
                        drift_score=0.0,
                        test_name="performance",
                        evaluated_at=now,
                        triggered_at=ts if outcome == "triggered" else None,
                        message=msg,
                    )
                )
            return pd.DataFrame(out, columns=[f.name for f in TRIGGER_EVENT_SCHEMA])

        return joined.groupBy("model_id").applyInPandas(
            resolve, TRIGGER_EVENT_SCHEMA
        )

    # -- scheduled triggers -------------------------------------------------------

    def evaluate_scheduled_triggers(
        self,
        models: DataFrame,
        history: DataFrame | None = None,
        now: datetime | None = None,
    ) -> DataFrame:
        """Periodic retraining evaluation per model row (:419-492)."""
        spark = models.sparkSession
        now = now or datetime.now(tz=timezone.utc)
        pol = self._policy_df(spark, models)
        joined = models.withColumn(
            "model_id", F.col("model_id").cast("string")
        ).join(F.broadcast(pol), "model_id", "left")
        last = self._last_triggered(history)
        if last is not None:
            joined = joined.join(F.broadcast(last), "model_id", "left")
        else:
            joined = joined.withColumn("last_triggered", F.lit(None).cast("timestamp"))

        disabled = ~F.col("enabled") | (F.col("scheduled_interval_hours") <= 0)
        due = F.col("last_triggered").isNull() | (
            F.unix_timestamp(F.lit(now)) - F.unix_timestamp(F.col("last_triggered"))
            >= F.col("scheduled_interval_hours") * 3600
        )
        next_at = F.date_format(
            F.timestamp_seconds(
                F.unix_timestamp(F.col("last_triggered"))
                + F.col("scheduled_interval_hours") * 3600
            ),
            "yyyy-MM-dd'T'HH:mm:ssXXX",
        )
        outcome = (
            F.when(disabled, "suppressed_disabled")
            .when(~due, "suppressed_cooldown")
            .otherwise("triggered")
        )
        message = (
            F.when(disabled, F.lit("Scheduled retraining not enabled in policy."))
            .when(~due, F.concat(F.lit("Next scheduled trigger at "), next_at, F.lit(".")))
            .otherwise(
                F.format_string(
                    "Scheduled retraining triggered (interval=%dh).",
                    F.col("scheduled_interval_hours"),
                )
            )
        )
        return joined.select(
            F.concat_ws("|", "model_id", F.lit("scheduled")).alias("event_id"),
            F.col("tenant_id").cast("string"),
            F.col("monitor_id").cast("string"),
            "model_id",
            F.lit(None).cast("string").alias("detection_id"),
            F.lit("scheduled").alias("reason"),
            outcome.alias("outcome"),
            (outcome == "triggered").alias("triggered"),
            F.lit(0.0).alias("drift_score"),
            F.lit("schedule").alias("test_name"),
            F.lit(now).alias("evaluated_at"),
            F.when(outcome == "triggered", F.lit(now))
            .otherwise(F.lit(None).cast("timestamp"))
            .alias("triggered_at"),
            message.alias("message"),
        )


def trigger_history(
    history: DataFrame,
    model_id: str | None = None,
    triggered_only: bool = False,
    limit: int = 100,
) -> DataFrame:
    """Filtered newest-first trigger history (reference :494-515)."""
    out = history
    if model_id is not None:
        out = out.where(F.col("model_id") == str(model_id))
    if triggered_only:
        out = out.where(F.col("triggered"))
    return out.orderBy(F.desc("evaluated_at")).limit(limit)
