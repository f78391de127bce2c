"""Kafka event sink (SURVEY S5; reference adapters/kafka.py:55-162).

The reference publishes three event types per drift run — drift.detected,
drift.retraining_required, drift.alert_raised — each a JSON payload with an
``event_type`` discriminator and ``occurred_at`` stamp. The Spark-first
restatement: pure DataFrame transformations build the exact payload frames
(testable without a broker), and ``write_kafka`` hands them to Spark's
built-in kafka sink (``df.write.format("kafka")``) when a broker is
configured. Streaming callers can pass the same frames to ``writeStream``.

No Kafka client library is required engine-side — the kafka DataSource ships
with Spark; the write fails fast with a clear error if the connector jars or
broker are absent (this sandbox has neither, so the payload builders carry
the test coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# topic names mirror the reference's (kafka.py module constants)
TOPIC_DRIFT_DETECTED = "drift.detected"
TOPIC_RETRAINING_REQUIRED = "drift.retraining_required"
TOPIC_ALERT_RAISED = "drift.alert_raised"


def _payload(event_type: str, fields: dict[str, F.Column]) -> F.Column:
    pairs: list[F.Column] = [F.lit("event_type"), F.lit(event_type)]
    for k, v in fields.items():
        pairs += [F.lit(k), v.cast("string")]
    pairs += [
        F.lit("occurred_at"),
        F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        ),
    ]
    return F.to_json(F.map_from_arrays(
        F.array(*pairs[0::2]), F.array(*pairs[1::2])
    ))


def drift_detected_events(
    results: DataFrame,
    tenant_id: str,
    monitor_id: str,
) -> DataFrame:
    """(key, value, topic) frame for drift.detected — one event per check row,
    published regardless of verdict (reference kafka.py:66-93: consumers
    filter on is_drifted)."""
    value = _payload(
        "drift.detected",
        {
            "tenant_id": F.lit(tenant_id),
            "monitor_id": F.lit(monitor_id),
            "detection_id": F.concat_ws(
                "|", "run_id", "partition_value", "check_name"
            ),
            "test_name": F.col("check_name"),
            "score": F.col("score"),
            "is_drifted": F.col("is_drifted"),
        },
    )
    return results.select(
        F.concat_ws("|", "run_id", "partition_value").alias("key"),
        value.alias("value"),
        F.lit(TOPIC_DRIFT_DETECTED).alias("topic"),
    )


def retraining_required_events(
    trigger_events: DataFrame,
) -> DataFrame:
    """(key, value, topic) frame for drift.retraining_required — one event per
    TRIGGERED trigger-engine row (reference kafka.py:95-129)."""
    fired = trigger_events.where(F.col("triggered"))
    value = _payload(
        "drift.retraining_required",
        {
            "tenant_id": F.col("tenant_id"),
            "monitor_id": F.col("monitor_id"),
            "model_id": F.col("model_id"),
            "detection_id": F.col("detection_id"),
            "reason": F.col("message"),
        },
    )
    return fired.select(
        F.col("model_id").alias("key"),
        value.alias("value"),
        F.lit(TOPIC_RETRAINING_REQUIRED).alias("topic"),
    )


def alert_raised_events(alerts: DataFrame, tenant_id: str) -> DataFrame:
    """(key, value, topic) frame for drift.alert_raised — one event per
    dispatched/escalated alert (reference kafka.py:131-162)."""
    live = alerts.where(F.col("status").isin("dispatched", "escalated"))
    value = _payload(
        "drift.alert_raised",
        {
            "tenant_id": F.lit(tenant_id),
            "alert_id": F.col("alert_id"),
            "severity": F.col("severity"),
            "message": F.col("message"),
        },
    )
    return live.select(
        F.col("alert_id").cast("string").alias("key"),
        value.alias("value"),
        F.lit(TOPIC_ALERT_RAISED).alias("topic"),
    )


def write_kafka(
    events: DataFrame,
    bootstrap_servers: str,
    **options: str,
) -> None:
    """Publish an events frame (key, value, topic columns) to Kafka.

    Batch write; for streaming use ``events.writeStream.format("kafka")`` with
    a checkpoint dir. Requires the spark-sql-kafka connector on the classpath
    and a reachable broker — raises Spark's AnalysisException otherwise.
    """
    (
        events.selectExpr(
            "CAST(key AS STRING) AS key",
            "CAST(value AS STRING) AS value",
            "topic",
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .options(**options)
        .save()
    )
