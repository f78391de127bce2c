"""Notification payload parity (alert_system.py:512-650) + dispatch log."""

import json
from datetime import datetime, timezone

import pytest

from aumos_drift_detector_spark.operators.notifications import (
    ChannelConfig,
    Dispatcher,
    email_message,
    pagerduty_payload,
    render_notifications,
    slack_payload,
)

ALERT = {
    "alert_id": "a-1",
    "monitor_id": "m-1",
    "metric": "psi_score",
    "metric_value": 0.3123456,
    "threshold": 0.25,
    "severity": "critical",
    "message": "psi_score crossed threshold: value=0.3123 threshold=0.2500",
    "dedup_key": "dk1",
    "raised_at": datetime(2026, 3, 1, 12, 0, 0, tzinfo=timezone.utc),
}


class TestPayloadShapes:
    def test_slack_reference_fields(self):
        p = slack_payload(ALERT)
        assert p["text"] == ":rotating_light: *AumOS Drift Detector* — CRITICAL"
        att = p["attachments"][0]
        assert att["color"] == "danger"
        titles = [f["title"] for f in att["fields"]]
        assert titles == [
            "Metric", "Observed Value", "Threshold",
            "Monitor ID", "Alert ID", "Message",
        ]
        assert att["fields"][1]["value"] == "0.3123"  # %.4f
        assert att["ts"] == int(ALERT["raised_at"].timestamp())

    def test_email_reference_format(self):
        cfg = ChannelConfig(email_recipients=["ops@x", "ml@x"], email_sender="bot@x")
        m = email_message(ALERT, cfg)
        assert m["subject"] == "[AumOS Drift] CRITICAL — psi_score"
        assert m["to"] == "ops@x, ml@x"
        assert "Observed Value: 0.312346" in m["body"]  # %.6f
        assert "Raised At: 2026-03-01T12:00:00+00:00" in m["body"]
        assert m["body"].endswith(f"Message:\n{ALERT['message']}")

    def test_pagerduty_events_v2(self):
        cfg = ChannelConfig(pagerduty_routing_key="rk")
        p = pagerduty_payload(ALERT, cfg)
        assert p["routing_key"] == "rk"
        assert p["event_action"] == "trigger"
        assert p["dedup_key"] == "dk1"
        assert p["payload"]["source"] == "aumos-drift-detector"
        assert p["payload"]["custom_details"]["metric_value"] == pytest.approx(
            0.3123456
        )


class TestRenderNotifications:
    def test_distributed_rendering_matches_builder(self, spark):
        alerts = spark.createDataFrame(
            [
                ("dk1", "psi_score", 0.31, 0.25, "critical", "m-1", "a-1",
                 "msg one", datetime(2026, 3, 1, 12, 0, 0)),
                ("dk2", "ks_p_value", 0.001, 0.05, "warning", "m-2", "a-2",
                 "msg two", datetime(2026, 3, 1, 13, 0, 0)),
            ],
            "dedup_key string, metric string, metric_value double, "
            "threshold double, severity string, monitor_id string, "
            "alert_id string, message string, detected_at timestamp",
        )
        out = render_notifications(alerts, "slack").toPandas().set_index("dedup_key")
        assert set(out.index) == {"dk1", "dk2"}
        p1 = json.loads(out.loc["dk1", "payload_json"])
        assert p1["attachments"][0]["color"] == "danger"
        assert p1["attachments"][0]["fields"][0]["value"] == "psi_score"

    def test_unknown_channel_raises(self, spark):
        alerts = spark.createDataFrame([("d", "m", 1.0, 0.5, "info", "x", "y", "z",
                                         datetime(2026, 1, 1))],
            "dedup_key string, metric string, metric_value double, threshold double, "
            "severity string, monitor_id string, alert_id string, message string, "
            "detected_at timestamp")
        with pytest.raises(ValueError, match="unknown channel"):
            render_notifications(alerts, "carrier_pigeon")


class TestDispatcher:
    def test_unconfigured_channels_fail_cleanly_in_log(self):
        d = Dispatcher()
        for ch, msg in [
            ("slack", "Slack webhook URL not configured"),
            ("email", "No email recipients configured"),
            ("pagerduty", "PagerDuty routing key not configured"),
        ]:
            entry = d.dispatch(ALERT, ch)
            assert entry["status"] == "failed"
            assert msg in entry["error"]
        assert len(d.log) == 3  # dispatch never raises (reference :499-510)

    def test_plugged_sender_receives_payload(self):
        got = []
        d = Dispatcher(
            ChannelConfig(slack_webhook_url="https://hooks.invalid/x"),
            senders={"slack": got.append},
        )
        entry = d.dispatch(ALERT, "slack")
        assert entry["status"] == "dispatched"
        assert got[0]["attachments"][0]["fields"][5]["value"] == ALERT["message"]

    def test_rendered_without_sender(self):
        d = Dispatcher(ChannelConfig(pagerduty_routing_key="rk"))
        assert d.dispatch(ALERT, "pagerduty")["status"] == "rendered_no_sender"
