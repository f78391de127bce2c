"""Notification-channel payload rendering + pluggable dispatch (SURVEY S4).

The reference dispatches alerts to Slack / email / PagerDuty inline
(alert_system.py:512-650: httpx POST, smtplib, Events-API v2). The network
senders are external I/O and stay OUT of the engine; what the engine owns is
everything up to the socket:

- **payload builders** producing byte-identical shapes to the reference's
  (same keys, same emoji/color maps, same f-string formats),
- ``render_notifications``: fired-alert rows -> (channel, payload_json) rows
  via Arrow-batched ``mapInPandas`` (one source of truth for the shapes,
  distributed over however many alerts fired),
- ``Dispatcher``: per-channel sender callables plug in
  (``{"slack": lambda payload: ...}``); unconfigured channels raise the
  reference's ValueError; every attempt lands in a dispatch log.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SEVERITY_EMOJI = {
    "info": ":information_source:",
    "warning": ":warning:",
    "critical": ":rotating_light:",
}
_SEVERITY_COLOR = {"info": "good", "warning": "warning", "critical": "danger"}


@dataclass
class ChannelConfig:
    """Mirror of the reference's AlertChannelConfig (alert_system.py:160-183)."""

    slack_webhook_url: str = ""
    email_smtp_host: str = ""
    email_smtp_port: int = 587
    email_smtp_username: str = ""
    email_smtp_password: str = ""
    email_sender: str = "alerts@example.invalid"
    email_recipients: list[str] = field(default_factory=list)
    pagerduty_routing_key: str = ""
    pagerduty_api_url: str = "https://events.pagerduty.com/v2/enqueue"
    http_timeout_seconds: float = 10.0


def slack_payload(alert: dict[str, Any]) -> dict:
    """Slack webhook body — reference alert_system.py:525-545 field-for-field."""
    sev = str(alert.get("severity", "warning"))
    emoji = _SEVERITY_EMOJI.get(sev, ":bell:")
    raised_at = alert.get("raised_at")
    ts = int(raised_at.timestamp()) if isinstance(raised_at, datetime) else 0
    return {
        "text": f"{emoji} *AumOS Drift Detector* — {sev.upper()}",
        "attachments": [
            {
                "color": _SEVERITY_COLOR.get(sev, "warning"),
                "fields": [
                    {"title": "Metric", "value": alert["metric"], "short": True},
                    {
                        "title": "Observed Value",
                        "value": f"{float(alert['metric_value']):.4f}",
                        "short": True,
                    },
                    {
                        "title": "Threshold",
                        "value": f"{float(alert['threshold']):.4f}",
                        "short": True,
                    },
                    {
                        "title": "Monitor ID",
                        "value": str(alert.get("monitor_id")),
                        "short": True,
                    },
                    {
                        "title": "Alert ID",
                        "value": str(alert.get("alert_id")),
                        "short": False,
                    },
                    {
                        "title": "Message",
                        "value": str(alert.get("message", "")),
                        "short": False,
                    },
                ],
                "ts": ts,
            }
        ],
    }


def email_message(alert: dict[str, Any], config: ChannelConfig) -> dict:
    """Subject/body/headers — reference alert_system.py:571-590 formats."""
    sev = str(alert.get("severity", "warning"))
    raised_at = alert.get("raised_at")
    raised_iso = (
        raised_at.isoformat() if isinstance(raised_at, datetime) else str(raised_at)
    )
    return {
        "subject": f"[AumOS Drift] {sev.upper()} — {alert['metric']}",
        "from": config.email_sender,
        "to": ", ".join(config.email_recipients),
        "body": (
            f"AumOS Drift Detector Alert\n\n"
            f"Severity: {sev.upper()}\n"
            f"Metric: {alert['metric']}\n"
            f"Observed Value: {float(alert['metric_value']):.6f}\n"
            f"Threshold: {float(alert['threshold']):.6f}\n"
            f"Monitor ID: {alert.get('monitor_id')}\n"
            f"Alert ID: {alert.get('alert_id')}\n"
            f"Raised At: {raised_iso}\n\n"
            f"Message:\n{alert.get('message', '')}"
        ),
    }


def pagerduty_payload(alert: dict[str, Any], config: ChannelConfig) -> dict:
    """Events-API v2 body — reference alert_system.py:622-641 field-for-field."""
    raised_at = alert.get("raised_at")
    raised_iso = (
        raised_at.isoformat() if isinstance(raised_at, datetime) else str(raised_at)
    )
    return {
        "routing_key": config.pagerduty_routing_key,
        "event_action": "trigger",
        "dedup_key": str(alert.get("dedup_key")),
        "payload": {
            "summary": str(alert.get("message", "")),
            "severity": str(alert.get("severity", "warning")),
            "source": "aumos-drift-detector",
            "timestamp": raised_iso,
            "custom_details": {
                "alert_id": str(alert.get("alert_id")),
                "monitor_id": str(alert.get("monitor_id")),
                "metric": alert["metric"],
                "metric_value": float(alert["metric_value"]),
                "threshold": float(alert["threshold"]),
            },
        },
    }


_RENDER_SCHEMA = T.StructType(
    [
        T.StructField("dedup_key", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("payload_json", T.StringType()),
    ]
)


def render_notifications(
    alerts: DataFrame,
    channel: str = "slack",
    config: ChannelConfig | None = None,
    ts_col: str = "detected_at",
) -> DataFrame:
    """Fired-alert rows -> (dedup_key, channel, payload_json) rows.

    Runs the SAME pure builders the driver-side dispatcher uses, inside
    Arrow-batched ``mapInPandas`` — payload rendering parallelizes with the
    alert rows and the shapes have one definition.
    """
    cfg = config or ChannelConfig()
    builders: dict[str, Callable[[dict], dict]] = {
        "slack": slack_payload,
        "email": lambda a: email_message(a, cfg),
        "pagerduty": lambda a: pagerduty_payload(a, cfg),
        "internal": lambda a: {k: str(v) for k, v in a.items()},
    }
    if channel not in builders:
        raise ValueError(f"unknown channel {channel!r}")
    build = builders[channel]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                rec = dict(rec)
                rec.setdefault("raised_at", rec.get(ts_col))
                rows.append(
                    (
                        str(rec.get("dedup_key")),
                        channel,
                        json.dumps(build(rec), default=str),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["dedup_key", "channel", "payload_json"]
            )

    return alerts.mapInPandas(run, _RENDER_SCHEMA)


class Dispatcher:
    """Driver-side dispatch over gated alerts with pluggable senders.

    ``senders``: per-channel callables receiving the rendered payload
    (the httpx/smtplib halves of alert_system.py:512-650 — injected, never
    bundled). Unconfigured channels raise the reference's ValueError text;
    every attempt is appended to ``log``.
    """

    def __init__(
        self,
        config: ChannelConfig | None = None,
        senders: dict[str, Callable[[dict], None]] | None = None,
    ) -> None:
        self.config = config or ChannelConfig()
        self.senders = senders or {}
        self.log: list[dict] = []

    def _require(self, channel: str) -> None:
        cfg = self.config
        if channel == "slack" and not cfg.slack_webhook_url:
            raise ValueError("Slack webhook URL not configured in AlertChannelConfig")
        if channel == "email" and not cfg.email_recipients:
            raise ValueError("No email recipients configured in AlertChannelConfig")
        if channel == "pagerduty" and not cfg.pagerduty_routing_key:
            raise ValueError(
                "PagerDuty routing key not configured in AlertChannelConfig"
            )

    def dispatch(self, alert: dict[str, Any], channel: str) -> dict:
        entry = {
            "dedup_key": str(alert.get("dedup_key")),
            "channel": channel,
            "dispatched_at": datetime.now(tz=timezone.utc).isoformat(),
            "status": "dispatched",
            "error": None,
        }
        try:
            self._require(channel)
            payload = {
                "slack": lambda: slack_payload(alert),
                "email": lambda: email_message(alert, self.config),
                "pagerduty": lambda: pagerduty_payload(alert, self.config),
                "internal": lambda: dict(alert),
            }[channel]()
            sender = self.senders.get(channel)
            if sender is None:
                entry["status"] = "rendered_no_sender"
            else:
                sender(payload)
        except Exception as e:  # log, never crash the engine (reference :499-510)
            entry["status"] = "failed"
            entry["error"] = f"{type(e).__name__}: {e}"
        self.log.append(entry)
        return entry
