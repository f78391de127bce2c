"""Self-contained HTML drift reports (SURVEY S7; reference html_reporter.py).

The reference renders Plotly charts (html_reporter.py:54-114); this sandbox
has no plotly, so the charts render as INLINE SVG built with stdlib string
formatting — the output is a single self-contained file with the same
sections: stat cards (total runs / drift events / clean runs), the drift-score
timeline with drifted points in red, and the per-feature score bars. Zero
dependencies, opens in any browser, no network access needed (stronger than
the reference's CDN mode).
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timezone
from typing import Any, Sequence

_W, _H, _PAD = 720, 240, 40


def _svg_timeline(detections: Sequence[dict]) -> str:
    scores = [float(d.get("score", d.get("mmd_squared", 0.0))) for d in detections]
    if not scores:
        return ""
    lo, hi = min(scores), max(scores)
    span = (hi - lo) or 1.0
    n = len(scores)
    pts = []
    marks = []
    for i, d in enumerate(detections):
        x = _PAD + (i / max(n - 1, 1)) * (_W - 2 * _PAD)
        y = _H - _PAD - ((scores[i] - lo) / span) * (_H - 2 * _PAD)
        pts.append(f"{x:.1f},{y:.1f}")
        color = "#dc3545" if d.get("drift_detected", d.get("is_drifted", False)) else "#4c78a8"
        marks.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" fill="{color}"/>')
    return (
        f'<svg width="{_W}" height="{_H}" role="img" aria-label="drift score timeline">'
        f'<polyline points="{" ".join(pts)}" fill="none" stroke="#9aa5b1" stroke-width="1.5"/>'
        f'{"".join(marks)}'
        f'<text x="{_PAD}" y="16" font-size="13" fill="#333">Drift Score Timeline'
        f' (min {lo:.4g}, max {hi:.4g})</text></svg>'
    )


def _svg_feature_bars(feature_scores: dict[str, dict]) -> str:
    if not feature_scores:
        return ""
    names = list(feature_scores)
    vals = [
        float(v.get("score", v.get("mmd_squared", 0.0)))
        for v in feature_scores.values()
    ]
    hi = max(vals) or 1.0
    bw = (_W - 2 * _PAD) / max(len(names), 1)
    bars = []
    for i, (name, v) in enumerate(zip(names, vals)):
        h = (v / hi) * (_H - 2 * _PAD)
        x = _PAD + i * bw
        y = _H - _PAD - h
        color = (
            "#dc3545"
            if feature_scores[name].get("drift_detected",
                                        feature_scores[name].get("is_drifted", False))
            else "#4c78a8"
        )
        bars.append(
            f'<rect x="{x + 2:.1f}" y="{y:.1f}" width="{bw - 4:.1f}" height="{h:.1f}"'
            f' fill="{color}"/>'
            f'<text x="{x + bw / 2:.1f}" y="{_H - _PAD + 14}" font-size="10"'
            f' text-anchor="middle" fill="#333">{_html.escape(str(name)[:12])}</text>'
        )
    return (
        f'<svg width="{_W}" height="{_H}" role="img" aria-label="per-feature scores">'
        f'{"".join(bars)}'
        f'<text x="{_PAD}" y="16" font-size="13" fill="#333">Per-Feature Drift Scores</text>'
        "</svg>"
    )


def render_html_report(
    monitor_name: str,
    detections: Sequence[dict[str, Any]],
    feature_scores: dict[str, dict[str, Any]] | None = None,
    summary: dict[str, Any] | None = None,
) -> str:
    """Render the reference's report layout (html_reporter.py:118-152).

    ``detections``: dicts with score / drift_detected (or is_drifted) /
    optional timestamp. ``feature_scores``: per-feature result dicts.
    ``summary``: optionally the dict from ``report.build_drift_report`` —
    rendered as a key/value table.
    """
    generated_at = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    total_runs = len(detections)
    drift_count = sum(
        1 for d in detections if d.get("drift_detected", d.get("is_drifted", False))
    )
    drift_cls = "drift" if drift_count > 0 else "ok"

    summary_rows = ""
    if summary:
        cells = "".join(
            f"<tr><td>{_html.escape(str(k))}</td><td>{_html.escape(str(v))}</td></tr>"
            for k, v in summary.items()
        )
        summary_rows = (
            "<h2>Run Summary</h2><table class='kv'>"
            f"{cells}</table>"
        )

    det_rows = "".join(
        "<tr>"
        f"<td>{_html.escape(str(d.get('timestamp', i)))}</td>"
        f"<td>{_html.escape(str(d.get('test', d.get('check', ''))))}</td>"
        f"<td>{float(d.get('score', d.get('mmd_squared', 0.0))):.6g}</td>"
        f"<td class=\"{'drift' if d.get('drift_detected', d.get('is_drifted', False)) else 'ok'}\">"
        f"{bool(d.get('drift_detected', d.get('is_drifted', False)))}</td>"
        "</tr>"
        for i, d in enumerate(detections)
    )

    return f"""<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="UTF-8">
  <meta name="viewport" content="width=device-width, initial-scale=1.0">
  <title>Drift Report: {_html.escape(monitor_name)}</title>
  <style>
    body {{ font-family: -apple-system, sans-serif; margin: 40px; color: #333; }}
    h1 {{ color: #1a1a2e; }}
    .summary {{ display: flex; gap: 24px; margin: 24px 0; }}
    .stat-card {{ background: #f8f9fa; border-radius: 8px; padding: 16px; min-width: 120px; }}
    .stat-value {{ font-size: 2em; font-weight: bold; }}
    .drift {{ color: #dc3545; }}
    .ok {{ color: #28a745; }}
    table {{ border-collapse: collapse; margin: 16px 0; }}
    td, th {{ border: 1px solid #dee2e6; padding: 6px 12px; font-size: 13px; }}
  </style>
</head>
<body>
  <h1>Drift Detection Report: {_html.escape(monitor_name)}</h1>
  <p>Generated: {generated_at}</p>
  <div class="summary">
    <div class="stat-card"><div class="stat-value">{total_runs}</div><div>Total Runs</div></div>
    <div class="stat-card"><div class="stat-value {drift_cls}">{drift_count}</div><div>Drift Events</div></div>
    <div class="stat-card"><div class="stat-value">{total_runs - drift_count}</div><div>Clean Runs</div></div>
  </div>
  {summary_rows}
  {_svg_timeline(detections)}
  {_svg_feature_bars(feature_scores or {})}
  <h2>Detections</h2>
  <table><tr><th>when</th><th>test</th><th>score</th><th>drifted</th></tr>{det_rows}</table>
</body>
</html>"""
