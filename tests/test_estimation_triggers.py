"""CBPE / DLE estimation + retrain-trigger engine + alert escalation tests.

Behavioral mirrors of reference adapters/cbpe.py, dle.py, retrain_trigger.py,
alert_system.py (the reference ships no unit tests for these adapters, so the
assertions here encode their documented semantics: calibrated estimates track
true accuracy, outcomes/cooldowns/messages match the reference's state
machine, escalation promotes overdue warnings).
"""

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators import alerts
from aumos_drift_detector_spark.operators.estimation import (
    CBPEEstimator,
    DLEEstimator,
    _pav_isotonic,
)
from aumos_drift_detector_spark.operators.triggers import (
    RetrainTriggerEngine,
    TriggerPolicy,
    trigger_history,
)


def _mk_prob_df(spark, rng, n, miscal=0.15, n_classes=3, label_from_probs=True):
    """Synthetic classifier output: confidence c, correct w.p. clip(c - miscal)."""
    conf = rng.uniform(0.4, 0.99, n)
    correct = rng.random(n) < np.clip(conf - miscal, 0.05, 0.98)
    rows = []
    for c, ok in zip(conf, correct):
        rest = (1.0 - c) * rng.dirichlet(np.ones(n_classes - 1))
        probs = np.concatenate([[c], rest])
        order = rng.permutation(n_classes)
        probs = probs[order]
        pred = int(np.argmax(probs))
        label = pred if ok else int((pred + 1) % n_classes)
        rows.append((probs.tolist(), label))
    return (
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["probabilities", "label"])
        ),
        float(np.mean(correct)),
    )


class TestCBPE:
    def test_isotonic_estimates_true_accuracy(self, spark):
        rng = np.random.default_rng(42)
        ref, _ = _mk_prob_df(spark, rng, 4000)
        prod, prod_acc = _mk_prob_df(spark, rng, 3000)
        est = CBPEEstimator(metric="accuracy").fit(ref)
        out = est.estimate(prod)
        assert out["method"] == "cbpe"
        assert out["metric"] == "accuracy"
        assert out["n_samples"] == 3000
        # same generating process -> calibrated estimate tracks true accuracy
        assert abs(out["estimated_value"] - prod_acc) < 0.05
        ci = out["confidence_interval_95"]
        assert ci["lower"] <= out["estimated_value"] <= ci["upper"]
        assert ci["upper"] - ci["lower"] < 0.2

    def test_sigmoid_method(self, spark):
        rng = np.random.default_rng(1)
        ref, _ = _mk_prob_df(spark, rng, 3000)
        prod, prod_acc = _mk_prob_df(spark, rng, 2000)
        out = CBPEEstimator(calibration_method="sigmoid").fit(ref).estimate(prod)
        assert abs(out["estimated_value"] - prod_acc) < 0.07

    def test_detects_degradation(self, spark):
        # production with much lower confidence -> estimate must drop
        rng = np.random.default_rng(7)
        ref, _ = _mk_prob_df(spark, rng, 3000, miscal=0.1)
        good, acc_good = _mk_prob_df(spark, rng, 2000, miscal=0.1)
        est = CBPEEstimator().fit(ref)
        hi = est.estimate(good)["estimated_value"]
        # degraded production: confidences shifted down
        bad = good.select(
            F.transform(
                "probabilities",
                lambda p: p * 0.5 + F.lit(1.0 / 6),
            ).alias("probabilities")
        )
        lo = est.estimate(bad)["estimated_value"]
        assert lo < hi - 0.05

    def test_deterministic(self, spark):
        rng = np.random.default_rng(3)
        ref, _ = _mk_prob_df(spark, rng, 1000)
        prod, _ = _mk_prob_df(spark, rng, 800)
        est = CBPEEstimator().fit(ref)
        a, b = est.estimate(prod), est.estimate(prod)
        assert a == b

    def test_requires_fit(self, spark):
        rng = np.random.default_rng(0)
        prod, _ = _mk_prob_df(spark, rng, 10)
        with pytest.raises(RuntimeError, match="fit"):
            CBPEEstimator().estimate(prod)

    def test_bad_method_rejected(self):
        with pytest.raises(ValueError):
            CBPEEstimator(calibration_method="spline")

    def test_pav_kernel(self):
        # textbook PAV: pooled means are monotone and weight-preserving
        x = np.array([0.1, 0.2, 0.3, 0.4])
        y_sum = np.array([8.0, 2.0, 6.0, 9.0])   # rates .8, .2, .6, .9
        w = np.array([10.0, 10.0, 10.0, 10.0])
        fit = _pav_isotonic(x, y_sum, w)
        assert (np.diff(fit) >= -1e-12).all()
        # total mass conserved: sum(fit*w) == sum(y)
        assert np.dot(fit, w) == pytest.approx(y_sum.sum())
        # .8 > .2 violation pools the first two to .5; .6 and .9 stand
        assert fit.tolist() == pytest.approx([0.5, 0.5, 0.6, 0.9])


class TestDLE:
    def _mk(self, spark, rng, n, shift=0.0):
        # loss structurally depends on feature[0]: high x0 -> wrong, confident
        x0 = rng.uniform(0, 1, n) + shift
        x1 = rng.uniform(0, 1, n)
        p_correct = np.clip(1.0 - x0 * 0.8, 0.05, 0.95)
        rows = []
        for a, b, pc in zip(x0, x1, p_correct):
            correct = rng.random() < pc
            probs = [0.7, 0.3] if correct else [0.3, 0.7]
            rows.append(([float(a), float(b)], 0, probs))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["features", "label", "probabilities"])
        )

    def test_estimates_higher_loss_on_shifted_production(self, spark):
        rng = np.random.default_rng(42)
        ref = self._mk(spark, rng, 1500)
        est = DLEEstimator(n_estimators=15).fit(ref)
        prod_same = self._mk(spark, rng, 800)
        prod_shift = self._mk(spark, rng, 800, shift=0.5)
        out_same = est.estimate(prod_same)
        out_shift = est.estimate(prod_shift)
        assert out_same["method"] == "dle"
        assert out_same["loss_function"] == "log_loss"
        assert out_shift["estimated_loss"] > out_same["estimated_loss"]
        assert out_same["n_samples"] == 800

    def test_loss_columns_match_numpy(self, spark):
        from aumos_drift_detector_spark.operators.estimation import _per_sample_loss

        pdf = pd.DataFrame(
            {
                "probabilities": [[0.9, 0.1], [0.2, 0.8], [0.5, 0.5]],
                "label": [0, 0, 1],
            }
        )
        df = spark.createDataFrame(pdf)
        for lf, want in [
            ("log_loss", [-np.log(0.9), -np.log(0.2), -np.log(0.5)]),
            ("absolute_error", [0.0, 1.0, 1.0]),
            ("squared_error", [0.0, 1.0, 1.0]),
        ]:
            got = [
                r["l"]
                for r in df.select(
                    _per_sample_loss(lf, "probabilities", "label").alias("l")
                ).collect()
            ]
            assert got == pytest.approx(want)

    def test_requires_fit(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"features": [[0.1]]}))
        with pytest.raises(RuntimeError, match="fit"):
            DLEEstimator().estimate(df)

    def test_bad_loss_rejected(self):
        with pytest.raises(ValueError):
            DLEEstimator(loss_function="hinge")


NOW = datetime(2026, 8, 16, 12, 0, 0, tzinfo=timezone.utc)


class TestRetrainTriggers:
    def _detections(self, spark, rows):
        return spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=[
                    "tenant_id", "monitor_id", "model_id", "detection_id",
                    "drift_score", "test_name", "detected_at",
                ],
            )
        )

    def test_psi_crosses_and_triggers(self, spark):
        eng = RetrainTriggerEngine()
        eng.configure_policy("m1", TriggerPolicy(drift_score_threshold=0.3))
        det = self._detections(
            spark, [("t", "mon", "m1", "d1", 0.45, "psi", NOW)]
        )
        out = eng.evaluate_drift_triggers(det, now=NOW).collect()
        assert len(out) == 1
        e = out[0]
        assert e["triggered"] is True
        assert e["outcome"] == "triggered"
        assert "psi drift score 0.4500 crossed threshold 0.3000" in e["message"]

    def test_p_value_direction(self, spark):
        eng = RetrainTriggerEngine(TriggerPolicy(drift_score_threshold=0.05))
        det = self._detections(
            spark,
            [
                ("t", "mon", "m1", "d1", 0.01, "ks", NOW),   # fires (p < thr)
                ("t", "mon", "m2", "d2", 0.20, "ks", NOW),   # suppressed
            ],
        )
        out = {r["model_id"]: r for r in eng.evaluate_drift_triggers(det, now=NOW).collect()}
        assert out["m1"]["outcome"] == "triggered"
        assert out["m2"]["outcome"] == "suppressed_threshold"
        assert "did not cross trigger threshold" in out["m2"]["message"]

    def test_disabled_policy(self, spark):
        eng = RetrainTriggerEngine()
        eng.configure_policy("m1", TriggerPolicy(enabled=False))
        det = self._detections(spark, [("t", "mon", "m1", "d1", 0.9, "psi", NOW)])
        e = eng.evaluate_drift_triggers(det, now=NOW).collect()[0]
        assert e["outcome"] == "suppressed_disabled"
        assert not e["triggered"]

    def test_cooldown_from_history(self, spark):
        eng = RetrainTriggerEngine(TriggerPolicy(cooldown_hours=24))
        hist = spark.createDataFrame(
            pd.DataFrame(
                {
                    "model_id": ["m1"],
                    "triggered": [True],
                    "evaluated_at": [NOW - timedelta(hours=2)],
                }
            )
        )
        det = self._detections(spark, [("t", "mon", "m1", "d1", 0.9, "psi", NOW)])
        e = eng.evaluate_drift_triggers(det, history=hist, now=NOW).collect()[0]
        assert e["outcome"] == "suppressed_cooldown"
        assert "Cooldown active" in e["message"]
        # cooldown elapsed -> triggers
        hist2 = hist.withColumn(
            "evaluated_at", F.lit(NOW - timedelta(hours=25))
        )
        e2 = eng.evaluate_drift_triggers(det, history=hist2, now=NOW).collect()[0]
        assert e2["outcome"] == "triggered"

    def test_in_batch_sequential_cooldown(self, spark):
        # two crossings for one model in one batch: earliest triggers, the
        # second (within cooldown of the first) is suppressed — the
        # reference's sequential event-loop semantics
        eng = RetrainTriggerEngine(TriggerPolicy(cooldown_hours=24))
        det = self._detections(
            spark,
            [
                ("t", "mon", "m1", "d2", 0.8, "psi", NOW + timedelta(hours=1)),
                ("t", "mon", "m1", "d1", 0.9, "psi", NOW),
                ("t", "mon", "m1", "d3", 0.7, "psi", NOW + timedelta(hours=30)),
            ],
        )
        out = {r["detection_id"]: r for r in eng.evaluate_drift_triggers(det, now=NOW).collect()}
        assert out["d1"]["outcome"] == "triggered"       # earliest
        assert out["d2"]["outcome"] == "suppressed_cooldown"
        assert out["d3"]["outcome"] == "triggered"       # past cooldown

    def test_chi_squared_routes_to_p_value_branch(self, spark):
        """The engine's own kernels emit test='chi_squared' (and
        'anderson_darling'); the reference's hard-coded ('ks','chi2',
        'ks_2samp') would invert their trigger direction — a drifted
        chi-squared (tiny p) must TRIGGER, a non-drifted one (p~1) must not
        (round-3 review; documented reference-bug fix)."""
        eng = RetrainTriggerEngine(TriggerPolicy(drift_score_threshold=0.05))
        det = self._detections(
            spark,
            [
                ("t", "mon", "mA", "d1", 0.001, "chi_squared", NOW),   # drifted
                ("t", "mon", "mB", "d2", 0.9, "chi_squared", NOW),     # not
                ("t", "mon", "mC", "d3", 0.001, "anderson_darling", NOW),
            ],
        )
        out = {r["detection_id"]: r for r in eng.evaluate_drift_triggers(det, now=NOW).collect()}
        assert out["d1"]["outcome"] == "triggered"
        assert out["d2"]["outcome"] == "suppressed_threshold"
        assert out["d3"]["outcome"] == "triggered"

    def test_cooldown_clock_is_batch_invariant(self, spark):
        """A late (backfill) evaluation must reach the same outcome as a
        same-batch evaluation: the history's cooldown clock is the TRIGGER
        time (detection ts), not evaluated_at (round-3 review)."""
        eng = RetrainTriggerEngine(TriggerPolicy(cooldown_hours=24))
        d1_ts = NOW - timedelta(hours=36)
        d3_ts = NOW - timedelta(hours=6)  # 30h after d1: past cooldown
        # batched together: d1 triggers, d3 (30h later) triggers too
        both = self._detections(spark, [
            ("t", "mon", "m1", "d1", 0.9, "psi", d1_ts),
            ("t", "mon", "m1", "d3", 0.8, "psi", d3_ts),
        ])
        same_batch = {r["detection_id"]: r["outcome"]
                      for r in eng.evaluate_drift_triggers(both, now=NOW).collect()}
        # split across batches: d1 evaluated LATE (evaluated_at=NOW), then d3
        hist = eng.evaluate_drift_triggers(
            self._detections(spark, [("t", "mon", "m1", "d1", 0.9, "psi", d1_ts)]),
            now=NOW,
        )
        later = {r["detection_id"]: r["outcome"]
                 for r in eng.evaluate_drift_triggers(
                     self._detections(spark, [("t", "mon", "m1", "d3", 0.8, "psi", d3_ts)]),
                     history=hist, now=NOW,
                 ).collect()}
        assert same_batch["d3"] == "triggered"
        assert later["d3"] == same_batch["d3"]  # batching must not change it

    def test_performance_within_batch_cooldown_and_unique_ids(self, spark):
        """Every hourly metric row crossing the floor must NOT each fire:
        at most one trigger per model per cooldown, unique event_ids
        (round-3 review)."""
        eng = RetrainTriggerEngine(
            TriggerPolicy(performance_accuracy_threshold=0.8, cooldown_hours=24)
        )
        met = spark.createDataFrame(pd.DataFrame({
            "tenant_id": ["t"] * 30,
            "monitor_id": ["mon"] * 30,
            "model_id": ["m1"] * 30,
            "accuracy": [0.5] * 30,
            "rmse": [None] * 30,
            "measured_at": [NOW + timedelta(hours=h) for h in range(30)],
        }))
        rows = eng.evaluate_performance_triggers(met, now=NOW).collect()
        assert len(rows) == 30
        assert len({r["event_id"] for r in rows}) == 30  # unique ids
        fired = sorted(r["triggered_at"] for r in rows if r["triggered"])
        # hours 0..29: triggers at h=0 and h=24 only (24h cooldown)
        assert [
            (t - NOW.replace(tzinfo=None)).total_seconds() / 3600
            if t.tzinfo is None
            else (t - NOW).total_seconds() / 3600
            for t in fired
        ] == [0.0, 24.0]

    def test_performance_triggers(self, spark):
        eng = RetrainTriggerEngine(
            TriggerPolicy(
                performance_accuracy_threshold=0.8,
                performance_rmse_threshold=2.0,
            )
        )
        met = spark.createDataFrame(
            pd.DataFrame(
                {
                    "tenant_id": ["t"] * 3,
                    "monitor_id": ["mon"] * 3,
                    "model_id": ["m1", "m2", "m3"],
                    "accuracy": [0.75, 0.9, None],
                    "rmse": [None, 1.0, 3.5],
                }
            )
        )
        out = {r["model_id"]: r for r in eng.evaluate_performance_triggers(met, now=NOW).collect()}
        assert out["m1"]["outcome"] == "triggered"
        assert "Accuracy 0.7500 below threshold 0.8000" in out["m1"]["message"]
        assert out["m2"]["outcome"] == "suppressed_threshold"
        assert out["m3"]["outcome"] == "triggered"
        assert "RMSE 3.5000 above threshold 2.0000" in out["m3"]["message"]

    def test_scheduled_triggers(self, spark):
        eng = RetrainTriggerEngine(TriggerPolicy(scheduled_interval_hours=24))
        models = spark.createDataFrame(
            pd.DataFrame(
                {"tenant_id": ["t"] * 2, "monitor_id": ["mon"] * 2,
                 "model_id": ["m1", "m2"]}
            )
        )
        hist = spark.createDataFrame(
            pd.DataFrame(
                {
                    "model_id": ["m1", "m2"],
                    "triggered": [True, True],
                    "evaluated_at": [NOW - timedelta(hours=2), NOW - timedelta(hours=30)],
                }
            )
        )
        out = {r["model_id"]: r for r in eng.evaluate_scheduled_triggers(models, hist, now=NOW).collect()}
        assert out["m1"]["outcome"] == "suppressed_cooldown"
        assert "Next scheduled trigger at" in out["m1"]["message"]
        assert out["m2"]["outcome"] == "triggered"
        # never-triggered model fires immediately
        out2 = eng.evaluate_scheduled_triggers(models, None, now=NOW).collect()
        assert all(r["triggered"] for r in out2)
        # interval 0 = disabled
        eng0 = RetrainTriggerEngine(TriggerPolicy(scheduled_interval_hours=0))
        out3 = eng0.evaluate_scheduled_triggers(models, None, now=NOW).collect()
        assert all(r["outcome"] == "suppressed_disabled" for r in out3)

    def test_trigger_history_filters(self, spark):
        hist = spark.createDataFrame(
            pd.DataFrame(
                {
                    "model_id": ["m1", "m1", "m2"],
                    "triggered": [True, False, True],
                    "evaluated_at": [NOW, NOW + timedelta(hours=1), NOW],
                }
            )
        )
        rows = trigger_history(hist, model_id="m1").collect()
        assert len(rows) == 2
        assert rows[0]["evaluated_at"] > rows[1]["evaluated_at"]  # newest first
        rows = trigger_history(hist, triggered_only=True).collect()
        assert len(rows) == 2


class TestAlertRulesEscalation:
    def _rules(self, spark):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "rule_id": ["r1", "r2", "r3"],
                    "metric": ["psi", "accuracy", "psi"],
                    "threshold": [0.25, 0.8, 0.5],
                    "comparison": ["gt", "lt", "gt"],
                    "severity": ["warning", "critical", "critical"],
                    "monitor_id": [None, None, "monX"],
                    "model_id": [None, None, None],
                    "cooldown_minutes": [60, 60, 60],
                    "enabled": [True, True, False],
                }
            )
        )

    def test_evaluate_rules(self, spark):
        metrics = spark.createDataFrame(
            pd.DataFrame(
                {
                    "monitor_id": ["monA", "monA"],
                    "model_id": ["m1", "m1"],
                    "metric": ["psi", "accuracy"],
                    "value": [0.4, 0.75],
                    "detected_at": [NOW, NOW],
                }
            )
        )
        out = alerts.evaluate_rules(metrics, self._rules(spark)).collect()
        by_rule = {r["rule_id"]: r for r in out}
        # r1 (psi gt .25) fires, r2 (accuracy lt .8) fires,
        # r3 disabled + scoped to monX -> absent
        assert set(by_rule) == {"r1", "r2"}
        assert by_rule["r1"]["severity"] == "warning"
        assert "psi crossed threshold" in by_rule["r1"]["message"]
        assert by_rule["r1"]["dedup_key"] is not None

    def test_rule_scoping(self, spark):
        metrics = spark.createDataFrame(
            pd.DataFrame(
                {
                    "monitor_id": ["monX", "monY"],
                    "model_id": ["m1", "m1"],
                    "metric": ["psi", "psi"],
                    "value": [0.9, 0.9],
                    "detected_at": [NOW, NOW],
                }
            )
        )
        rules = self._rules(spark).withColumn("enabled", F.lit(True))
        out = alerts.evaluate_rules(metrics, rules).collect()
        r3_rows = [r for r in out if r["rule_id"] == "r3"]
        assert {r["monitor_id"] for r in r3_rows} == {"monX"}  # scoped
        r1_rows = [r for r in out if r["rule_id"] == "r1"]
        assert {r["monitor_id"] for r in r1_rows} == {"monX", "monY"}  # global

    def test_gate_uses_per_rule_cooldown(self, spark):
        cands = spark.createDataFrame(
            pd.DataFrame(
                {
                    "dedup_key": ["k1", "k2"],
                    "cooldown_minutes": [240, 30],
                    "detected_at": [NOW, NOW],
                }
            )
        )
        hist = spark.createDataFrame(
            pd.DataFrame(
                {
                    "dedup_key": ["k1", "k2"],
                    "status": ["dispatched", "dispatched"],
                    "detected_at": [NOW - timedelta(minutes=60)] * 2,
                }
            )
        )
        out = {r["dedup_key"]: r["status"] for r in alerts.gate_alerts(cands, hist).collect()}
        assert out["k1"] == "suppressed"   # 60 < 240 cooldown
        assert out["k2"] == "dispatched"   # 60 >= 30 cooldown

    def test_escalation(self, spark):
        rows = pd.DataFrame(
            {
                "alert_id": ["a1", "a2", "a3", "a4"],
                "status": ["dispatched", "dispatched", "acknowledged", "dispatched"],
                "severity": ["warning", "warning", "warning", "critical"],
                "message": ["m1", "m2", "m3", "m4"],
                "detected_at": [
                    NOW - timedelta(minutes=180),   # overdue -> escalate
                    NOW - timedelta(minutes=30),    # young -> keep
                    NOW - timedelta(minutes=180),   # acked -> keep
                    NOW - timedelta(minutes=180),   # already critical -> keep
                ],
            }
        )
        df = spark.createDataFrame(rows)
        out = alerts.escalate_overdue_alerts(
            df, escalation_timeout_minutes=120, now_ts=NOW
        ).collect()
        assert len(out) == 1
        e = out[0]
        assert e["alert_id"] == "a1"
        assert e["severity"] == "critical"
        assert e["status"] == "escalated"
        assert e["message"] == "[ESCALATED] m1"
        assert e["escalated_at"] is not None


class TestAlertRuleSet:
    def test_crud_and_evaluation(self, spark):
        rs = alerts.AlertRuleSet()
        rs.add_rule("r1", "psi", 0.25, severity="warning")
        rs.add_rule("r2", "accuracy", 0.8, comparison="lt", severity="critical")
        assert rs.update_rule("r1", threshold=0.3)
        assert not rs.update_rule("missing", threshold=1.0)
        assert rs.get_rule("r1")["threshold"] == 0.3
        assert rs.remove_rule("r2")
        assert not rs.remove_rule("r2")
        with pytest.raises(ValueError):
            rs.add_rule("bad", "x", 1.0, comparison="between")

        metrics = spark.createDataFrame(
            pd.DataFrame(
                {
                    "monitor_id": ["m"], "model_id": ["mod"],
                    "metric": ["psi"], "value": [0.5], "detected_at": [NOW],
                }
            )
        )
        out = alerts.evaluate_rules(metrics, rs.to_df(spark)).collect()
        assert len(out) == 1 and out[0]["rule_id"] == "r1"
