"""Tests for alert gating, LIME importance, and the custom-check registry."""

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.functions.registry import (
    register_check,
    registered_checks,
    run_custom_check,
    unregister_check,
)
from aumos_drift_detector_spark.operators import alerts, importance


class TestAlertGating:
    def _candidates(self, spark, ts):
        return spark.createDataFrame(
            [("k1", "m1", "psi", ts), ("k2", "m1", "ks", ts)],
            ["rule", "monitor", "metric", "detected_at"],
        ).withColumn(
            "dedup_key",
            alerts.dedup_key(F.col("rule"), F.col("monitor"), F.col("metric")),
        )

    def test_first_run_all_dispatched(self, spark):
        now = datetime.now(tz=timezone.utc)
        out = alerts.gate_alerts(self._candidates(spark, now), None).toPandas()
        assert (out["status"] == "dispatched").all()

    def test_cooldown_suppression(self, spark):
        now = datetime.now(tz=timezone.utc)
        cands = self._candidates(spark, now)
        # history: k1 fired 10 minutes ago, k2 fired 3 hours ago
        hist = self._candidates(spark, now).withColumn(
            "status", F.lit("dispatched")
        ).withColumn(
            "detected_at",
            F.when(F.col("rule") == "k1",
                   F.lit(now - timedelta(minutes=10))).otherwise(
                F.lit(now - timedelta(hours=3))
            ),
        )
        out = alerts.gate_alerts(cands, hist, cooldown_minutes=60).toPandas()
        status = dict(zip(out["rule"], out["status"]))
        assert status["k1"] == "suppressed"
        assert status["k2"] == "dispatched"

    def test_threshold_direction(self, spark):
        df = spark.createDataFrame(
            [("ks", 0.01, 0.05), ("ks", 0.2, 0.05), ("psi", 0.3, 0.2), ("psi", 0.1, 0.2)],
            ["test", "score", "threshold"],
        )
        out = df.withColumn(
            "fired",
            alerts.threshold_crossed(F.col("test"), F.col("score"), F.col("threshold")),
        ).collect()
        fired = [(r["test"], r["score"], r["fired"]) for r in out]
        assert ("ks", 0.01, True) in fired      # p-value below threshold
        assert ("ks", 0.2, False) in fired
        assert ("psi", 0.3, True) in fired      # score above threshold
        assert ("psi", 0.1, False) in fired

    def test_threshold_strictness_matches_kernels(self, spark):
        # boundary score: psi fires on >= (psi.py:181); distance tests only on
        # strict > — a boundary JS score has is_drifted=False, so no trigger
        df = spark.createDataFrame(
            [
                ("psi", 0.2, 0.2),
                ("jensen_shannon", 0.1, 0.1),
                ("jensen_shannon", 0.1000001, 0.1),
                ("wasserstein", 0.1, 0.1),
                ("hellinger", 0.15, 0.1),
            ],
            ["test", "score", "threshold"],
        )
        out = df.withColumn(
            "fired",
            alerts.threshold_crossed(F.col("test"), F.col("score"), F.col("threshold")),
        ).collect()
        fired = {(r["test"], r["score"]): r["fired"] for r in out}
        assert fired[("psi", 0.2)] is True               # psi: >= fires
        assert fired[("jensen_shannon", 0.1)] is False   # boundary: no trigger
        assert fired[("jensen_shannon", 0.1000001)] is True
        assert fired[("wasserstein", 0.1)] is False
        assert fired[("hellinger", 0.15)] is True


class TestLime:
    def test_shifted_feature_gets_weight(self, spark):
        rng = np.random.default_rng(0)
        ref = spark.createDataFrame(
            pd.DataFrame({"a": rng.normal(0, 1, 3000), "b": rng.normal(5, 2, 3000)})
        )
        prod = spark.createDataFrame(
            pd.DataFrame({"a": rng.normal(3, 1, 3000), "b": rng.normal(5, 2, 3000)})
        )
        w = importance.lime_weights(ref, prod, ["a", "b"])
        assert w["a"] > 1.0       # ~3 sigma shift
        assert w["b"] < 0.5       # unshifted
        # deterministic (seeded)
        w2 = importance.lime_weights(ref, prod, ["a", "b"])
        assert w == w2

    def test_rank_features(self, spark):
        df = spark.createDataFrame(
            [("a", 3.0), ("b", 1.0), ("c", 6.0)], ["feature", "score"]
        )
        out = importance.rank_features(df).toPandas().set_index("feature")
        assert out.loc["c", "rank"] == 1
        assert out.loc["a", "contribution_pct"] == pytest.approx(0.3)


class TestRegistry:
    def test_sample_check_roundtrip(self, spark, value_df_factory):
        def mean_gap(ref, prod):
            gap = abs(float(np.mean(prod)) - float(np.mean(ref)))
            return {"score": gap, "threshold": 0.5, "is_drifted": gap > 0.5,
                    "extra": "info"}

        register_check("mean_gap", mean_gap)
        try:
            assert registered_checks()["mean_gap"] == "sample"
            rng = np.random.default_rng(1)
            v = run_custom_check(
                "mean_gap",
                value_df_factory(rng.normal(0, 1, 3000)),
                value_df_factory(rng.normal(2, 1, 3000)),
                "value",
            )
            assert v.is_drifted
            assert 1.5 < v.score < 2.5
            assert v.details["extra"] == "info"
            assert v.details["sample_cap"] == 10_000
        finally:
            unregister_check("mean_gap")

    def test_sketch_check(self, spark, value_df_factory):
        def l1_hist(rc, pc):
            p, q = rc / rc.sum(), pc / pc.sum()
            score = float(np.abs(p - q).sum()) / 2
            return {"score": score, "threshold": 0.2, "is_drifted": score > 0.2}

        register_check("l1_hist", l1_hist, kind="sketch")
        try:
            rng = np.random.default_rng(2)
            same = run_custom_check(
                "l1_hist",
                value_df_factory(rng.normal(0, 1, 4000)),
                value_df_factory(rng.normal(0, 1, 4000)),
                "value",
            )
            assert not same.is_drifted
            shifted = run_custom_check(
                "l1_hist",
                value_df_factory(rng.normal(0, 1, 2000)),
                value_df_factory(rng.normal(4, 1, 2000)),
                "value",
            )
            assert shifted.is_drifted
        finally:
            unregister_check("l1_hist")

    def test_unknown_check_raises(self, spark, value_df_factory):
        with pytest.raises(KeyError):
            run_custom_check("nope", value_df_factory([1.0]), value_df_factory([1.0]), "value")

    def test_hanging_check_times_out_cleanly(self, spark, value_df_factory):
        """A deliberately hanging user check must fail with
        CheckTimeoutError at the deadline, not hang the engine
        (reference plugin_sandbox.py:23-40 parity)."""
        import time as _time

        from aumos_drift_detector_spark.functions.registry import (
            CheckTimeoutError,
        )

        def hangs(ref, prod):
            _time.sleep(300)
            return {"score": 0.0, "threshold": 1.0, "is_drifted": False}

        register_check("hangs", hangs)
        try:
            t0 = _time.monotonic()
            with pytest.raises(CheckTimeoutError, match="deadline"):
                run_custom_check(
                    "hangs",
                    value_df_factory([1.0, 2.0]),
                    value_df_factory([1.0, 2.0]),
                    "value",
                    check_timeout=1.0,
                )
            assert _time.monotonic() - t0 < 30  # failed at ~1s, not 300s
        finally:
            unregister_check("hangs")

    def test_check_errors_propagate_through_deadline_wrapper(
        self, spark, value_df_factory
    ):
        def broken(ref, prod):
            raise RuntimeError("bad plugin")

        register_check("broken", broken)
        try:
            with pytest.raises(RuntimeError, match="bad plugin"):
                run_custom_check(
                    "broken",
                    value_df_factory([1.0, 2.0]),
                    value_df_factory([1.0, 2.0]),
                    "value",
                )
        finally:
            unregister_check("broken")
