"""Tests for rolling-window metrics (W1) and report assembly (S7/F10)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.report import (
    build_drift_report,
    risk_level,
    rolling_metrics,
    time_to_critical_hours,
)
from aumos_drift_detector_spark.plans.validation import ValidationRun
from aumos_drift_detector_spark.sources.synth import generate_token_tables


class TestRollingMetrics:
    def test_matches_pandas_rolling(self, spark):
        rng = np.random.default_rng(0)
        vals = rng.normal(0, 1, 200)
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * 200, "i": range(200), "v": vals})
        )
        out = (
            rolling_metrics(df, ["k"], "i", "v", window_size=20)
            .toPandas()
            .sort_values("i")
            .reset_index(drop=True)
        )
        expected = pd.Series(vals).rolling(20, min_periods=1).mean()
        np.testing.assert_allclose(out["rolling_mean"], expected, rtol=1e-9)
        assert out["rolling_n"].iloc[5] == 6
        assert out["rolling_n"].iloc[50] == 20

    def test_per_key_isolation(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 1.0), ("a", 1, 3.0), ("b", 0, 100.0)], ["k", "i", "v"]
        )
        out = rolling_metrics(df, ["k"], "i", "v", 10).toPandas()
        b = out[out["k"] == "b"]
        assert b["rolling_mean"].iloc[0] == 100.0  # no bleed from key a


class TestRiskAndTtc:
    def test_risk_bands(self):
        assert risk_level(0.6) == "high"
        assert risk_level(0.3) == "medium"
        assert risk_level(0.1) == "low"
        assert risk_level(0.1, accuracy_delta=-0.2) == "high"
        assert risk_level(0.6, accuracy_delta=-0.01) == "low"  # delta wins

    def test_time_to_critical(self):
        # baseline 0.9, current 0.85: rate = 0.05/24; target = 0.765
        ttc = time_to_critical_hours(0.9, 0.85)
        assert ttc == pytest.approx((0.85 - 0.765) / (0.05 / 24.0))
        assert time_to_critical_hours(0.9, 0.95) is None  # improving

    def test_below_target_is_zero(self):
        assert time_to_critical_hours(0.9, 0.70) == 0.0


class TestReportAssembly:
    def test_report_from_validation_run(self, spark, tmp_path):
        cur, base, dim, _ = generate_token_tables(
            spark, 1000, 42, plant_violations=False, drifted=True
        )
        run = ValidationRun(spark, cur, base, dim, str(tmp_path / "o"), run_id="rep1")
        run.run()
        results = spark.read.parquet(f"{tmp_path}/o/results")
        report = build_drift_report(results, "rep1")
        assert report["run_id"] == "rep1"
        assert report["drifted_checks"] > 0
        assert report["drift_fraction"] > 0.5        # drifted variant
        assert report["risk_level"] == "high"
        assert report["recommended_action"] == "retrain"
        assert 1 <= len(report["top_contributors"]) <= 3
        assert report["top_contributors"][0]["score"] >= (
            report["top_contributors"][-1]["score"]
        )

    def test_accuracy_path(self, spark, tmp_path):
        cur, base, dim, _ = generate_token_tables(
            spark, 800, 7, plant_violations=False
        )
        run = ValidationRun(spark, cur, base, dim, str(tmp_path / "o2"), run_id="rep2")
        run.run()
        results = spark.read.parquet(f"{tmp_path}/o2/results")
        report = build_drift_report(
            results, "rep2", baseline_accuracy=0.9, current_accuracy=0.85
        )
        assert report["accuracy_delta"] == pytest.approx(-0.05)
        assert report["risk_level"] == "medium"
        assert report["time_to_critical_hours"] > 0
