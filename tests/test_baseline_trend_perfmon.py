"""Tests for baseline snapshots, trend analysis, and performance metrics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators import baseline, perfmon, trend


class TestBaseline:
    @pytest.fixture(scope="class")
    def values_df(self, spark):
        rng = np.random.default_rng(42)
        pdf = pd.DataFrame(
            {
                "part": ["a"] * 1000 + ["b"] * 1000,
                "x": np.concatenate([rng.normal(0, 1, 1000), rng.normal(5, 2, 1000)]),
            }
        )
        return spark.createDataFrame(pdf).cache(), pdf

    def test_capture_matches_numpy(self, spark, values_df):
        df, pdf = values_df
        snap = baseline.capture_baseline(df, ["x"], "m1", "v1", "part").toPandas()
        snap = snap.set_index("partition_value")
        a = pdf[pdf["part"] == "a"]["x"].to_numpy()
        assert snap.loc["a", "count"] == 1000
        assert snap.loc["a", "mean"] == pytest.approx(float(np.mean(a)), rel=1e-9)
        assert snap.loc["a", "std"] == pytest.approx(float(np.std(a)), rel=1e-9)
        assert snap.loc["a", "median"] == pytest.approx(float(np.percentile(a, 50)), rel=1e-9)
        assert snap.loc["a", "percentile_99"] == pytest.approx(
            float(np.percentile(a, 99)), rel=1e-6
        )
        counts, edges = np.histogram(a, bins=20)
        assert list(snap.loc["a", "histogram_counts"]) == counts.tolist()
        np.testing.assert_allclose(snap.loc["a", "histogram_edges"], edges, rtol=1e-9)

    def test_fingerprint_deterministic(self, spark, values_df):
        df, _ = values_df
        s1 = baseline.capture_baseline(df, ["x"], "m1", "v1", "part").toPandas()
        s2 = baseline.capture_baseline(df, ["x"], "m1", "v1", "part").toPandas()
        assert s1.set_index("partition_value")["fingerprint"].to_dict() == \
               s2.set_index("partition_value")["fingerprint"].to_dict()

    def test_compare_detects_shift(self, spark, values_df):
        df, _ = values_df
        old = baseline.capture_baseline(df, ["x"], "m1", "v1", "part")
        shifted = df.withColumn("x", F.col("x") + 10.0)
        new = baseline.capture_baseline(shifted, ["x"], "m1", "v2", "part")
        cmpd = baseline.compare_baselines(old, new).toPandas().set_index("partition_value")
        assert cmpd.loc["a", "change_score"] == 1.0  # huge mean shift, capped
        assert cmpd.loc["a", "cohens_d_proxy"] > 5

    def test_compare_identical_zero(self, spark, values_df):
        df, _ = values_df
        snap = baseline.capture_baseline(df, ["x"], "m1", "v1", "part")
        cmpd = baseline.compare_baselines(snap, snap).toPandas()
        assert (cmpd["change_score"] < 1e-9).all()

    def test_empty_feature_raises(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"part": ["a"] * 5, "x": [np.nan] * 5})
        )
        with pytest.raises(ValueError, match="no finite values"):
            baseline.capture_baseline(df, ["x"], "m", "v", "part")

    def test_json_roundtrip(self, spark, values_df):
        df, _ = values_df
        snap = baseline.capture_baseline(df, ["x"], "m1", "v1", "part")
        payload = baseline.export_baseline_json(snap)
        back = baseline.import_baseline_json(spark, payload)
        a = snap.toPandas().sort_values("partition_value").reset_index(drop=True)
        b = back.toPandas().sort_values("partition_value").reset_index(drop=True)
        assert a["fingerprint"].tolist() == b["fingerprint"].tolist()
        assert a["mean"].tolist() == b["mean"].tolist()


class TestTrend:
    def test_ols_matches_numpy(self, spark):
        rng = np.random.default_rng(0)
        x = np.arange(100, dtype=float)
        y = 2.5 * x + 7.0 + rng.normal(0, 1, 100)
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * 100, "x": x, "y": y})
        )
        out = trend.ols_by_key(df, ["k"], "x", "y").collect()[0]
        slope_np, intercept_np = np.polyfit(x, y, 1)
        assert out["slope"] == pytest.approx(float(slope_np), rel=1e-9)
        assert out["intercept"] == pytest.approx(float(intercept_np), rel=1e-9)
        assert out["r2"] == pytest.approx(float(np.corrcoef(x, y)[0, 1] ** 2), rel=1e-9)

    def test_lagged_correlation(self, spark):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, 300)
        b = np.roll(a, -2) + rng.normal(0, 0.01, 300)  # b[i] = a[i+2]: b leads a
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["m"] * 300, "i": range(300), "a": a, "b": b})
        )
        out = trend.lagged_correlation(df, ["k"], "i", "a", "b", max_lag=2).collect()[0]
        assert abs(out["corr_lag0"]) < 0.3
        # b shifted back by 2 aligns with a
        assert out["corr_lag2"] > 0.9

    def test_autocorrelation_seasonal(self, spark):
        i = np.arange(280)
        seasonal = np.sin(2 * np.pi * i / 7)
        flat = np.random.default_rng(3).normal(0, 1, 280)
        pdf = pd.DataFrame({
            "k": ["seasonal"] * 280 + ["flat"] * 280,
            "i": list(i) * 2,
            "v": np.concatenate([seasonal, flat]),
        })
        out = trend.autocorrelation(
            spark.createDataFrame(pdf), ["k"], "i", "v", period=7
        ).toPandas().set_index("k")
        assert out.loc["seasonal", "is_seasonal"]
        assert not out.loc["flat", "is_seasonal"]

    def test_linear_forecast(self, spark):
        y = [0.1 + 0.05 * i for i in range(20)]
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["m"] * 20, "i": range(20), "v": y})
        )
        out = trend.linear_forecast(
            df, ["k"], "i", "v", horizon=3, threshold=1.21
        ).toPandas().sort_values("step")
        # perfect line: predictions continue it exactly, zero-width interval
        np.testing.assert_allclose(out["predicted"], [1.1, 1.15, 1.2], atol=1e-9)
        assert out["crosses_threshold"].tolist() == [False, False, False]
        out2 = trend.linear_forecast(df, ["k"], "i", "v", horizon=3, threshold=1.14)
        assert out2.toPandas().sort_values("step")["crosses_threshold"].tolist() == [
            False, True, True,
        ]

    def test_contribution_pct(self, spark):
        df = spark.createDataFrame(
            [("g", "f1", 3.0), ("g", "f2", 1.0)], ["grp", "feat", "score"]
        )
        out = trend.contribution_pct(df, ["grp"], "score").toPandas().set_index("feat")
        assert out.loc["f1", "contribution_pct"] == pytest.approx(0.75)

    def test_drift_rate(self, spark):
        df = spark.createDataFrame(
            [("a", True), ("a", False), ("a", True), ("b", False)],
            ["grp", "is_drifted"],
        )
        out = trend.drift_rate(df, ["grp"]).toPandas().set_index("grp")
        assert out.loc["a", "drift_rate"] == pytest.approx(2 / 3)
        assert out.loc["b", "drift_rate"] == 0.0


class TestPerfMon:
    def test_accuracy_and_macro_f1(self, spark):
        rows = [("x", "cat", "cat"), ("x", "cat", "dog"), ("x", "dog", "dog"),
                ("x", "dog", "dog"), ("x", "bird", "cat")]
        df = spark.createDataFrame(rows, ["seg", "y_true", "y_pred"])
        out = perfmon.classification_metrics(df, ["seg"]).collect()[0]
        assert out["accuracy"] == pytest.approx(3 / 5)
        # manual macro F1: cat: tp1 fp2... compute:
        # cat: tp=1, fp=1 (bird->cat), fn=1 (cat->dog) -> f1=0.5
        # dog: tp=2, fp=1 (cat->dog), fn=0 -> f1=0.8
        # bird: tp=0, fp=0, fn=1 -> f1=0
        assert out["macro_f1"] == pytest.approx((0.5 + 0.8 + 0.0) / 3)

    def test_regression_metrics(self, spark):
        df = spark.createDataFrame(
            [("s", 1.0, 2.0), ("s", 3.0, 3.0), ("s", 5.0, 4.0)],
            ["seg", "y_true", "y_pred"],
        )
        out = perfmon.regression_metrics(df, ["seg"]).collect()[0]
        assert out["mae"] == pytest.approx(2 / 3)
        assert out["rmse"] == pytest.approx(np.sqrt(2 / 3))

    def test_auc_matches_manual(self, spark):
        rng = np.random.default_rng(5)
        n = 500
        y = rng.integers(0, 2, n)
        score = y * 0.6 + rng.normal(0, 0.4, n)  # informative score
        df = spark.createDataFrame(
            pd.DataFrame({"seg": ["s"] * n, "y_true": y, "score": score})
        )
        out = perfmon.auc_binary(df, ["seg"]).collect()[0]
        # manual Mann-Whitney AUC
        pos, neg = score[y == 1], score[y == 0]
        manual = float(
            (np.sum(pos[:, None] > neg[None, :]) + 0.5 * np.sum(pos[:, None] == neg[None, :]))
            / (len(pos) * len(neg))
        )
        assert out["auc"] == pytest.approx(manual, rel=1e-9)
        assert out["auc"] > 0.7

    def test_auc_perfect_and_random(self, spark):
        df = spark.createDataFrame(
            [("s", 0, 0.1), ("s", 0, 0.2), ("s", 1, 0.8), ("s", 1, 0.9)],
            ["seg", "y_true", "score"],
        )
        assert perfmon.auc_binary(df, ["seg"]).collect()[0]["auc"] == 1.0
