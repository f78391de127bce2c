"""Tests for Anderson-Darling (T7), PCA drift (T9), and C2ST (T10)."""

import numpy as np
import pandas as pd
import pytest

from aumos_drift_detector_spark.operators import multivariate
from aumos_drift_detector_spark.operators.drift import (
    anderson_darling_test,
    anderson_darling_test_grouped,
)


def _mk(spark, arr, cols=None):
    cols = cols or [f"f{i}" for i in range(arr.shape[1])] if arr.ndim > 1 else ["value"]
    if arr.ndim == 1:
        return spark.createDataFrame(pd.DataFrame({"value": arr}))
    return spark.createDataFrame(pd.DataFrame(arr, columns=cols))


class TestAndersonDarling:
    def test_same_distribution_not_drifted(self, spark):
        rng = np.random.default_rng(42)
        res = anderson_darling_test(
            _mk(spark, rng.normal(0, 1, 3000)), _mk(spark, rng.normal(0, 1, 3000)), "value"
        )
        assert not res.is_drifted
        assert res.p_value == 0.25  # scipy caps the significance ceiling
        # E[A2akN] = k-1 = 1 under H0
        assert 0.0 < res.details["statistic"] < 3.0

    def test_shift_drifted(self, spark):
        rng = np.random.default_rng(0)
        res = anderson_darling_test(
            _mk(spark, rng.normal(0, 1, 1000)), _mk(spark, rng.normal(1, 1, 1000)), "value"
        )
        assert res.is_drifted
        assert res.p_value == 0.001  # floor cap

    def test_scale_change_detected(self, spark):
        # AD is sensitive to tail/scale differences KS can miss
        rng = np.random.default_rng(3)
        res = anderson_darling_test(
            _mk(spark, rng.normal(0, 1, 2000)), _mk(spark, rng.normal(0, 1.6, 2000)), "value"
        )
        assert res.is_drifted

    def test_grouped(self, spark):
        rng = np.random.default_rng(5)
        ref = spark.createDataFrame(pd.DataFrame({
            "g": ["a"] * 1500 + ["b"] * 1500,
            "value": np.concatenate([rng.normal(0, 1, 1500)] * 2),
        }))
        prod = spark.createDataFrame(pd.DataFrame({
            "g": ["a"] * 1500 + ["b"] * 1500,
            "value": np.concatenate([rng.normal(0, 1, 1500), rng.normal(2, 1, 1500)]),
        }))
        frame = anderson_darling_test_grouped(ref, prod, "value", ("g",)).set_index("g")
        assert not frame.loc["a", "is_drifted"]
        assert frame.loc["b", "is_drifted"]


class TestPcaReconstruction:
    def test_same_manifold_not_drifted(self, spark):
        rng = np.random.default_rng(1)
        # low-rank data: 2 latent dims in 6 features
        def lowrank(n):
            z = rng.normal(size=(n, 2))
            w = rng.normal(size=(2, 6))
            return z @ w + rng.normal(0, 0.05, (n, 6))
        w_fixed = np.random.default_rng(9).normal(size=(2, 6))
        def lowrank_fixed(n, rng_):
            z = rng_.normal(size=(n, 2))
            return z @ w_fixed + rng_.normal(0, 0.05, (n, 6))
        ref = _mk(spark, lowrank_fixed(1500, np.random.default_rng(2)))
        prod = _mk(spark, lowrank_fixed(1000, np.random.default_rng(3)))
        res = multivariate.pca_reconstruction_drift(
            ref, prod, [f"f{i}" for i in range(6)], n_components=2
        )
        assert not res.is_drifted
        assert abs(res.score) < 0.15

    def test_off_manifold_drifted(self, spark):
        w_fixed = np.random.default_rng(9).normal(size=(2, 6))
        rng = np.random.default_rng(4)
        z = rng.normal(size=(1500, 2))
        ref_arr = z @ w_fixed + rng.normal(0, 0.05, (1500, 6))
        prod_arr = rng.normal(size=(1000, 6)) * 2.0  # full-rank: off the manifold
        res = multivariate.pca_reconstruction_drift(
            _mk(spark, ref_arr), _mk(spark, prod_arr),
            [f"f{i}" for i in range(6)], n_components=2,
        )
        assert res.is_drifted
        assert res.score > 0.15


class TestC2ST:
    def test_same_distribution_auroc_near_half(self, spark):
        rng = np.random.default_rng(6)
        ref = _mk(spark, rng.normal(0, 1, (1200, 4)))
        prod = _mk(spark, rng.normal(0, 1, (1200, 4)))
        res = multivariate.classifier_two_sample_test(
            ref, prod, [f"f{i}" for i in range(4)]
        )
        assert not res.is_drifted
        assert 0.3 < res.score < 0.6

    def test_separable_distributions_drifted(self, spark):
        rng = np.random.default_rng(7)
        ref = _mk(spark, rng.normal(0, 1, (1200, 4)))
        prod = _mk(spark, rng.normal(1.5, 1, (1200, 4)))
        res = multivariate.classifier_two_sample_test(
            ref, prod, [f"f{i}" for i in range(4)]
        )
        assert res.is_drifted
        assert res.score > 0.8
        assert len(res.details["feature_importances"]) == 4
