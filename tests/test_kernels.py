"""Sketch-kernel tests mirroring the reference's statistical-test suites.

Assertions ported from /root/reference/tests/unit/statistical_tests/
(test_psi.py, test_chi_squared.py) but exercised through our count-sketch
kernels, which is the shape the Spark engine feeds them in.
"""

import numpy as np
import pytest

from aumos_drift_detector_spark.functions.kernels import (
    DriftVerdict,
    chi2_from_counts,
    hellinger_from_counts,
    js_from_counts,
    psi_from_counts,
    recommended_action,
    severity,
)


def _hist_pair(ref, prod, num_bins=10):
    """Equal-frequency ref bins with +/-inf caps (reference psi.py:154-162)."""
    quantiles = np.linspace(0, 100, num_bins + 1)
    raw_edges = np.percentile(ref, quantiles)
    edges = np.concatenate([[-np.inf], raw_edges[1:-1], [np.inf]])
    ref_counts, _ = np.histogram(ref, bins=edges)
    prod_counts, _ = np.histogram(prod, bins=edges)
    return ref_counts, prod_counts, raw_edges


class TestPsiKernel:
    def test_split_halves_near_zero(self):
        # reference test_psi.py:15-22
        rng = np.random.default_rng(1)
        data = rng.normal(0, 1, 10000)
        r, p, e = _hist_pair(data[:5000], data[5000:])
        res = psi_from_counts(r, p, threshold=0.2, bin_edges=e)
        assert res.score < 0.05
        assert not res.is_drifted

    def test_five_sigma_shift_drifts(self):
        # reference test_psi.py:23-31
        rng = np.random.default_rng(2)
        ref = rng.normal(0, 1, 5000)
        prod = rng.normal(5, 1, 5000)
        r, p, e = _hist_pair(ref, prod)
        res = psi_from_counts(r, p, threshold=0.2, bin_edges=e)
        assert res.score >= 0.2
        assert res.is_drifted

    def test_bin_count_invariant(self):
        # reference test_psi.py:39-47
        rng = np.random.default_rng(3)
        ref = rng.normal(0, 1, 500)
        rng2 = np.random.default_rng(4)
        prod = rng2.normal(0, 1, 500)
        r, p, e = _hist_pair(ref, prod, num_bins=5)
        res = psi_from_counts(r, p, bin_edges=e)
        assert res.details["num_bins"] == 5
        assert len(res.details["reference_fractions"]) == 5
        assert len(res.details["per_bin_psi"]) == 5

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            psi_from_counts([0, 0], [1, 1])
        with pytest.raises(ValueError, match="empty"):
            psi_from_counts([1, 1], [0, 0])

    def test_psi_nonnegative_and_symmetricish(self):
        rng = np.random.default_rng(5)
        ref = rng.normal(0, 1, 2000)
        prod = rng.normal(0.2, 1.1, 2000)
        r, p, e = _hist_pair(ref, prod)
        res = psi_from_counts(r, p, bin_edges=e)
        assert res.score >= 0.0


class TestChi2Kernel:
    def test_identical_counts_stat_zero(self):
        # reference test_chi_squared.py:14-22
        cats = ["A", "B", "C"]
        res = chi2_from_counts(cats, [500, 300, 200], [500, 300, 200])
        assert res.details["statistic"] == pytest.approx(0.0, abs=1e-10)
        assert not res.is_drifted
        assert res.p_value > 0.99

    def test_inverted_distribution_drifts(self):
        # reference test_chi_squared.py:23-30
        res = chi2_from_counts(["cat", "dog"], [900, 100], [100, 900])
        assert res.is_drifted
        assert res.p_value < 0.05

    def test_small_noise_not_drifted(self):
        # reference test_chi_squared.py:31-37
        res = chi2_from_counts(["A", "B"], [600, 400], [610, 390])
        assert not res.is_drifted

    def test_dof_is_k_minus_1(self):
        # reference test_chi_squared.py:38-44
        res = chi2_from_counts(["A", "B", "C", "D"], [10, 20, 30, 40], [10, 20, 30, 40])
        assert res.details["degrees_of_freedom"] == 3

    def test_new_production_category_drifts(self):
        # reference test_chi_squared.py:52-60 — caller aligns via outer join;
        # new category has ref count 0 -> expected 0 with observed>0 -> inf stat
        cats = ["bird", "cat", "dog"]
        res = chi2_from_counts(cats, [0, 500, 500], [200, 400, 400])
        assert "bird" in res.details["categories"]
        assert res.is_drifted

    def test_zero_totals_raise(self):
        # reference test_chi_squared.py:77-91
        with pytest.raises(ValueError, match="Reference total count is 0"):
            chi2_from_counts(["A", "B"], [0, 0], [1, 1])
        with pytest.raises(ValueError, match="Production total count is 0"):
            chi2_from_counts(["A", "B"], [1, 1], [0, 0])


def _equal_width_pair(ref, prod, n_bins=20):
    """Shared equal-width bins over the combined range (jensen_shannon.py:53-59)."""
    lo = min(ref.min(), prod.min())
    hi = max(ref.max(), prod.max())
    edges = np.linspace(lo, hi, n_bins + 1)
    return np.histogram(ref, bins=edges)[0], np.histogram(prod, bins=edges)[0]


class TestJsHellingerKernels:
    def test_identical_near_zero(self):
        rng = np.random.default_rng(42)
        a = rng.normal(0, 1, 10000)
        b = rng.normal(0, 1, 10000)
        r, p = _equal_width_pair(a, b)
        assert js_from_counts(r, p).score < 0.1
        assert hellinger_from_counts(r, p).score < 0.1
        assert not js_from_counts(r, p).is_drifted

    def test_shifted_drifts(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, 1000)
        b = rng.normal(10, 1, 1000)
        r, p = _equal_width_pair(a, b)
        js = js_from_counts(r, p)
        he = hellinger_from_counts(r, p)
        assert js.is_drifted and js.score > 0.5
        assert he.is_drifted and he.score > 0.5

    def test_bounded_disjoint_max(self):
        # natural-log JS distance maxes at sqrt(ln 2) ~ 0.8326 (scipy default
        # base, which the reference uses via scipy.spatial.distance.jensenshannon)
        r = [100, 0, 0, 0]
        p = [0, 0, 0, 100]
        assert abs(js_from_counts(r, p).score - np.sqrt(np.log(2))) < 1e-6
        assert 0.99 < hellinger_from_counts(r, p).score <= 1.0 + 1e-9


class TestSeverityMapping:
    # reference tests/unit/core/test_services.py:94-133 semantics
    @pytest.mark.parametrize(
        "score,thr,test,expected",
        [
            (0.5, 0.2, "psi", "critical"),
            (0.35, 0.2, "psi", "warning"),
            (0.22, 0.2, "psi", "info"),
            (0.001, 0.05, "ks", "critical"),
            (0.02, 0.05, "ks", "warning"),
            (0.04, 0.05, "ks", "info"),
            (0.0, 0.0, "adwin", "critical"),
            (0.0, 0.0, "ddm", "critical"),
            (0.0, 0.0, "eddm", "critical"),
            # distance-style tests scale like PSI (threshold multiples) —
            # NOT the inverse p-value branch, where a near-zero score (the
            # most similar distributions) would read as critical
            (0.25, 0.1, "jensen_shannon", "critical"),
            (0.16, 0.1, "hellinger", "warning"),
            (0.11, 0.1, "wasserstein", "info"),
            (0.001, 0.1, "jensen_shannon", "info"),
            (0.0, 0.1, "mmd", "info"),
        ],
    )
    def test_mapping(self, score, thr, test, expected):
        assert severity(score, thr, test) == expected

    def test_actions(self):
        assert recommended_action(False, "critical") == "ignore"
        assert recommended_action(True, "critical") == "retrain"
        assert recommended_action(True, "warning") == "investigate"
        assert recommended_action(True, "info") == "monitor"
