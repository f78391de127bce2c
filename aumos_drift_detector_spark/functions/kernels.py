"""Drift-test kernels over histogram/count sketches (pure numpy, driver-safe).

Each kernel consumes tiny aggregated sketches (k-element count arrays produced
by distributed Spark aggregations) and emits the reference's score/verdict
semantics. Formula provenance (reference = /root/reference/src/aumos_drift_detector):

- PSI: equal-frequency ref bins, epsilon clamp 1e-4, sum((p-r)*ln(p/r)),
  drift iff psi >= threshold            (adapters/statistical_tests/psi.py:92-190)
- chi-squared GoF: expected = ref_proportion * prod_total, dof = k-1,
  drift iff p < threshold               (adapters/statistical_tests/chi_squared.py:95-175)
- Jensen-Shannon: +1e-10 smoothing, normalize, sqrt of JS divergence (base e),
  drift iff score > threshold           (adapters/statistical_tests/jensen_shannon.py:50-68)
- Hellinger: (1/sqrt(2))*||sqrt(P)-sqrt(Q)||_2, drift iff > threshold
                                        (adapters/statistical_tests/hellinger.py:45-62)
- severity / action mapping             (core/services.py:40-68,
                                         adapters/report_generator.py:523-560)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

PSI_EPSILON = 1e-4
SMOOTHING = 1e-10

from aumos_drift_detector_spark.functions.numeric import chi2_sf, ks_2samp_pvalue


@dataclass(frozen=True)
class DriftVerdict:
    """Uniform result row for every drift kernel.

    Mirrors the reference's per-test result dataclasses (score, threshold,
    is_drifted + test-specific details) flattened into one shape so the
    engine's results table has a single schema.
    """

    test: str
    score: float
    threshold: float
    is_drifted: bool
    p_value: float | None = None
    reference_size: int = 0
    production_size: int = 0
    feature_name: str = "unknown"
    details: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        out = {
            "test": self.test,
            "feature": self.feature_name,
            "score": self.score,
            "threshold": self.threshold,
            "is_drifted": self.is_drifted,
            "reference_size": self.reference_size,
            "production_size": self.production_size,
        }
        if self.p_value is not None:
            out["p_value"] = self.p_value
        out.update(self.details)
        return out


def psi_from_counts(
    ref_counts: Sequence[int],
    prod_counts: Sequence[int],
    threshold: float = 0.2,
    bin_edges: Sequence[float] | None = None,
    feature_name: str = "unknown",
) -> DriftVerdict:
    """PSI from per-bin counts histogrammed against shared (ref-derived) edges.

    Fraction floors at PSI_EPSILON exactly as the reference (psi.py:165-166);
    verdict is psi >= threshold (psi.py:181).
    """
    ref = np.asarray(ref_counts, dtype=float)
    prod = np.asarray(prod_counts, dtype=float)
    if ref.shape != prod.shape:
        raise ValueError("count arrays must have the same number of bins")
    ref_n, prod_n = float(ref.sum()), float(prod.sum())
    if ref_n == 0:
        raise ValueError("Reference dataset is empty after removing NaN/inf")
    if prod_n == 0:
        raise ValueError("Production dataset is empty after removing NaN/inf")
    ref_frac = np.maximum(ref / ref_n, PSI_EPSILON)
    prod_frac = np.maximum(prod / prod_n, PSI_EPSILON)
    per_bin = (prod_frac - ref_frac) * np.log(prod_frac / ref_frac)
    psi = float(per_bin.sum())
    return DriftVerdict(
        test="psi",
        score=psi,
        threshold=threshold,
        is_drifted=bool(psi >= threshold),
        reference_size=int(ref_n),
        production_size=int(prod_n),
        feature_name=feature_name,
        details={
            "num_bins": int(ref.size),
            "bin_edges": [float(e) for e in bin_edges] if bin_edges is not None else [],
            "reference_fractions": ref_frac.tolist(),
            "production_fractions": prod_frac.tolist(),
            "per_bin_psi": per_bin.tolist(),
        },
    )


def chi2_from_counts(
    categories: Sequence[str],
    ref_counts: Sequence[int],
    prod_counts: Sequence[int],
    threshold: float = 0.05,
    feature_name: str = "unknown",
) -> DriftVerdict:
    """Chi-squared goodness-of-fit from aligned category counts.

    Callers align categories via a full-outer join + coalesce(0) (the Spark
    analogue of the reference's sorted key-union, chi_squared.py:140-149).
    """
    ref = np.asarray(ref_counts, dtype=float)
    prod = np.asarray(prod_counts, dtype=float)
    if not len(categories):
        raise ValueError("reference_counts must not be empty")
    ref_total = float(ref.sum())
    if ref_total == 0:
        raise ValueError("Reference total count is 0 — cannot compute proportions")
    prod_total = float(prod.sum())
    if prod_total == 0:
        raise ValueError("Production total count is 0 — cannot perform test")
    expected = (ref / ref_total) * prod_total
    # scipy.stats.chisquare semantics: sum((obs-exp)^2/exp); an expected cell
    # of 0 with nonzero observed yields inf (drift certain).
    with np.errstate(divide="ignore", invalid="ignore"):
        cells = (prod - expected) ** 2 / expected
    cells = np.where((expected == 0) & (prod == 0), 0.0, cells)
    statistic = float(np.sum(cells))
    dof = len(categories) - 1
    if not np.isfinite(statistic):
        p_value = 0.0
        statistic = float("inf")
    elif dof < 1:
        p_value = 1.0
    else:
        p_value = chi2_sf(statistic, dof)
    return DriftVerdict(
        test="chi_squared",
        score=p_value,
        threshold=threshold,
        is_drifted=bool(p_value < threshold),
        p_value=p_value,
        reference_size=int(ref_total),
        production_size=int(prod_total),
        feature_name=feature_name,
        details={
            "statistic": statistic,
            "degrees_of_freedom": dof,
            "categories": list(categories),
            "reference_counts": [int(c) for c in ref],
            "production_counts": [int(c) for c in prod],
            "expected_counts": expected.tolist(),
        },
    )


def _smoothed_dists(ref_counts: Sequence[int], prod_counts: Sequence[int]):
    ref = np.asarray(ref_counts, dtype=float) + SMOOTHING
    prod = np.asarray(prod_counts, dtype=float) + SMOOTHING
    return ref / ref.sum(), prod / prod.sum()


def js_from_counts(
    ref_counts: Sequence[int],
    prod_counts: Sequence[int],
    threshold: float = 0.1,
    feature_name: str = "unknown",
) -> DriftVerdict:
    """Jensen-Shannon distance (sqrt of divergence, natural log) from counts."""
    p, q = _smoothed_dists(ref_counts, prod_counts)
    m = 0.5 * (p + q)
    # KL terms with 0*log(0/x) = 0 (p,q strictly positive after smoothing)
    kl_pm = float(np.sum(p * np.log(p / m)))
    kl_qm = float(np.sum(q * np.log(q / m)))
    js = math_sqrt_clamped(0.5 * kl_pm + 0.5 * kl_qm)
    return DriftVerdict(
        test="jensen_shannon",
        score=js,
        threshold=threshold,
        is_drifted=bool(js > threshold),
        reference_size=int(np.asarray(ref_counts).sum()),
        production_size=int(np.asarray(prod_counts).sum()),
        feature_name=feature_name,
        details={"n_bins": int(len(np.asarray(ref_counts)))},
    )


def hellinger_from_counts(
    ref_counts: Sequence[int],
    prod_counts: Sequence[int],
    threshold: float = 0.1,
    feature_name: str = "unknown",
) -> DriftVerdict:
    """Hellinger distance H = (1/sqrt(2))*||sqrt(P)-sqrt(Q)||_2 from counts."""
    p, q = _smoothed_dists(ref_counts, prod_counts)
    h = float((1.0 / np.sqrt(2.0)) * np.sqrt(((np.sqrt(p) - np.sqrt(q)) ** 2).sum()))
    return DriftVerdict(
        test="hellinger",
        score=h,
        threshold=threshold,
        is_drifted=bool(h > threshold),
        reference_size=int(np.asarray(ref_counts).sum()),
        production_size=int(np.asarray(prod_counts).sum()),
        feature_name=feature_name,
        details={"n_bins": int(len(np.asarray(ref_counts)))},
    )


def ks_verdict(
    d: float,
    n: int,
    m: int,
    threshold: float = 0.05,
    feature_name: str = "unknown",
    method: str = "auto",
) -> DriftVerdict:
    """KS verdict from the distributed D statistic + post-clean sample sizes."""
    p = ks_2samp_pvalue(d, n, m, method=method)
    return DriftVerdict(
        test="ks",
        score=p,
        threshold=threshold,
        is_drifted=bool(p < threshold),
        p_value=p,
        reference_size=n,
        production_size=m,
        feature_name=feature_name,
        details={"statistic": float(d)},
    )


def math_sqrt_clamped(x: float) -> float:
    """sqrt clamped at 0 to absorb -1e-18-style float noise in KL sums."""
    return float(np.sqrt(max(0.0, x)))


# distance-style scores (higher = more drift, like PSI) vs p-value scores
# (lower = more drift). The reference only ever calls its severity mapping
# with psi/ks/chi2/concept names (services.py:325-327 guards on is_drifted),
# so distance tests need an explicit branch here — routing them into the
# inverse p-value branch would label the MOST similar distributions critical.
DISTANCE_TESTS = frozenset(
    {"jensen_shannon", "hellinger", "wasserstein", "mmd", "token_hist_js"}
)
P_VALUE_TESTS = frozenset({"ks", "chi_squared", "chi2", "ks_2samp", "anderson_darling"})


def severity(score: float, threshold: float, test_name: str) -> str:
    """Reference severity mapping (core/services.py:40-68).

    Concept-drift detectors are always critical; PSI and distance-style tests
    scale with threshold multiples; p-value tests scale inversely. Callers
    must apply the reference's guard (services.py:325-327): severity is only
    meaningful when ``is_drifted`` — report 'info' otherwise.
    """
    if test_name in ("adwin", "ddm", "eddm", "cusum"):
        return "critical"
    if test_name == "psi" or test_name in DISTANCE_TESTS:
        if score > threshold * 2:
            return "critical"
        if score > threshold * 1.5:
            return "warning"
        return "info"
    if score < threshold * 0.1:
        return "critical"
    if score < threshold * 0.5:
        return "warning"
    return "info"


def recommended_action(is_drifted: bool, sev: str) -> str:
    """Reference action mapping (report_generator.py:552-560)."""
    if not is_drifted:
        return "ignore"
    if sev == "critical":
        return "retrain"
    if sev == "warning":
        return "investigate"
    return "monitor"
