"""Scalar/sketch-level numeric functions (scipy-free, pure numpy/math)."""

from aumos_drift_detector_spark.functions.numeric import (
    chi2_sf,
    kolmogorov_sf,
    ks_2samp_pvalue,
    regularized_gamma_q,
)
from aumos_drift_detector_spark.functions.kernels import (
    chi2_from_counts,
    hellinger_from_counts,
    js_from_counts,
    psi_from_counts,
    recommended_action,
    severity,
)

__all__ = [
    "chi2_sf",
    "kolmogorov_sf",
    "ks_2samp_pvalue",
    "regularized_gamma_q",
    "chi2_from_counts",
    "hellinger_from_counts",
    "js_from_counts",
    "psi_from_counts",
    "recommended_action",
    "severity",
]
