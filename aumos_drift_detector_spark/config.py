"""Engine configuration: thresholds, binning, and exact-vs-approx policy.

Default thresholds mirror the reference's settings (reference settings.py:24-56
and per-test defaults: PSI 0.2 / warning 0.1, p-value tests 0.05, JS/Hellinger/
Wasserstein 0.1, MMD 0.05).

`approx` switches the quantile/distinct machinery between exact (test parity
with numpy: Spark `percentile`, `count_distinct`) and sketch-based
(`percentile_approx` t-digest-style, `approx_count_distinct` HLL) for the
10^12-row design point. See SURVEY.md §4.3.2.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # drift thresholds (reference defaults)
    psi_threshold: float = 0.2
    psi_warning_threshold: float = 0.1
    ks_threshold: float = 0.05
    # 'auto' mirrors scipy.stats.ks_2samp (exact lattice DP when
    # max(n, m) <= 10_000, else asymptotic); the exact DP is O(n*m) driver
    # work PER GROUP — grouped runs with many ~10k-row groups should set
    # 'asymp' to skip it (round-2 advisory)
    ks_pvalue_method: str = "auto"
    chi2_threshold: float = 0.05
    js_threshold: float = 0.1
    hellinger_threshold: float = 0.1
    wasserstein_threshold: float = 0.1
    mmd_threshold: float = 0.05

    # binning
    psi_bins: int = 10        # reference psi.py num_bins default
    hist_bins: int = 20       # reference baseline_manager/jensen_shannon/hellinger
    # chi-squared driver-memory guard: categories beyond the top-K (by pooled
    # count) collapse into one logged "__other__" bucket, keeping the collect
    # at O(groups x K) regardless of column cardinality
    chi2_max_categories: int = 10_000

    # physical policy
    approx: bool = False              # exact quantiles/distinct for test parity
    # exact-quantile physical plan: 'sketch' merges per-partition
    # (value, count) maps in one final reducer (fine while distinct values
    # are bounded); 'selection' computes the same exact edges via parallel
    # prefix sums + broadcast rank join with NO single-reducer buffer — the
    # path for continuous columns at 10^12 rows (distinct ~ rows)
    exact_quantile_plan: str = "sketch"
    approx_percentile_accuracy: int = 10000
    # adaptive sketch-collect: standalone PSI/KS/W1 materialize the per-value
    # sketch once (persisted), count it, and run the driver kernel over the
    # collected sketch when the count fits the cap; a larger count means the
    # distinct-value set is data-proportional (continuous column at scale),
    # so the operator falls back to the fully distributed prefix-sum plan
    # REUSING the already-persisted sketch (no recomputation). 0 disables
    # the probe (always distributed). The cap bounds driver memory, not
    # cluster size: a sketch row is (double, long, long) ~24 B + overhead,
    # so 8M rows is ~200 MB through Arrow — modest for any driver that can
    # also hold broadcast joins, and it keeps columns with up to 8M distinct
    # values (most physical measurements, prices, ids with reuse) on the
    # one-pass plan.
    sketch_collect_max_rows: int = 8_000_000
    salt_buckets: int = 16            # salting fan-out for skewed aggregations
    broadcast_dim_threshold: int = 10_000_000  # bytes; hint only

    # concept drift defaults (reference adwin.py/ddm.py)
    adwin_delta: float = 0.002
    ddm_warning_level: float = 2.0
    ddm_drift_level: float = 3.0
    ddm_min_instances: int = 30
    eddm_warning_level: float = 0.95
    eddm_drift_level: float = 0.90
    eddm_min_errors: int = 30


DEFAULT_CONFIG = EngineConfig()
