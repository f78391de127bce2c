"""PySpark-native schema + constraint + distribution-drift validation engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``invincible-jha/aumos-drift-detector`` (reference at /root/reference, studied
for WHAT to compute only) as an idiomatic Spark batch engine:

- column stats via one wide aggregation pass per partition
- uniqueness / referential / row-invariant constraint checks with exact
  violation rows
- distribution drift (PSI, KS, chi-squared, Jensen-Shannon, Hellinger,
  Wasserstein, MMD) computed from distributed sketches
- sequential concept-drift detectors (ADWIN, DDM, EDDM, CUSUM) replayed
  per key inside Arrow-batched ``applyInPandas``
- resumable per-partition manifest with lineage + metrics

All heavy lifting is declarative DataFrame API so Catalyst/Tungsten/AQE pick
the physical plan; Python appears only in vectorized pandas/Arrow UDFs and in
tiny driver-side scalar math on k-element sketch arrays.
"""

__version__ = "0.1.0"
