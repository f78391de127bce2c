"""DataFrame-level operators: profiling, drift tests, constraints, dedup, etc."""
