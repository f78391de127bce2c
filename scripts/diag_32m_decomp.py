"""Sequential stage decomposition at two data scales.

The concurrent FAIR pool makes per-job walls non-decomposable (a job's wall
includes queueing behind its neighbours), so this times each heavy stage
ALONE, twice (min), at each row count, to locate any super-linear stage.

Usage: python scripts/diag_32m_decomp.py 16000000 32000000
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402


def timed(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main():
    from pyspark.sql import functions as F

    from aumos_drift_detector_spark.operators import drift as D
    from aumos_drift_detector_spark.sources.synth import VOCAB_SIZE

    spark = bench.make_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for rows in [int(a) for a in sys.argv[1:]]:
        cur_dir = os.path.join(bench.BENCH_DATA, f"tokens_current_{rows}")
        base_dir = os.path.join(bench.BENCH_DATA, f"tokens_baseline_{rows}")
        cur, base = spark.read.parquet(cur_dir), spark.read.parquet(base_dir)
        r = {"contention": bench.contention_snapshot()}
        r["scan_count"] = timed(lambda: (cur.count(), base.count()))
        r["scan_sum_ntok"] = timed(
            lambda: cur.agg(F.sum(F.size("tokens"))).collect()
        )
        r["sketch"] = timed(
            lambda: D.per_value_sketch(
                base, cur, "n_tok", ("source",), keep_nulls=True
            ).toPandas()
        )
        r["token_hist_arrow_cur"] = timed(
            # .toPandas() forces execution — the builder alone is lazy
            lambda: D.binned_counts_fixed_domain_arrow(
                cur.withColumn("_pcode", F.lit(0)).select("_pcode", "tokens"),
                "_pcode", "tokens", 256, (0, VOCAB_SIZE),
            ).toPandas()
        )
        out[rows] = r
        print(json.dumps({rows: r}), flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
