"""Isolate the token-histogram stage's scaling: fresh JVM per point.

The r5 sequential 32M decomposition showed token_hist at 676.8s alone in a
dirty JVM (after the violations write) vs 82.8s at 16M inside the pool —
8x wall at 2x data while the other two stages stayed linear in the SAME
window. Two candidate explanations: (a) the stage itself is superlinear in
rows, (b) the JVM it ran in was poisoned (heap debris from the preceding
jobs -> GC thrash; the known sandbox JVM-reuse trap). This script separates
them: one FRESH 32-core JVM per row count, the stage alone, min of 2 runs,
with JVM GC-time deltas read from the GarbageCollector MXBeans around each
run.

Usage: python scripts/diag_tokhist_scale.py 16000000 32000000
Emits one JSON line per (rows, attempt) and a summary line.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(rows: int) -> None:
    sys.path.insert(0, REPO)
    import bench
    from pyspark.sql import functions as F

    from aumos_drift_detector_spark.operators import drift as D
    from aumos_drift_detector_spark.sources.synth import VOCAB_SIZE

    spark = bench.make_session(32)
    spark.sparkContext.setLogLevel("ERROR")

    def gc_ms() -> int:
        total = 0
        beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            total += beans.get(i).getCollectionTime()
        return int(total)

    cur = spark.read.parquet(
        os.path.join(bench.BENCH_DATA, f"tokens_current_{rows}")
    )
    base = spark.read.parquet(
        os.path.join(bench.BENCH_DATA, f"tokens_baseline_{rows}")
    )
    batch = ["web", "books", "code", "wiki"]
    code_df = F.broadcast(
        spark.createDataFrame(
            [(p, i) for i, p in enumerate(batch)], ["source", "_pcode"]
        )
    )

    def side_counts(df, side):
        return D.binned_counts_fixed_domain_arrow(
            df.join(code_df, "source").select("_pcode", "tokens"),
            "_pcode", "tokens", 256, (0, VOCAB_SIZE),
        ).select("_pcode", F.lit(side).alias("side"), "bin", "cnt")

    for attempt in range(2):
        snap = bench.contention_snapshot()
        g0, t0 = gc_ms(), time.monotonic()
        pdf = side_counts(base, 0).unionByName(side_counts(cur, 1)).toPandas()
        wall = round(time.monotonic() - t0, 2)
        print(
            json.dumps(
                {
                    "rows": rows,
                    "attempt": attempt,
                    "wall_sec": wall,
                    "gc_sec": round((gc_ms() - g0) / 1000.0, 2),
                    "out_rows": len(pdf),
                    "contention": snap,
                }
            ),
            flush=True,
        )
    spark.stop()


def main() -> None:
    if "--one" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--one") + 1]))
        return
    for rows in [int(a) for a in sys.argv[1:]]:
        # fresh JVM per row count: a reused gateway JVM poisons the
        # comparison (sandbox trap; see bench.py --one rationale)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(rows)],
            capture_output=True, text=True,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
