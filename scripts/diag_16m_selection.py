"""Round-4 diag: 16M-row validation pass with the 'selection' exact-quantile
plan active (fused sketch OFF so PSI's edges run through
`quantile_edges_selection`'s prefix-sum + broadcast-rank-join physical plan
over the full 16M-row n_tok column — the 10^12-design-point path).

Usage: python scripts/diag_16m_selection.py [token_rows] [cores]
Prints one JSON line with the pass wall + per-job walls.
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BENCH_DATA, ensure_token_data, make_session  # noqa: E402

TOKEN_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def run(spark, cur_dir, base_dir, out_dir):
    from pyspark.sql import functions as F

    from aumos_drift_detector_spark.config import EngineConfig
    from aumos_drift_detector_spark.plans.validation import (
        ValidationRun,
        ValidationSettings,
    )

    cur = spark.read.parquet(cur_dir)
    base = spark.read.parquet(base_dir)
    dim = spark.createDataFrame(
        [("web",), ("books",), ("code",), ("wiki",)], ["source"]
    )
    settings = ValidationSettings(
        max_null_fraction=0.05,
        token_sample_fraction=1.0,
        run_token_histogram=True,
        fused_ntok_drift=False,  # forces the standalone PSI/KS/JS jobs
        engine=EngineConfig(exact_quantile_plan="selection"),
    )
    runner = ValidationRun(spark, cur, base, dim, out_dir, settings=settings)
    t0 = time.monotonic()
    runner.run(resume=False)
    wall = time.monotonic() - t0
    n_rows = cur.count()
    n_tok = cur.agg(F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))).collect()[0][0]
    return wall, n_rows, int(n_tok), getattr(runner, "last_job_walls", {})


def main():
    os.environ["SPARK_GRAFT_TOKEN_ROWS"] = str(TOKEN_ROWS)
    import bench

    bench.TOKEN_ROWS = TOKEN_ROWS
    os.makedirs(BENCH_DATA, exist_ok=True)
    cur_dir, base_dir = ensure_token_data()
    spark = make_session(CORES)
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(BENCH_DATA, f"out_selection_{CORES}")
    shutil.rmtree(out, ignore_errors=True)
    run(spark, cur_dir, base_dir, out)  # warmup pass, discarded
    shutil.rmtree(out, ignore_errors=True)
    wall, n_rows, n_tok, walls = run(spark, cur_dir, base_dir, out)
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    print(
        json.dumps(
            {
                "variant": "selection_quantile_plan_unfused",
                "token_rows": TOKEN_ROWS,
                "cores": CORES,
                "wall_sec": round(wall, 2),
                "sequences_per_sec": round(n_rows / wall, 1),
                "tokens_per_sec": round(n_tok / wall, 1),
                "job_walls": walls,
            }
        )
    )


if __name__ == "__main__":
    main()
