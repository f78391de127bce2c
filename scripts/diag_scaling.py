"""Diagnostic: per-job wall decomposition of the validation pass."""
import json, os, shutil, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench
from aumos_drift_detector_spark.plans.validation import ValidationRun, ValidationSettings

cores = int(sys.argv[1])
spark = bench.make_session(cores)
spark.sparkContext.setLogLevel("ERROR")
cur_dir = os.path.join(bench.BENCH_DATA, "tokens_current_4000000")
base_dir = os.path.join(bench.BENCH_DATA, "tokens_baseline_4000000")
out = os.path.join(bench.BENCH_DATA, f"out_diag{cores}")
shutil.rmtree(out, ignore_errors=True)

cur = spark.read.parquet(cur_dir)
base = spark.read.parquet(base_dir)
dim = spark.createDataFrame([("web",), ("books",), ("code",), ("wiki",)], ["source"])
t0 = time.monotonic()
run = ValidationRun(spark, cur, base, dim, out,
                    settings=ValidationSettings(token_sample_fraction=1.0))
report = run.run(resume=False)
wall = time.monotonic() - t0
print(json.dumps({"cores": cores, "wall": round(wall, 2),
                  "jobs": run.last_job_walls}))
spark.stop()
