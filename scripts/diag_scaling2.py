import json, os, shutil, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
cores = int(sys.argv[1]); heap = sys.argv[2] if len(sys.argv) > 2 else "12g"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cores}]")
    .appName(f"diag-{cores}-{heap}")
    .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
    .config("spark.default.parallelism", str(cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.files.maxPartitionBytes", "16m")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", heap)
    .config("spark.driver.extraJavaOptions",
            f"-Xms{heap} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import bench
from aumos_drift_detector_spark.plans.validation import ValidationRun, ValidationSettings
cur_dir = os.path.join(bench.BENCH_DATA, "tokens_current_4000000")
base_dir = os.path.join(bench.BENCH_DATA, "tokens_baseline_4000000")
out = os.path.join(bench.BENCH_DATA, f"out_diag{cores}")
shutil.rmtree(out, ignore_errors=True)
cur = spark.read.parquet(cur_dir); base = spark.read.parquet(base_dir)
dim = spark.createDataFrame([("web",), ("books",), ("code",), ("wiki",)], ["source"])
t0 = time.monotonic()
run = ValidationRun(spark, cur, base, dim, out, settings=ValidationSettings())
run.run(resume=False)
print(json.dumps({"cores": cores, "heap": heap, "wall": round(time.monotonic()-t0,2), "jobs": run.last_job_walls}))
spark.stop()
