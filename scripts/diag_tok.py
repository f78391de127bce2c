import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench
from pyspark.sql import functions as F
cores = int(sys.argv[1])
spark = bench.make_session(cores)
spark.sparkContext.setLogLevel("ERROR")
cur = spark.read.parquet(os.path.join(bench.BENCH_DATA, "tokens_current_4000000"))
base = spark.read.parquet(os.path.join(bench.BENCH_DATA, "tokens_baseline_4000000"))
from aumos_drift_detector_spark.operators import drift as D
from aumos_drift_detector_spark.sources.synth import VOCAB_SIZE
for rep in range(2):
    t0=time.monotonic()
    cur_tok = cur.select("source", F.explode("tokens").alias("token_id"))
    base_tok = base.select("source", F.explode("tokens").alias("token_id"))
    D._binned_counts_shared_range(base_tok, cur_tok, "token_id", ("source",), 256, domain=(0, VOCAB_SIZE))
    print(json.dumps({"cores": cores, "rep": rep, "token_hist": round(time.monotonic()-t0,2)}), flush=True)
spark.stop()
