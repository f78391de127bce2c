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
parts = ["web", "books", "code", "wiki"]
code_df = spark.createDataFrame([(p, i) for i, p in enumerate(parts)], ["source", "_pcode"])
for rep in range(2):
    # string key (current)
    t0=time.monotonic()
    ct = cur.select("source", F.explode("tokens").alias("token_id"))
    bt = base.select("source", F.explode("tokens").alias("token_id"))
    D._binned_counts_shared_range(bt, ct, "token_id", ("source",), 256, domain=(0, VOCAB_SIZE))
    t_str = round(time.monotonic()-t0,2)
    # int key
    t0=time.monotonic()
    ct = cur.join(F.broadcast(code_df), "source").select("_pcode", F.explode("tokens").alias("token_id"))
    bt = base.join(F.broadcast(code_df), "source").select("_pcode", F.explode("tokens").alias("token_id"))
    D._binned_counts_shared_range(bt, ct, "token_id", ("_pcode",), 256, domain=(0, VOCAB_SIZE))
    t_int = round(time.monotonic()-t0,2)
    print(json.dumps({"cores": cores, "rep": rep, "string_key": t_str, "int_key": t_int}), flush=True)
spark.stop()
