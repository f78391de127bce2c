import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench
from pyspark.sql import functions as F
cores = int(sys.argv[1])
spark = bench.make_session(cores)
spark.sparkContext.setLogLevel("ERROR")
cur_dir = os.path.join(bench.BENCH_DATA, "tokens_current_4000000")
base_dir = os.path.join(bench.BENCH_DATA, "tokens_baseline_4000000")
cur = spark.read.parquet(cur_dir); base = spark.read.parquet(base_dir)
out = {}
# isolated token histogram (the validation plan's job_token_hist body)
from aumos_drift_detector_spark.operators import drift as D
from aumos_drift_detector_spark.sources.synth import VOCAB_SIZE
t0=time.monotonic()
cur_tok = cur.select("source", F.explode("tokens").alias("token_id"))
base_tok = base.select("source", F.explode("tokens").alias("token_id"))
pdf = D._binned_counts_shared_range(base_tok, cur_tok, "token_id", ("source",), 256, domain=(0, VOCAB_SIZE))
out["token_hist"] = round(time.monotonic()-t0,2)
# isolated token equality
from aumos_drift_detector_spark.operators import constraints as C
t0=time.monotonic()
n = C.token_equality_check(cur, base, "doc_id", "tokens", partition_col="source", eager=False).violations.count()
out["token_equality"] = round(time.monotonic()-t0,2)
# isolated ntok sketch
t0=time.monotonic()
D.per_value_sketch(cur, base, "n_tok", ("source",)).toPandas()
out["ntok_sketch"] = round(time.monotonic()-t0,2)
print(json.dumps({"cores": cores, **out}))
spark.stop()
