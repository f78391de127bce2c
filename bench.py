"""Benchmark: full validation-pass throughput + headline relational queries.

Prints ONE JSON line:
  {"metric": "validated_sequences_per_sec", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "sequences_per_sec": ...,
   "tokens_per_sec": ..., ...}

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for local[] (default 32)
  SPARK_GRAFT_TOKEN_ROWS  synthetic token-table rows (default 400_000)

Flags:
  --scaling   run the token validation pass at local[8] AND local[32] on the
              same input and report throughput at both + efficiency
              (the sandbox proxy for the N-vs-4N-executors north rule).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TOKEN_ROWS = int(os.environ.get("SPARK_GRAFT_TOKEN_ROWS", "400000"))
BENCH_DATA = os.path.join(REPO, ".benchdata")

HEADLINE_QUERIES = [
    "profile_customer",
    "agg_orders_priority",
    "uniqueness_lineitem",
    "referential_lineitem_part",
    "psi_extendedprice",
    "ks_extendedprice",
    "chi2_orderpriority",
    "wasserstein_extendedprice",
    "histogram_acctbal",
    "window_latest_orders",
    "ann_cosine_topk",
    "adwin_events",
]


def make_session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"aumos-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        # long sessions generate many codegen classes; the default 240m code
        # cache fills and silently disables the JIT (10-30x slowdowns late in
        # a run) — give it headroom and allow flushing
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_token_data() -> tuple[str, str]:
    """Generate the deterministic synthetic token tables once (cached)."""
    from aumos_drift_detector_spark.sources.synth import fast_token_parquet

    cur_dir = os.path.join(BENCH_DATA, f"tokens_current_{TOKEN_ROWS}")
    base_dir = os.path.join(BENCH_DATA, f"tokens_baseline_{TOKEN_ROWS}")
    marker = os.path.join(BENCH_DATA, f".done_{TOKEN_ROWS}")
    if not os.path.exists(marker):
        for d in (cur_dir, base_dir):
            shutil.rmtree(d, ignore_errors=True)
        fast_token_parquet(base_dir, TOKEN_ROWS, seed=42)
        # current = drifted variant: real drift work for the kernels
        fast_token_parquet(cur_dir, TOKEN_ROWS, seed=43, drifted=True)
        open(marker, "w").write("ok")
    return cur_dir, base_dir


def run_validation_pass(spark, cur_dir: str, base_dir: str, out_dir: str):
    from pyspark.sql import functions as F

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
        token_sample_fraction=0.25,
        run_token_histogram=True,
    )
    run = ValidationRun(spark, cur, base, dim, out_dir, settings=settings)
    t0 = time.monotonic()
    report = run.run(resume=False)
    wall = time.monotonic() - t0
    n_rows = cur.count()
    n_tokens = cur.agg(F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))).collect()[0][0]
    return wall, n_rows, int(n_tokens), report


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times = {}
    for name in HEADLINE_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def main() -> None:
    scaling = "--scaling" in sys.argv
    os.makedirs(BENCH_DATA, exist_ok=True)
    cur_dir, base_dir = ensure_token_data()

    result: dict = {
        "metric": "validated_sequences_per_sec",
        "unit": "sec",
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "token_rows": TOKEN_ROWS,
    }

    if scaling:
        levels = [8, 32]
        runs = {}
        for cores in levels:
            spark = make_session(cores)
            spark.sparkContext.setLogLevel("ERROR")
            out = os.path.join(BENCH_DATA, f"out_scaling_{cores}")
            shutil.rmtree(out, ignore_errors=True)
            wall, n_rows, n_tokens, _ = run_validation_pass(
                spark, cur_dir, base_dir, out
            )
            runs[cores] = {
                "wall_sec": round(wall, 2),
                "sequences_per_sec": round(n_rows / wall, 1),
                "tokens_per_sec": round(n_tokens / wall, 1),
            }
            spark.stop()
        eff = (runs[32]["sequences_per_sec"] / runs[8]["sequences_per_sec"]) / (
            32 / 8
        )
        result["scaling"] = {
            "local8": runs[8],
            "local32": runs[32],
            "efficiency_8_to_32": round(eff, 3),
        }
        result["value"] = runs[32]["wall_sec"]
        result["queries"] = {}
        print(json.dumps(result))
        return

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    out = os.path.join(BENCH_DATA, "out_bench")
    shutil.rmtree(out, ignore_errors=True)
    wall, n_rows, n_tokens, report = run_validation_pass(
        spark, cur_dir, base_dir, out
    )
    result["validation_wall_sec"] = round(wall, 2)
    result["sequences_per_sec"] = round(n_rows / wall, 1)
    result["tokens_per_sec"] = round(n_tokens / wall, 1)

    qtimes = bench_queries(spark)
    qtimes["validation_pass"] = round(wall, 3)
    result["queries"] = qtimes
    result["value"] = round(sum(qtimes.values()), 3)
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
