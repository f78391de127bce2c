"""spark-submit entrypoint for the validation pass (cluster launch path).

The north-rule launch shape — package the library once, submit against any
cluster size:

    scripts/build_pyfiles.sh          # -> dist/aumos_drift_detector_spark.zip

    spark-submit \
      --master <cluster-url> --num-executors N \
      --py-files dist/aumos_drift_detector_spark.zip \
      scripts/submit_validation.py \
      --current  <path-or-table of the current batch> \
      --baseline <path-or-table of the baseline snapshot> \
      --out      <engine output dir: results/violations/manifest> \
      [--use-tables]                  # read catalog tables (e.g. Iceberg)
      [--resume]                      # skip manifest-committed partitions
      [--fail-on critical|warning]    # nonzero exit for CI gating

No master/cores/memory are set here: spark-submit owns cluster topology, so
the SAME script runs at N and 4N executors (the scaling comparison in
BASELINE.md). Inputs read as parquet paths by default or catalog tables
with --use-tables (`spark.read.table` — Iceberg/Hive/Unity resolve through
the session catalog; partition pruning and column pruning flow through
either way). Prints one JSON line: run id, per-check summary, violation
counts, wall.
"""

from __future__ import annotations

import argparse
import json
import sys


def _read(spark, ref: str, use_tables: bool):
    return spark.read.table(ref) if use_tables else spark.read.parquet(ref)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--current", required=True)
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--use-tables", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--partition-col", default="source")
    ap.add_argument("--sources", default=None,
                    help="comma-separated expected partition values; default "
                         "= the baseline's distinct partition values")
    ap.add_argument("--max-null-fraction", type=float, default=0.05)
    ap.add_argument("--token-sample-fraction", type=float, default=1.0)
    ap.add_argument("--no-token-histogram", action="store_true")
    ap.add_argument("--partition-batch-size", type=int, default=None)
    ap.add_argument("--fail-on", choices=["critical", "warning", "never"],
                    default="never")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("aumos-validation-pass").getOrCreate()
    from aumos_drift_detector_spark.plans.validation import (
        ValidationRun,
        ValidationSettings,
    )

    cur = _read(spark, args.current, args.use_tables)
    base = _read(spark, args.baseline, args.use_tables)
    part = args.partition_col
    if args.sources:
        vals = [(v,) for v in args.sources.split(",")]
        dim = spark.createDataFrame(vals, [part])
    else:
        dim = base.select(part).where(F.col(part).isNotNull()).distinct()

    settings = ValidationSettings(
        partition_col=part,
        max_null_fraction=args.max_null_fraction,
        token_sample_fraction=args.token_sample_fraction,
        run_token_histogram=not args.no_token_histogram,
        partition_batch_size=args.partition_batch_size,
    )
    run = ValidationRun(spark, cur, base, dim, args.out, settings=settings)
    report = run.run(resume=args.resume)

    res = report.results
    by_severity = (
        res.groupby("severity").size().to_dict() if len(res) else {}
    )
    drifted = (
        int((res["is_drifted"] == True).sum())  # noqa: E712 (None-safe)
        if len(res)
        else 0
    )
    print(
        json.dumps(
            {
                "run_id": report.run_id,
                "partitions": report.partitions,
                "skipped_partitions": report.skipped_partitions,
                "checks": int(len(res)),
                "drifted_checks": drifted,
                "by_severity": {str(k): int(v) for k, v in by_severity.items()},
                "violations": report.violation_counts,
                "wall_ms": report.wall_ms,
                "out": args.out,
            }
        )
    )
    if args.fail_on != "never" and len(res):
        bad = {"critical"} if args.fail_on == "critical" else {
            "critical", "warning"
        }
        if set(res["severity"].astype(str).str.lower()) & bad:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
