#!/usr/bin/env bash
# Package the library for spark-submit --py-files (cluster launch path).
# Produces dist/aumos_drift_detector_spark.zip with the package at the zip
# root, importable on every executor via --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/aumos_drift_detector_spark.zip
zip -qr dist/aumos_drift_detector_spark.zip aumos_drift_detector_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/aumos_drift_detector_spark.zip ($(du -h dist/aumos_drift_detector_spark.zip | cut -f1))"
