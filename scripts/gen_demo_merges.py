"""Regenerate ``operators/bpe.py::DEMO_MERGES``.

Trains the driver-path BPE kernel on the deterministic sf0.001
``documents`` corpus (num_merges=48, min_count=2) directly from the
parquet word counts — no Spark session needed — and prints the Python
literal to paste into the module.  Run after any change to the training
kernel or the testdata generator.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from aumos_drift_detector_spark.operators.bpe import _train_kernel  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

wf = duckdb.sql(
    f"""
    SELECT w, count(*) AS freq
    FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    x -> x <> '')) AS w
          FROM read_parquet('{SF_DIR}/documents.parquet'))
    GROUP BY w
    """
).fetchall()

merges = _train_kernel(wf, num_merges=48, min_count=2)
print(f"# {len(merges)} merges from {SF_DIR}")
print("DEMO_MERGES: list[tuple[str, str]] = [")
for left, right in merges:
    print(f"    ({left!r}, {right!r}),")
print("]")
