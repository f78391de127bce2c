"""End-to-end validation-pass tests: exact verdicts, violations, and resume."""

import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.plans.validation import (
    ValidationRun,
    ValidationSettings,
)
from aumos_drift_detector_spark.sources.synth import generate_token_tables


@pytest.fixture(scope="module")
def fixture_small(spark):
    cur, base, dim, exp = generate_token_tables(spark, n_rows=1500, seed=42)
    return cur.cache(), base.cache(), dim, exp


@pytest.fixture(scope="module")
def completed_run(spark, fixture_small, tmp_path_factory):
    cur, base, dim, exp = fixture_small
    out = str(tmp_path_factory.mktemp("vrun"))
    run = ValidationRun(spark, cur, base, dim, out, run_id="testrun01")
    report = run.run()
    return run, report, out, exp


class TestValidationPass:
    def test_exact_violation_counts(self, completed_run):
        _, report, _, exp = completed_run
        vc = report.violation_counts
        assert vc["uniqueness"] == exp.uniqueness
        assert vc["referential"] == exp.referential
        assert vc["ntok_matches_size"] == exp.row_invariant
        assert vc["token_equality"] == exp.token_equality
        assert vc["schema"] == 0
        # null-rate: planted nulls are ~20/1500 > 5% of a few partitions? no —
        # 20 nulls over all partitions ~1.3% < 5% threshold -> passes
        assert vc["null_rate"] == 0

    def test_violation_rows_on_disk(self, spark, completed_run):
        _, report, out, exp = completed_run
        vio = spark.read.parquet(f"{out}/violations")
        dup = vio.where(F.col("check_name") == "uniqueness")
        assert dup.count() == exp.uniqueness
        ids = {r["doc_id"] for r in dup.collect()}
        assert ids == {f"doc{i:09d}" for i in range(50)}
        orphan_parts = {
            r["partition_value"]
            for r in vio.where(F.col("check_name") == "referential").collect()
        }
        assert orphan_parts == {"orphan_src"}

    def test_drift_not_flagged_same_distribution(self, completed_run):
        _, report, _, _ = completed_run
        res = report.results
        drift = res[res["check_name"].isin(["psi", "ks", "jensen_shannon"])]
        real = drift[
            drift["partition_value"].isin(["web", "books", "code", "wiki"])
            & drift["details"].apply(lambda d: "error" not in d)
        ]
        assert len(real) > 0
        # current == baseline (modulo planted rows) -> no distribution drift
        assert not real["is_drifted"].any()

    def test_orphan_partition_reports_error_not_crash(self, completed_run):
        _, report, _, _ = completed_run
        res = report.results
        orphan = res[
            (res["partition_value"] == "orphan_src") & (res["check_name"] == "psi")
        ]
        assert len(orphan) == 1
        assert "error" in orphan.iloc[0]["details"]

    def test_results_written_with_severity(self, spark, completed_run):
        _, _, out, _ = completed_run
        res = spark.read.parquet(f"{out}/results")
        uniq = res.where(F.col("check_name") == "uniqueness").collect()[0]
        assert uniq["is_drifted"] is True
        assert uniq["severity"] == "critical"
        assert uniq["action"] == "retrain"

    def test_manifest_rows(self, spark, completed_run):
        _, report, out, _ = completed_run
        man = spark.read.parquet(f"{out}/manifest")
        parts = {r["partition_value"] for r in man.collect()}
        assert set(report.partitions) == parts
        assert all(r["status"] == "done" for r in man.collect())
        assert all(r["rows_processed"] > 0 for r in man.collect())

    def test_resume_skips_completed(self, spark, fixture_small, completed_run):
        cur, base, dim, _ = fixture_small
        _, first_report, out, _ = completed_run
        rerun = ValidationRun(spark, cur, base, dim, out, run_id="testrun01")
        report2 = rerun.run()
        assert report2.partitions == []
        assert sorted(report2.skipped_partitions) == sorted(first_report.partitions)

    def test_new_run_id_reprocesses(self, spark, fixture_small, completed_run):
        cur, base, dim, _ = fixture_small
        _, _, out, _ = completed_run
        run2 = ValidationRun(spark, cur, base, dim, out, run_id="testrun02")
        report = run2.run()
        assert len(report.partitions) == 5  # 4 sources + orphan_src


class TestDriftedVariant:
    def test_drifted_data_flags_psi_ks(self, spark, tmp_path):
        cur, base, dim, _ = generate_token_tables(
            spark, n_rows=3000, seed=42, plant_violations=False, drifted=True
        )
        run = ValidationRun(
            spark, cur, base, dim, str(tmp_path / "out"),
            settings=ValidationSettings(run_token_histogram=False),
        )
        report = run.run()
        res = report.results
        drift = res[res["check_name"].isin(["psi", "ks"])]
        # mu 5.0 -> 5.5 lognormal shift: every real partition must flag
        assert drift["is_drifted"].all()
        psi = res[res["check_name"] == "psi"]
        assert (psi["score"] >= 0.2).all()
