"""End-to-end validation-pass tests: exact verdicts, violations, and resume."""

import numpy as np
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

    def test_null_partition_key_survives_and_is_reported(self, spark, tmp_path):
        """Rows with a NULL partition key must not crash run() (sorted()
        can't order None vs str) nor silently vanish — they surface as a
        critical null_partition_key check row (round-3 review)."""
        cur, base, dim, _ = generate_token_tables(
            spark, n_rows=1500, seed=7, plant_violations=False
        )
        cur_null = cur.withColumn(
            "source",
            F.when(F.col("doc_id").substr(-1, 1) == "7", F.lit(None)).otherwise(
                F.col("source")
            ),
        )
        n_null = cur_null.where(F.col("source").isNull()).count()
        assert n_null > 0
        run = ValidationRun(
            spark, cur_null, base, dim, str(tmp_path / "outnull"),
            settings=ValidationSettings(run_token_histogram=False),
        )
        report = run.run()  # must not raise
        res = report.results
        npk = res[res["check_name"] == "null_partition_key"]
        assert len(npk) == 1
        assert int(npk["score"].iloc[0]) == n_null
        assert npk["is_drifted"].iloc[0]
        assert npk["severity"].iloc[0] == "critical"
        # real partitions still validated normally
        assert (res[res["check_name"] == "profile"]["partition_value"] != "").any()


class TestKillSafeResume:
    """BASELINE.md protocol step 5: kill mid-run, rerun, totals equal an
    uninterrupted run — violations/results idempotent, manifest = commit record."""

    def _mk(self, spark, tmp_path, run_id, batch_size=None, n_rows=1200):
        cur, base, dim, exp = generate_token_tables(spark, n_rows=n_rows, seed=42)
        out = str(tmp_path / "out")
        run = ValidationRun(
            spark, cur, base, dim, out, run_id=run_id,
            settings=ValidationSettings(
                run_token_histogram=False, partition_batch_size=batch_size
            ),
        )
        return run, out, exp

    def test_crash_after_violations_before_manifest(self, spark, tmp_path, monkeypatch):
        # ADVICE scenario: violations land, manifest append never happens ->
        # rerun must OVERWRITE the orphaned rows, not append duplicates
        run, out, exp = self._mk(spark, tmp_path, "killrun01")

        import aumos_drift_detector_spark.plans.validation as V

        real_create = spark.createDataFrame
        def boom(data, schema=None, *a, **k):
            if schema is V.MANIFEST_SCHEMA:
                raise RuntimeError("simulated kill before manifest commit")
            return real_create(data, schema, *a, **k)
        monkeypatch.setattr(run.spark, "createDataFrame", boom)
        with pytest.raises(RuntimeError, match="simulated kill"):
            run.run()
        monkeypatch.undo()

        # orphaned violations exist on disk now; rerun same run_id
        rerun = ValidationRun(
            spark, run.current, run.baseline, run.sources_dim, out,
            run_id="killrun01",
            settings=ValidationSettings(run_token_histogram=False),
        )
        report = rerun.run()
        assert report.skipped_partitions == []  # nothing committed
        vc = report.violation_counts
        assert vc["uniqueness"] == exp.uniqueness       # NOT doubled
        assert vc["referential"] == exp.referential
        assert vc["token_equality"] == exp.token_equality
        vio = spark.read.parquet(f"{out}/violations")
        on_disk = vio.where(
            (F.col("run_id") == "killrun01") & (F.col("check_name") == "uniqueness")
        ).count()
        assert on_disk == exp.uniqueness

    def test_batched_kill_skips_committed_partitions(self, spark, tmp_path, monkeypatch):
        run, out, exp = self._mk(spark, tmp_path, "killrun02", batch_size=2)

        # let exactly one batch commit, then die
        calls = {"n": 0}
        real_batch = run._run_batch
        def flaky(batch, include_globals, rows):
            if calls["n"] >= 1:
                raise RuntimeError("simulated kill after first batch")
            calls["n"] += 1
            return real_batch(batch, include_globals, rows)
        monkeypatch.setattr(run, "_run_batch", flaky)
        with pytest.raises(RuntimeError, match="after first batch"):
            run.run()
        monkeypatch.undo()

        man = spark.read.parquet(f"{out}/manifest")
        committed = {r["partition_value"] for r in man.collect()}
        assert len(committed) == 2  # exactly the first batch

        rerun = ValidationRun(
            spark, run.current, run.baseline, run.sources_dim, out,
            run_id="killrun02",
            settings=ValidationSettings(
                run_token_histogram=False, partition_batch_size=2
            ),
        )
        report = rerun.run()
        assert sorted(report.skipped_partitions) == sorted(committed)
        assert set(report.partitions).isdisjoint(committed)

        # totals equal an uninterrupted run
        clean_run, clean_out, _ = self._mk(spark, tmp_path / "clean", "cleanrun")
        clean = clean_run.run()
        assert report.violation_counts == clean.violation_counts
        man2 = spark.read.parquet(f"{out}/manifest")
        assert man2.select("partition_value").distinct().count() == 5
        # no partition committed twice
        assert (
            man2.groupBy("partition_value").count().where(F.col("count") > 1).count()
            == 0
        )

    def test_resume_uniqueness_spans_completed_partitions(self, spark, tmp_path):
        # duplicates across two partitions; resume after one partition is
        # committed must still find the cross-partition duplicate (the global
        # check scans the FULL table, not just pending partitions)
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "doc_id": ["dupX", "a1", "dupX", "b1"],
                "tokens": [[1, 2]] * 4,
                "n_tok": [2] * 4,
                "source": ["alpha", "alpha", "beta", "beta"],
            }
        )
        from aumos_drift_detector_spark.sources.synth import TOKEN_SCHEMA

        cur = spark.createDataFrame(pdf, TOKEN_SCHEMA)
        dim = spark.createDataFrame([("alpha",), ("beta",)], ["source"])
        out = str(tmp_path / "out")
        st = ValidationSettings(run_token_histogram=False, partition_batch_size=1)

        run = ValidationRun(spark, cur, cur, dim, out, run_id="xpart", settings=st)
        # simulate: first batch committed, then killed
        rows: list = []
        run._run_batch(["alpha"], True, rows)
        # resume processes only 'beta', but uniqueness already committed with
        # batch 1 over the full table
        rerun = ValidationRun(spark, cur, cur, dim, out, run_id="xpart", settings=st)
        report = rerun.run()
        assert report.skipped_partitions == ["alpha"]
        assert report.violation_counts["uniqueness"] == 1
        vio = spark.read.parquet(f"{out}/violations")
        dup = vio.where(F.col("check_name") == "uniqueness").collect()
        assert {r["doc_id"] for r in dup} == {"dupX"}


class TestSparkSubmitLaunch:
    def test_submit_entrypoint_with_pyfiles_zip(self, tmp_path):
        """North-rule launch shape: package once (build_pyfiles.sh), run the
        SAME driver script via spark-submit --py-files from a neutral cwd —
        the executors import the library from the zip, not the repo path."""
        import os
        import shutil
        import subprocess

        spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
        if not os.path.exists(spark_submit):
            pytest.skip("spark-submit not on this host")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        from aumos_drift_detector_spark.sources.synth import fast_token_parquet

        cur = str(tmp_path / "cur")
        base = str(tmp_path / "base")
        fast_token_parquet(base, 4000, seed=1)
        fast_token_parquet(cur, 4000, seed=1)  # same seed: token_equality holds

        subprocess.run(
            ["bash", os.path.join(repo, "scripts", "build_pyfiles.sh")],
            check=True, capture_output=True,
        )
        proc = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files",
                os.path.join(repo, "dist", "aumos_drift_detector_spark.zip"),
                os.path.join(repo, "scripts", "submit_validation.py"),
                "--current", cur, "--baseline", base,
                "--out", str(tmp_path / "out"),
                "--sources", "web,books,code,wiki",
            ],
            cwd=str(tmp_path),  # neutral cwd: repo NOT importable implicitly
            capture_output=True, text=True, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        import json

        report = json.loads(line)
        assert report["checks"] > 0
        assert sorted(report["partitions"]) == ["books", "code", "web", "wiki"]
        # same-seed tables: the per-row token-equality invariant holds
        assert report["violations"]["token_equality"] == 0
        assert (tmp_path / "out").exists()


class TestTokenHistArrowPlan:
    def test_arrow_bincount_matches_explode_plan(self, spark):
        """The no-explode Arrow flatten+bincount plan must produce counts
        BITWISE identical to the explode + codegen hash-aggregate plan,
        including NULL token arrays (contribute nothing), NULL elements
        INSIDE arrays (clean_values drops them; the Arrow path must mask,
        not crash on floor(NaN)->INT64_MIN), and boundary token ids
        (0 and vocab-1)."""
        from aumos_drift_detector_spark.operators import drift as D

        rows = []
        rng = np.random.default_rng(3)
        for i in range(400):
            toks = rng.integers(0, 50257, rng.integers(1, 60)).tolist()
            rows.append((i % 3, toks))
        rows += [
            (0, None),
            (1, []),
            (2, [0, 50256, 50256]),
            (0, [None, 7, None]),          # element-level nulls mixed in
            (1, [None]),                    # all-null list -> contributes 0
            (2, [50256, None, 0, None, 3]),
        ]
        df = spark.createDataFrame(rows, "pcode int, tokens array<int>")

        arrow = (
            D.binned_counts_fixed_domain_arrow(
                df, "pcode", "tokens", 256, (0, 50257)
            )
            .toPandas()
            .sort_values(["pcode", "bin"])
            .reset_index(drop=True)
        )
        from pyspark.sql import functions as F

        # production explode path routes through clean_values -> drop nulls
        exploded = df.select(
            "pcode", F.explode("tokens").alias("token_id")
        ).where(F.col("token_id").isNotNull())
        # the explode plan's bin arithmetic (domain branch of
        # _binned_counts_shared_range), side column dropped
        lo, hi, n_bins = 0.0, 50257.0, 256
        width = (hi - lo) / n_bins
        raw = F.floor((F.col("token_id") - F.lit(lo)) / F.lit(width)).cast("int")
        bin_col = (
            F.when(F.col("token_id") == F.lit(hi), F.lit(n_bins - 1))
            .otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)))
        )
        want = (
            exploded.withColumn("bin", bin_col)
            .groupBy("pcode", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .toPandas()
            .sort_values(["pcode", "bin"])
            .reset_index(drop=True)
        )
        assert len(arrow) == len(want)
        assert (arrow["pcode"].to_numpy() == want["pcode"].to_numpy()).all()
        assert (arrow["bin"].to_numpy() == want["bin"].to_numpy()).all()
        assert (arrow["cnt"].to_numpy() == want["cnt"].to_numpy()).all()

    def test_validation_pass_same_results_either_token_plan(self, spark, tmp_path):
        from aumos_drift_detector_spark.plans.validation import (
            ValidationRun,
            ValidationSettings,
        )
        from aumos_drift_detector_spark.sources.synth import generate_token_tables

        cur, base, dim, _exp = generate_token_tables(spark, n_rows=3000, seed=5)
        reports = {}
        for flag in (True, False):
            run = ValidationRun(
                spark, cur, base, dim, str(tmp_path / f"out_{flag}"),
                settings=ValidationSettings(token_hist_arrow=flag),
            )
            reports[flag] = run.run(resume=False).results
        a = reports[True].sort_values(["partition_value", "check_name", "feature"])
        b = reports[False].sort_values(["partition_value", "check_name", "feature"])
        assert list(a["check_name"]) == list(b["check_name"])
        sa = a["score"].astype(float).to_numpy()
        sb = b["score"].astype(float).to_numpy()
        assert np.allclose(sa, sb, rtol=0, atol=0, equal_nan=True)


class TestTokenHistPlanAuto:
    """Cost-based auto selection of the token-histogram physical plan:
    Catalyst scan-size estimate gates Arrow vs explode (both bitwise-equal,
    so this is purely physical)."""

    def _mk(self, spark, tmp_path, cur, base, dim, **kw):
        from aumos_drift_detector_spark.plans.validation import (
            ValidationRun,
            ValidationSettings,
        )

        return ValidationRun(
            spark, cur, base, dim, str(tmp_path / "out_auto"),
            settings=ValidationSettings(**kw),
        )

    def test_auto_unknown_stats_resolves_to_explode(self, spark, tmp_path):
        from aumos_drift_detector_spark.sources.synth import generate_token_tables

        cur, base, dim, _ = generate_token_tables(spark, n_rows=500, seed=3)
        run = self._mk(spark, tmp_path, cur, base, dim)  # defaults: auto
        # in-memory frames report the Long.MaxValue leaf default -> explode
        assert run._resolve_token_hist_arrow() is False
        run.run(resume=False)
        assert run.token_hist_plan == "explode"

    def test_auto_threshold_gates_parquet_size(self, spark, tmp_path):
        from aumos_drift_detector_spark.sources.synth import generate_token_tables

        cur, base, dim, _ = generate_token_tables(spark, n_rows=500, seed=3)
        cur.write.mode("overwrite").parquet(str(tmp_path / "cur_pq"))
        base.write.mode("overwrite").parquet(str(tmp_path / "base_pq"))
        cur_pq = spark.read.parquet(str(tmp_path / "cur_pq"))
        base_pq = spark.read.parquet(str(tmp_path / "base_pq"))
        # tiny table, default 1 GiB threshold -> explode
        run = self._mk(spark, tmp_path, cur_pq, base_pq, dim)
        assert run._resolve_token_hist_arrow() is False
        # drop the threshold below the file size -> arrow
        run = self._mk(
            spark, tmp_path, cur_pq, base_pq, dim,
            token_hist_arrow_min_bytes=1,
        )
        assert run._resolve_token_hist_arrow() is True
        run.run(resume=False)
        assert run.token_hist_plan == "arrow"

    def test_pins_and_sampling_override_auto(self, spark, tmp_path):
        from aumos_drift_detector_spark.sources.synth import generate_token_tables

        cur, base, dim, _ = generate_token_tables(spark, n_rows=500, seed=3)
        assert self._mk(
            spark, tmp_path, cur, base, dim, token_hist_arrow=True
        )._resolve_token_hist_arrow() is True
        assert self._mk(
            spark, tmp_path, cur, base, dim, token_hist_arrow=False
        )._resolve_token_hist_arrow() is False
        # sampling is defined over exploded rows: it beats even a True pin
        assert self._mk(
            spark, tmp_path, cur, base, dim,
            token_hist_arrow=True, token_sample_fraction=0.5,
        )._resolve_token_hist_arrow() is False


class TestJobConcurrency:
    """The adaptive job pool: sequential == concurrent results, and the
    heap-budget downgrade fires exactly when input bytes exceed it."""

    def test_sequential_jobs_identical_results(self, spark, tmp_path):
        cur, base, dim, _exp = generate_token_tables(spark, n_rows=2000, seed=9)
        reports = {}
        for workers in (None, 1):
            run = ValidationRun(
                spark, cur, base, dim, str(tmp_path / f"c{workers}"),
                settings=ValidationSettings(max_concurrent_jobs=workers),
            )
            reports[workers] = run.run(resume=False).results
            assert run.last_job_walls["_pool_workers"] == (workers or 6)
        a = reports[None].sort_values(["partition_value", "check_name", "feature"])
        b = reports[1].sort_values(["partition_value", "check_name", "feature"])
        assert list(a["check_name"]) == list(b["check_name"])
        assert np.allclose(
            a["score"].astype(float).to_numpy(),
            b["score"].astype(float).to_numpy(),
            rtol=0, atol=0, equal_nan=True,
        )

    def test_pool_resolution(self, spark, tmp_path):
        cur, base, dim, _exp = generate_token_tables(spark, n_rows=500, seed=3)
        run = ValidationRun(spark, cur, base, dim, str(tmp_path / "o1"))
        assert run._resolve_pool_workers() == run.POOL_WORKERS_CONCURRENT
        run.s = ValidationSettings(max_concurrent_jobs=3)
        assert run._resolve_pool_workers() == 3
        run.s = ValidationSettings(max_concurrent_jobs=0)  # clamps to 1
        assert run._resolve_pool_workers() == 1
