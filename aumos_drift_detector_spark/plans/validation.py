"""The full validation pass: constraints + drift over a token table.

This is the engine's flagship job (BASELINE.json north_star): one batch pass
over ``(doc_id, tokens, n_tok, source)`` that

1. enforces schema, null-rate, uniqueness (salted two-phase agg), referential
   integrity (broadcast anti-join), the ``n_tok <=> size(tokens)`` row
   invariant, and token-array equality vs the baseline table (hash-prefiltered
   equi-join);
2. computes per-`source`-partition column profiles (single wide aggregation)
   and distribution drift vs baseline — PSI + KS on ``n_tok``, Jensen-Shannon
   + chi-squared on the token-id histogram;
3. writes three parquet outputs — ``results`` (one verdict row per
   (partition, check)), ``violations`` (exact offending rows), ``manifest``
   (per-partition completion rows with lineage + wall time) — and **resumes**
   from the manifest: partitions already completed for a run_id are pruned
   from every input scan on rerun.

Exactly-once resume protocol (kill-safe):
  * violations and results are written ``partitionBy(run_id, check_name,
    partition_value)`` / ``(run_id, partition_value)`` with DYNAMIC partition
    overwrite — a rerun of the same partitions replaces any rows a killed
    attempt left behind instead of appending duplicates;
  * the manifest append for a batch happens strictly AFTER that batch's
    violations + results land, so a manifest row is the commit record: kill
    anywhere → rerun redoes exactly the uncommitted partitions and total
    output equals an uninterrupted run;
  * ``partition_batch_size`` bounds the work between commit points (None =
    single batch: one set of bulk jobs, still exactly-once, but a kill loses
    the whole attempt's progress).
  * cross-partition (global) checks — uniqueness, schema — always scan the
    FULL table, not just pending partitions, so duplicates spanning
    already-completed partitions are found on resume; they run in the first
    batch of a fresh run and are skipped when any partition is already
    committed (their output is already on disk from that attempt).

Scale notes: all heavy passes are grouped-by-`source` single jobs (no
per-partition job loop — 10^4 partitions would mean 10^4 job launches;
``partition_batch_size`` trades commit granularity against job count);
drift finalization handles groups x bins sketch rows driver-side. The token
histogram pass explodes tokens; ``token_sample_fraction`` bounds it at scale
(sampling is LOGGED in the results row — no silent caps).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aumos_drift_detector_spark.config import DEFAULT_CONFIG, EngineConfig
from aumos_drift_detector_spark.functions.kernels import recommended_action, severity
from aumos_drift_detector_spark.operators import constraints as C
from aumos_drift_detector_spark.operators import drift as D
from aumos_drift_detector_spark.operators.profile import profile_columns
from aumos_drift_detector_spark.sources.synth import TOKEN_SCHEMA

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_value", T.StringType()),
        T.StructField("check_name", T.StringType()),
        T.StructField("feature", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("threshold", T.DoubleType()),
        T.StructField("is_drifted", T.BooleanType()),
        T.StructField("severity", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("details", T.MapType(T.StringType(), T.StringType())),
        T.StructField("detected_at", T.TimestampType()),
    ]
)

VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_value", T.StringType()),
        T.StructField("check_name", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("detail", T.StringType()),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_value", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("rows_processed", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("lineage", T.StringType()),
        T.StructField("completed_at", T.TimestampType()),
    ]
)

# checks that scan the full table (cross-partition semantics), vs checks whose
# violations are attributable to a single partition's rows
GLOBAL_CHECKS = ("schema", "uniqueness")
PARTITION_CHECKS = ("null_rate", "referential", "ntok_matches_size", "token_equality")
CHECK_NAMES = GLOBAL_CHECKS + PARTITION_CHECKS


@dataclass
class ValidationReport:
    run_id: str
    partitions: list[str]
    skipped_partitions: list[str]
    results: pd.DataFrame
    violation_counts: dict[str, int]
    wall_ms: int


@dataclass(frozen=True)
class ValidationSettings:
    partition_col: str = "source"
    key_col: str = "doc_id"
    tokens_col: str = "tokens"
    ntok_col: str = "n_tok"
    max_null_fraction: float = 0.05
    token_sample_fraction: float = 1.0  # <1.0 bounds the explode at scale
    run_token_histogram: bool = True
    # commit granularity: partitions per batch (None = all pending in one
    # batch). Smaller batches = less lost work on a kill, more job launches.
    partition_batch_size: int | None = None
    # ONE per-value sketch job feeds PSI+KS+JS on n_tok (vs 5 jobs / 3 table
    # scans separate). Safe while groups x distinct(n_tok) is collect-sized —
    # n_tok is bounded by max sequence length. False = independent tests.
    fused_ntok_drift: bool = True
    # token histogram physical plan: True = Arrow flatten+bincount with NO
    # explode (shuffle moves pre-aggregated counts, not token rows);
    # False = the explode + codegen hash-aggregate plan; None (default) =
    # cost-based auto, see below. Sampling (token_sample_fraction < 1)
    # always uses the explode plan, whose row-sampling semantics it is
    # defined over.
    # WHY auto (r5 in-pass A/Bs at two scales): isolated, the Arrow stage is
    # 1.2-1.6x faster, but INSIDE the concurrent pass at SMALL inputs its 32
    # Python workers + Arrow IPC oversubscribe the host against the parallel
    # JVM jobs — measured walls 26-42s (arrow) vs 11-17s (explode) on
    # identical 400k-row input, the co-running violations job itself
    # degrading 8.6s -> 25.5s. At LARGE inputs the single token-histogram
    # job dominates the pass (alpha ~0.95) and the Arrow plan stops losing
    # and starts shifting load OUT of the JVM (its co-running JVM jobs
    # speed up: ntok_sketch 33.2s vs 59.1s at 16M). Gate-clean same-day
    # local[32] pairs (scripts/scale_points.jsonl): 400k explode 2-3x
    # faster; 4M rows / 1.8 GB arrow 44.0s vs explode 49.3s; 16M / 7.3 GB
    # arrow 114.5s vs explode 116.0s (r4's better windows had arrow at
    # 74-90s). Auto therefore picks Arrow only when the CURRENT frame's
    # Catalyst-estimated scan size crosses ``token_hist_arrow_min_bytes`` —
    # the same cost-based-stats mechanism AQE uses for join strategy. Both
    # plans are bitwise-equal (pytest-pinned): purely a physical choice.
    token_hist_arrow: bool | None = None
    # Auto threshold (bytes, Catalyst optimizedPlan().stats().sizeInBytes
    # of the current frame). Calibrated on the A/Bs above: explode wins
    # decisively at 0.18 GB, arrow ties-or-wins from 1.8 GB up, so the
    # gate sits at 1 GiB — below it the explode plan's decisive small-input
    # win rules; above it arrow never loses and frees JVM cores for the
    # concurrent jobs. Frames with UNKNOWN stats (Long.MaxValue leaf
    # default, e.g. in-memory test frames) use explode: the safe plan
    # needs no Python workers.
    token_hist_arrow_min_bytes: int = 1 << 30
    # Independent heavy jobs (violation write, fused sketch, token
    # histogram) are submitted concurrently: overlapping them hides each
    # job's serial driver/codegen latency — the Amdahl term that capped
    # 8->32 scaling. None = concurrent (the measured default; see
    # ``_resolve_pool_workers`` for the r5 sequential-vs-concurrent
    # experiment that pinned this). An int pins the pool size
    # (1 = strictly sequential jobs, useful for per-stage decomposition:
    # sequential job walls don't include pool queueing).
    max_concurrent_jobs: int | None = None
    engine: EngineConfig = field(default_factory=lambda: DEFAULT_CONFIG)


class ValidationRun:
    """One resumable validation pass. See module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        current: DataFrame,
        baseline: DataFrame,
        sources_dim: DataFrame,
        out_dir: str,
        run_id: str | None = None,
        settings: ValidationSettings = ValidationSettings(),
    ) -> None:
        self.spark = spark
        self.current = current
        self.baseline = baseline
        self.sources_dim = sources_dim
        self.out_dir = out_dir.rstrip("/")
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.s = settings
        # resolved per run() from settings + Catalyst stats; safe default
        # for callers that drive _run_batch directly
        self._arrow_hist = False
        self.token_hist_plan = "explode"

    # -- manifest -----------------------------------------------------------

    def _completed_partitions(self) -> set[str]:
        try:
            m = self.spark.read.parquet(f"{self.out_dir}/manifest")
        except Exception:
            return set()
        rows = (
            m.where((F.col("run_id") == self.run_id) & (F.col("status") == "done"))
            .select("partition_value")
            .distinct()
            .collect()
        )
        return {r["partition_value"] for r in rows}

    # -- main ---------------------------------------------------------------

    def run(self, resume: bool = True) -> ValidationReport:
        t0 = time.monotonic()
        s = self.s
        part = s.partition_col
        # resolve the token-histogram physical plan once per run (auto mode
        # reads the Catalyst size estimate of the full current frame)
        self._arrow_hist = self._resolve_token_hist_arrow()
        self.token_hist_plan = "arrow" if self._arrow_hist else "explode"

        raw_parts = [
            r[0]
            for r in self.current.select(part).distinct().collect()
        ]
        # a NULL partition key must not crash the run (sorted() can't order
        # None vs str) nor silently vanish: NULL-keyed rows can't join any
        # batch (isin filters exclude NULL), so they are reported instead
        # via a dedicated results row in the first batch (see _run_batch's
        # null_partition_rows plumb-through)
        all_parts = [p for p in raw_parts if p is not None]
        self._has_null_partition = len(all_parts) != len(raw_parts)
        done = self._completed_partitions() if resume else set()
        pending = sorted(p for p in all_parts if p not in done)
        skipped = sorted(p for p in all_parts if p in done)

        if not pending:
            return ValidationReport(self.run_id, [], skipped, pd.DataFrame(), {}, 0)

        bsz = s.partition_batch_size or len(pending)
        batches = [pending[i : i + bsz] for i in range(0, len(pending), bsz)]
        # globals already committed iff any partition committed (they commit
        # with the first successful batch of the run)
        run_globals_next = not done

        results_rows: list[dict] = []
        for batch in batches:
            self._run_batch(batch, run_globals_next, results_rows)
            run_globals_next = False

        violation_counts = self._violation_counts()
        wall_ms = int((time.monotonic() - t0) * 1000)
        return ValidationReport(
            run_id=self.run_id,
            partitions=pending,
            skipped_partitions=skipped,
            results=pd.DataFrame(results_rows),
            violation_counts=violation_counts,
            wall_ms=wall_ms,
        )

    # -- job concurrency ------------------------------------------------------

    #: pool size when unpinned: violations write + fused sketch + token
    #: histogram (3 heavy) with headroom for the non-fused 5-job shape
    POOL_WORKERS_CONCURRENT = 6

    def _resolve_pool_workers(self) -> int:
        """Pool size for the batch's independent heavy jobs.

        ``settings.max_concurrent_jobs`` pins it (1 = strictly sequential);
        None = concurrent. Concurrent is the MEASURED default, not a guess:
        an r5 hypothesis held that once input outgrew the heap the
        overlapping working sets would thrash and sequential would win, so
        the 32-core / 24g-heap sandbox ran the decisive pair on identical
        25 GB (32M-row) input — concurrent pass 400s, strictly sequential
        pass 891s (token_hist 677s after the violations job had filled the
        heap vs 394s overlapped). Fresh-JVM per-stage decomposition
        (scripts/diag_tokhist_scale.py) shows every stage scales linearly
        16M->32M alone with negligible GC, i.e. the slowdown sequential
        "avoids" doesn't come from the plan at all — it comes from running
        late in a dirty JVM, which sequential ordering maximises.
        Concurrency lets the heavy scans share the fresh heap instead.
        """
        if self.s.max_concurrent_jobs is not None:
            return max(1, int(self.s.max_concurrent_jobs))
        return self.POOL_WORKERS_CONCURRENT

    def _resolve_token_hist_arrow(self) -> bool:
        """Pick the token-histogram physical plan (see settings docstring).

        ``settings.token_hist_arrow`` pins it; None = cost-based auto on the
        CURRENT frame's Catalyst size estimate (free — no extra job), the
        same statistic AQE's join planning reads. Unknown stats (leaf
        default Long.MaxValue, e.g. in-memory test frames) resolve to the
        explode plan: it needs no Python workers and wins every measured
        small-input pass. Resolved once per run and recorded as
        ``self.token_hist_plan`` so bench output can self-describe.
        """
        s = self.s
        if s.token_sample_fraction < 1.0:
            return False  # sampling semantics are defined over exploded rows
        if s.token_hist_arrow is not None:
            return bool(s.token_hist_arrow)
        try:
            size = int(
                self.current._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        except Exception:
            return False
        if size >= (1 << 62):  # stats unknown, not "huge"
            return False
        return size >= s.token_hist_arrow_min_bytes

    # -- one commit unit ----------------------------------------------------

    def _run_batch(
        self,
        batch: list[str],
        include_globals: bool,
        results_rows: list[dict],
    ) -> None:
        tb = time.monotonic()
        s = self.s
        part = s.partition_col
        cur = self.current.where(F.col(part).isin(batch))
        base = self.baseline.where(F.col(part).isin(batch))
        now = datetime.now(tz=timezone.utc)

        # ---- build phase: every check is LAZY ------------------------------
        # Eagerly counting each check's violations costs one Spark job per
        # check; instead all violation DataFrames union into ONE write, and
        # counts come back from the written parquet in one tiny
        # partition-pruned read. The sketch-producing drift jobs are
        # independent, so they are submitted CONCURRENTLY from a thread pool —
        # the Spark scheduler interleaves their stages, hiding driver/codegen
        # latency (per-job fixed cost is the Amdahl term that killed 8->32
        # scaling efficiency otherwise).
        check_meta: dict[str, dict] = {}

        def lazy_check(res: C.CheckResult) -> DataFrame:
            check_meta[res.check_name] = res.details
            vio = res.violations
            if "occurrences" in vio.columns:
                vio = vio.drop("occurrences")
            # NULL partition values coalesce to a check-type-specific
            # sentinel: global checks own '__global__'; partition checks use
            # '__unattributed__' so a later batch re-reporting run-scoped
            # unattributed counts never dynamic-overwrites (and wipes) the
            # global checks' results partition (round-2 advisory)
            sentinel = (
                "__global__"
                if res.check_name in GLOBAL_CHECKS
                else "__unattributed__"
            )
            return vio.select(
                F.lit(self.run_id).alias("run_id"),
                F.coalesce(F.col("partition_value"), F.lit(sentinel)).alias(
                    "partition_value"
                ),
                F.lit(res.check_name).alias("check_name"),
                F.col("doc_id"),
                F.col("detail"),
            )

        violation_frames = [
            lazy_check(
                C.null_rate_check(
                    cur, [s.tokens_col, s.ntok_col], s.max_null_fraction, (part,),
                    eager=False,
                )
            ),
            lazy_check(
                C.referential_check(
                    cur, part, self.sources_dim, part, key_col=s.key_col,
                    partition_col=part, eager=False,
                )
            ),
            lazy_check(
                C.row_invariant_check(
                    cur,
                    f"{s.ntok_col} <=> size({s.tokens_col})",
                    name="ntok_matches_size",
                    key_col=s.key_col,
                    partition_col=part,
                    eager=False,
                )
            ),
            lazy_check(
                C.token_equality_check(
                    cur, base, s.key_col, s.tokens_col, partition_col=part,
                    eager=False,
                )
            ),
        ]
        if include_globals:
            # full-table scans: duplicates spanning completed partitions must
            # be found even on resume (cross-partition semantics)
            violation_frames.insert(
                0, lazy_check(C.schema_check(self.current, TOKEN_SCHEMA))
            )
            violation_frames.insert(
                1,
                lazy_check(
                    C.uniqueness_check(
                        self.current, s.key_col, partition_col=part,
                        config=s.engine, eager=False,
                    )
                ),
            )
        all_vio = violation_frames[0]
        for vf in violation_frames[1:]:
            all_vio = all_vio.unionByName(vf)
        batch_checks = (
            list(CHECK_NAMES) if include_globals else list(PARTITION_CHECKS)
        )

        # ---- execute phase: concurrent job submission -----------------------
        from concurrent.futures import ThreadPoolExecutor

        def job_violations():
            # dynamic partition overwrite: replaces exactly the (run, check,
            # partition) dirs this batch produces — idempotent across retries.
            # Cluster the union by its output partition keys first (guide §6
            # output sizing): without this every union-branch task writes its
            # own sliver into every dir it touches (measured 95 files for
            # 2.6 MB at the bench shape) and BOTH read-backs — the batch
            # count and the end-of-run _violation_counts — pay one scan task
            # per sliver (113-task, ~1.2 s stages). A 4-way doc_id salt keeps
            # a hot check (e.g. every row violating token_equality) from
            # serializing on one writer; the salt shuffles only skinny
            # violation rows and never reaches the table schema.
            _salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4))
            (
                all_vio.repartition(
                    F.col("check_name"), F.col("partition_value"), _salt
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run_id", "check_name", "partition_value")
                .parquet(f"{self.out_dir}/violations")
            )
            try:
                written = (
                    self.spark.read.parquet(f"{self.out_dir}/violations")
                    .where(
                        (F.col("run_id") == self.run_id)
                        & F.col("check_name").isin(batch_checks)
                        & (
                            F.col("partition_value").isin(
                                batch + ["__unattributed__"]
                            )
                            | F.lit(include_globals)  # globals span all partitions
                        )
                    )
                    .groupBy("check_name", "partition_value")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                )
            except Exception:
                # zero violations ever written -> no partition dirs to infer
                written = []
            counts: dict[tuple[str, str], int] = {
                (r["check_name"], r["partition_value"]): r["n"] for r in written
            }
            return counts

        def job_profile():
            return profile_columns(cur, [s.ntok_col], (part,), s.engine).toPandas()

        def job_drift(fn, col):
            # reference = BASELINE snapshot, production = CURRENT batch
            # (matches the token-histogram path's (base, cur) order; PSI's
            # quantile bin edges must come from the baseline distribution)
            return fn(base, cur, col, (part,), config=s.engine)

        def job_token_hist():
            if not s.run_token_histogram:
                return None
            from aumos_drift_detector_spark.sources.synth import VOCAB_SIZE

            # int-code the partition key BEFORE the explode: the 2-billion-row
            # exploded stream then carries (int, int) instead of dragging a
            # string group key through the aggregation — measured ~1.9x faster
            # (round-1 perf trap #6, applied to the hottest path); codes map
            # back to values in the tiny collected sketch
            code_df = F.broadcast(
                self.spark.createDataFrame(
                    [(p, i) for i, p in enumerate(batch)], [part, "_pcode"]
                )
            )
            if self._arrow_hist:
                # NO-EXPLODE plan (round 4): Arrow batches flatten+bincount
                # in numpy, so the shuffle moves <= batches x groups x 256
                # pre-aggregated rows instead of one row per token — this
                # stage was alpha~0.96 of the whole pass wall. Bin arithmetic
                # is bitwise-identical to the explode plan (pytest-pinned).
                def side_counts(df, side):
                    return D.binned_counts_fixed_domain_arrow(
                        df.join(code_df, part).select("_pcode", s.tokens_col),
                        "_pcode", s.tokens_col, 256, (0, VOCAB_SIZE),
                    ).select(
                        "_pcode", F.lit(side).alias("side"), "bin", "cnt"
                    )

                pdf = (
                    side_counts(base, 0)
                    .unionByName(side_counts(cur, 1))
                    .toPandas()
                )
            else:
                # explode plan: required when token_sample_fraction < 1.0
                # (sampling is defined over exploded token rows, seed 42)
                cur_tok = cur.join(code_df, part).select(
                    "_pcode", F.explode(s.tokens_col).alias("token_id")
                )
                base_tok = base.join(code_df, part).select(
                    "_pcode", F.explode(s.tokens_col).alias("token_id")
                )
                if s.token_sample_fraction < 1.0:
                    cur_tok = cur_tok.sample(s.token_sample_fraction, seed=42)
                    base_tok = base_tok.sample(s.token_sample_fraction, seed=42)
                # token_id stays int (cheap isNotNull filter); known vocab
                # domain -> ONE single-pass fixed-width binned count feeds
                # BOTH the JS and bucketed chi-squared kernels — collect is
                # groups x 256.
                pdf = D._binned_counts_shared_range(
                    base_tok, cur_tok, "token_id", ("_pcode",), 256,
                    domain=(0, VOCAB_SIZE),
                )
            pdf[part] = pdf["_pcode"].map(dict(enumerate(batch)))
            return pdf.drop(columns=["_pcode"])

        def job_ntok_sketch():
            # one shared scan: the per-value sketch (nulls kept as a marker
            # row) feeds PSI+KS+JS *and* the column profile driver-side.
            # Side order (base, cur): reference = baseline snapshot,
            # production = current — same as job_drift / job_token_hist
            return D.per_value_sketch(
                base, cur, s.ntok_col, (part,), keep_nulls=True
            ).toPandas()

        job_walls: dict[str, float] = {}

        def timed(name, fn, *a):
            def run():
                jt = time.monotonic()
                try:
                    return fn(*a)
                finally:
                    job_walls[name] = round(time.monotonic() - jt, 2)
            return run

        pool_workers = self._resolve_pool_workers()
        job_walls["_pool_workers"] = pool_workers
        with ThreadPoolExecutor(max_workers=pool_workers) as pool:
            # submission order matters at max_workers=1: the violations
            # write releases its memory before the sketch/histogram scans
            fut_vio = pool.submit(timed("violations", job_violations))
            if s.fused_ntok_drift:
                # the sketch job replaces the standalone profile job too —
                # profile stats are a function of the same per-value counts
                fut_prof = None
                fut_sketch = pool.submit(timed("ntok_sketch", job_ntok_sketch))
                fut_psi = fut_ks = fut_js = None
            else:
                fut_prof = pool.submit(timed("profile", job_profile))
                fut_psi = pool.submit(
                    timed("psi", job_drift, D.psi_test_grouped, s.ntok_col)
                )
                fut_ks = pool.submit(
                    timed("ks", job_drift, D.ks_test_grouped, s.ntok_col)
                )
                fut_js = pool.submit(
                    timed("js", job_drift, D.js_test_grouped, s.ntok_col)
                )
            fut_tok = pool.submit(timed("token_hist", job_token_hist))

            vio_counts = fut_vio.result()
            if s.fused_ntok_drift:
                sketch_pdf = fut_sketch.result()
                # sketch sides are (base=ref, cur=prod); the profile
                # describes the CURRENT batch, so it reads side="prod"
                prof = D.profile_from_sketch(
                    sketch_pdf, (part,), s.ntok_col, side="prod"
                )
                fused = D.fused_tests_from_sketch(
                    sketch_pdf, (part,), s.ntok_col, s.engine
                )
                drift_frames = [
                    ("psi", fused["psi"]),
                    ("ks", fused["ks"]),
                    ("jensen_shannon", fused["jensen_shannon"]),
                ]
            else:
                prof = fut_prof.result()
                drift_frames = [
                    ("psi", fut_psi.result()),
                    ("ks", fut_ks.result()),
                    ("jensen_shannon", fut_js.result()),
                ]
            tok_counts_pdf = fut_tok.result()
            # true span of the job pool (r5 fix: this used to be stamped
            # after the violations future alone, under-reporting the pool)
            job_walls["_pool_wall"] = round(time.monotonic() - tb, 2)

        # ---- finalize (driver-side, sketch-sized) ---------------------------
        batch_rows: list[dict] = []

        def check_row(name: str, pval: str, n_vio: int) -> dict:
            return dict(
                run_id=self.run_id,
                partition_value=pval,
                check_name=name,
                feature=str(
                    check_meta.get(name, {}).get("key")
                    or check_meta.get(name, {}).get("fk")
                    or check_meta.get(name, {}).get("predicate", "")
                ),
                score=float(n_vio),
                threshold=0.0,
                is_drifted=n_vio > 0,
                severity="critical" if n_vio > 0 else "info",
                action="retrain" if n_vio > 0 else "ignore",
                details={k: str(v) for k, v in check_meta.get(name, {}).items()},
                detected_at=now,
            )

        if include_globals:
            # one aggregate row per global check (violations may span every
            # partition — per-partition attribution lives in the violations
            # table itself)
            for name in GLOBAL_CHECKS:
                total = sum(n for (c, _), n in vio_counts.items() if c == name)
                batch_rows.append(check_row(name, "__global__", total))
            if getattr(self, "_has_null_partition", False):
                # NULL partition keys never join a batch (isin excludes
                # NULL): surface them as a critical check instead of
                # silently skipping those rows
                n_null = self.current.where(F.col(part).isNull()).count()
                batch_rows.append(
                    check_row("null_partition_key", "__unattributed__", n_null)
                )
        for name in PARTITION_CHECKS:
            for p in batch:
                batch_rows.append(check_row(name, p, vio_counts.get((name, p), 0)))
            # Defense in depth: partition checks cannot currently emit a
            # NULL partition_value at all (cur is pre-filtered to the
            # batch's non-null keys; NULL-keyed rows are surfaced by the
            # null_partition_key check above instead), so this branch is
            # dead unless a future check changes that. If it ever fires,
            # note the limits: the RESULTS row is re-reported per batch
            # with the run-scoped count (idempotent, and never overwrites
            # the globals' '__global__' partition), but the VIOLATIONS
            # '__unattributed__' partition is dynamic-overwrite
            # batch-scoped — a later batch writing there would replace an
            # earlier batch's unattributed violation rows.
            n_unattributed = vio_counts.get((name, "__unattributed__"), 0)
            if n_unattributed:
                batch_rows.append(
                    check_row(name, "__unattributed__", n_unattributed)
                )

        rows_per_part: dict[str, int] = {}
        for _, r in prof.iterrows():
            rows_per_part[str(r[part])] = int(r["total_rows"])
            batch_rows.append(
                dict(
                    run_id=self.run_id,
                    partition_value=str(r[part]),
                    check_name="profile",
                    feature=s.ntok_col,
                    # fused-path mean is a Python None (object dtype) when a
                    # group's column is entirely NULL; float(None) raises
                    score=float(r["mean"]) if r["mean"] is not None else float("nan"),
                    threshold=float("nan"),
                    is_drifted=False,
                    severity="info",
                    action="ignore",
                    details={
                        k: str(r[k])
                        for k in (
                            "count", "mean", "std", "min_value", "max_value",
                            "median", "percentile_95", "null_fraction", "unique_count",
                        )
                    },
                    detected_at=now,
                )
            )

        for test_name, frame in drift_frames:
            self._record_drift(frame, test_name, batch_rows, now, part)

        if tok_counts_pdf is not None:
            extra = {
                "sample_fraction": str(s.token_sample_fraction),
                "n_bins": "256",
            }
            js = D.histogram_kernel_from_counts(
                tok_counts_pdf, "js", (part,), 256, s.engine.js_threshold,
                feature="token_id",
            )
            self._record_drift(js, "token_hist_js", batch_rows, now, part, extra)
            chi2 = D.histogram_kernel_from_counts(
                tok_counts_pdf, "chi2", (part,), 256, s.engine.chi2_threshold,
                feature="token_id",
            )
            self._record_drift(
                chi2, "token_hist_chi2", batch_rows, now, part, extra
            )

        # ---- commit: results (idempotent) then manifest (commit record) ----
        results_df = self.spark.createDataFrame(
            [tuple(row[f.name] for f in RESULTS_SCHEMA.fields) for row in batch_rows],
            RESULTS_SCHEMA,
        )
        (
            results_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run_id", "partition_value")
            .parquet(f"{self.out_dir}/results")
        )

        wall_ms = int((time.monotonic() - tb) * 1000)
        lineage = json.dumps(
            {
                "engine": "aumos_drift_detector_spark",
                "checks": sorted(batch_checks),
                "inputs": {"current": "df", "baseline": "df"},
                "settings": {
                    "token_sample_fraction": s.token_sample_fraction,
                    "approx": s.engine.approx,
                },
            }
        )
        manifest_rows = [
            (
                self.run_id, p, "done", int(rows_per_part.get(p, 0)),
                wall_ms, lineage, datetime.now(tz=timezone.utc),
            )
            for p in batch
        ]
        self.spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).write.mode(
            "append"
        ).parquet(f"{self.out_dir}/manifest")
        job_walls["_batch_wall"] = round(time.monotonic() - tb, 2)
        # per-job wall times for the last executed batch (diagnostics; the
        # pool runs jobs concurrently so these overlap)
        self.last_job_walls = job_walls
        results_rows.extend(batch_rows)

    # -- final read-backs ----------------------------------------------------

    def _violation_counts(self) -> dict[str, int]:
        """Per-check totals for the run from the committed violations table.

        Reading the idempotently-written table (rather than summing in-memory
        attempt counts) makes the report reflect exactly what is on disk —
        including batches committed by a previous, killed attempt.
        """
        try:
            written = (
                self.spark.read.parquet(f"{self.out_dir}/violations")
                .where(F.col("run_id") == self.run_id)
                .groupBy("check_name")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        except Exception:
            written = []
        counts = {r["check_name"]: r["n"] for r in written}
        return {name: counts.get(name, 0) for name in CHECK_NAMES}

    def _record_drift(
        self,
        frame: pd.DataFrame,
        check_name: str,
        results_rows: list[dict],
        now: datetime,
        part: str,
        extra: dict | None = None,
    ) -> None:
        for _, r in frame.iterrows():
            if r.get("error") is not None:
                results_rows.append(
                    dict(
                        run_id=self.run_id,
                        partition_value=str(r[part]),
                        check_name=check_name,
                        feature="",
                        score=float("nan"),
                        threshold=float("nan"),
                        is_drifted=None,
                        severity="info",
                        action="investigate",
                        details={"error": str(r["error"]), **(extra or {})},
                        detected_at=now,
                    )
                )
                continue
            test = r["test"]
            # reference guard (services.py:325-327): severity is only computed
            # when drift fired; healthy rows are always 'info'
            drifted = bool(r["is_drifted"])
            sev = (
                severity(float(r["score"]), float(r["threshold"]), test)
                if drifted
                else "info"
            )
            results_rows.append(
                dict(
                    run_id=self.run_id,
                    partition_value=str(r[part]),
                    check_name=check_name,
                    feature=str(r["feature"]),
                    score=float(r["score"]),
                    threshold=float(r["threshold"]),
                    is_drifted=drifted,
                    severity=sev,
                    action=recommended_action(drifted, sev),
                    details={
                        "test": str(test),
                        "reference_size": str(r["reference_size"]),
                        "production_size": str(r["production_size"]),
                        **(extra or {}),
                    },
                    detected_at=now,
                )
            )
