"""Distributed two-sample drift tests (SURVEY §2.4).

Architecture: every test is `distributed sketch aggregation -> tiny driver
kernel`. Spark does the heavy pass (one shuffle: a groupBy or one window sort
per group); the per-group finalization operates on k-element arrays
(k = bins or distinct categories), so collecting it is O(groups x k) — bytes,
not data. This is the Spark-first restatement of the reference's numpy
kernels (reference adapters/statistical_tests/*.py), NOT a row-at-a-time port.

Grouped variants compute verdicts for every group (e.g. every `source`
partition) in ONE job over the full table. Ungrouped variants mirror the
reference's single-pair API including its ValueError semantics
(empty-after-clean, constant reference).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aumos_drift_detector_spark.config import DEFAULT_CONFIG, EngineConfig
from aumos_drift_detector_spark.functions.kernels import (
    DriftVerdict,
    chi2_from_counts,
    hellinger_from_counts,
    js_from_counts,
    ks_verdict,
    psi_from_counts,
)
from aumos_drift_detector_spark.operators.profile import (
    bucket_by_edges,
    clean_values,
    quantile_edges,
)

_REF, _PROD = 0, 1


def _materialize_sketch(per_value: DataFrame, cap: int):
    """Probe the per-(group, v) sketch and collect it when it fits ``cap``.

    Returns ``(pdf, persisted)``: exactly one of the two is non-None.
    Under the cap the probe (``limit(cap+1).toPandas()``) IS the full
    collect — one job, no persist bookkeeping, identical cost to the
    plain one-job plan at small scale (an earlier persist+count+collect
    variant added ~0.4 s of cache-write and extra-job latency per query
    at sf0.1 for no benefit).  On overflow the sketch is persisted and
    handed to the caller's distributed fallback, which MUST route through
    it (and unpersist when done): the fallback plans consume the sketch
    3-4x (quantile boundaries, chunk totals, offset join), and without
    the persist each consumer recomputes the corpus-scale aggregation
    from scratch (measured 4x the bytes of the sketch itself).
    """
    from pyspark import StorageLevel

    pdf = per_value.limit(cap + 1).toPandas()
    if len(pdf) <= cap:
        return pdf, None
    return None, per_value.persist(StorageLevel.MEMORY_AND_DISK)


def _cumulative_per_value(
    per_value: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    with_next_value: bool = False,
    n_ranges: int | None = None,
) -> DataFrame:
    """Fully-parallel cumulative sums over per-(group, v) sketch rows.

    The naive ECDF plan — ``Window.partitionBy(*group_cols).orderBy("v")`` —
    funnels each group's ENTIRE distinct-value set through one task
    (ungrouped: the whole table through one reducer). Fine at sf0.1, a
    scale-killer on continuous columns at 100 TB where the distinct set is
    ~row count. This helper is the scale-safe replacement (the classic
    distributed prefix-sum):

      1. One ``approxQuantile`` pass over the sketch fixes explicit value
         boundaries; ``_cid`` = the bucket of v against those broadcast
         boundaries — DETERMINISTIC, so chunks are contiguous along each
         group's value axis in every consumer of the frame (see the inline
         note for why spark_partition_id over repartitionByRange is wrong).
      2. Per-chunk totals aggregate in parallel; the chunk-totals table is
         groups x n_ranges rows — bytes — so its per-group prefix sum runs in
         a tiny window and broadcast-joins back as per-chunk offsets.
      3. A window partitioned by (group, chunk) computes the LOCAL cumsum of
         each chunk in parallel; local + offset = the global cumulative sum.

    Cost: one quantile pass + hash shuffles of the per-value sketch instead
    of one serial reducer — the right trade at scale. Input must be distinct
    on (group..., v). Output adds ``cum_<c>`` and ``total_<c>`` for every sum
    column, plus ``next_v`` (the next distinct value within the group, null at
    the group's end) when ``with_next_value`` — stitched across chunk
    boundaries via each chunk's broadcast per-group min.
    """
    spark = per_value.sparkSession
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    gcols = [F.col(g) for g in group_cols]
    # The chunk id must be DETERMINISTIC — a pure function of v — never
    # spark_partition_id() over repartitionByRange. The ranged frame feeds
    # TWO consumers (chunk totals + the offset join); whenever Catalyst's
    # column pruning makes those branches' plans differ even slightly,
    # exchange reuse is off and each branch re-SAMPLES different range
    # boundaries, silently misaligning every offset (measured: AUC varying
    # run to run). Explicit boundaries from one approxQuantile pass over
    # the sketch give the same contiguous-chunks-per-group property with a
    # value-derived _cid that is identical in every consumer by
    # construction; the heavy shuffles below are then plain hash exchanges
    # on (group, _cid).
    probs = [i / n_ranges for i in range(1, n_ranges)]
    bounds = sorted(
        set(per_value.approxQuantile("v", probs, 0.001)) if probs else []
    )
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        cid = F.size(F.filter(barr, lambda b: b < F.col("v")))
    else:
        cid = F.lit(0)
    df = per_value.withColumn("_cid", cid)
    chunk_aggs = [F.sum(c).alias(f"_t_{c}") for c in sum_cols]
    if with_next_value:
        chunk_aggs.append(F.min("v").alias("_chunk_min_v"))
    chunk = df.groupBy(*group_cols, "_cid").agg(*chunk_aggs)
    # tiny per-group windows over <= n_ranges chunk rows
    w_prev = Window.partitionBy(*gcols).orderBy("_cid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*gcols)
    off_cols = [
        F.coalesce(F.sum(f"_t_{c}").over(w_prev), F.lit(0)).alias(f"_off_{c}")
        for c in sum_cols
    ] + [F.sum(f"_t_{c}").over(w_all).alias(f"total_{c}") for c in sum_cols]
    if with_next_value:
        w_next = Window.partitionBy(*gcols).orderBy("_cid")
        off_cols.append(
            F.lead("_chunk_min_v").over(w_next).alias("_next_chunk_min")
        )
    offsets = chunk.select(*group_cols, "_cid", *off_cols)
    joined = df.join(F.broadcast(offsets), [*group_cols, "_cid"])
    w_local = Window.partitionBy(*gcols, F.col("_cid")).orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out_cols = [
        *per_value.columns,
        *[
            (F.sum(c).over(w_local) + F.col(f"_off_{c}")).alias(f"cum_{c}")
            for c in sum_cols
        ],
        *[F.col(f"total_{c}") for c in sum_cols],
    ]
    if with_next_value:
        w_lead = Window.partitionBy(*gcols, F.col("_cid")).orderBy("v")
        out_cols.append(
            F.coalesce(
                F.lead("v").over(w_lead), F.col("_next_chunk_min")
            ).alias("next_v")
        )
    return joined.select(*out_cols)


def quantile_edges_selection(
    ref_df: DataFrame,
    column: str,
    n_bins: int,
    group_cols: Sequence[str] = (),
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Exact quantile edges with NO single-reducer percentile buffer.

    The sketch path (``profile.quantile_edges``) merges per-partition
    (value, count) maps into ONE final reducer — fine while distinct values
    are bounded, quadratic pain on continuous columns at 10^12 rows where
    distinct ~ rows. This is the fully distributed alternative (classic
    rank selection):

      1. per-value counts (parallel combiner),
      2. range-partitioned parallel prefix sums (``_cumulative_per_value``
         — the same no-SinglePartition machinery as KS/W1),
      3. each needed order statistic k (2 per quantile: floor/ceil of
         h = p*(n-1)) finds its value via a broadcast range join
         (cum - cnt <= k < cum) — positions are groups x 2(n_bins+1) rows,
      4. driver-side linear interpolation over the collected picks
         (``lo + (h - floor(h)) * (hi - lo)`` — the same naive lerp Spark's
         percentile and DuckDB's quantile_cont use).

    Output schema matches ``quantile_edges``:
    (group_cols..., edges array<double>, ref_count, ref_distinct).
    """
    from aumos_drift_detector_spark.operators.profile import clean_values

    spark = ref_df.sparkSession
    clean = clean_values(ref_df, column, group_cols)
    per_value = clean.groupBy(*group_cols, "v").agg(F.count("v").alias("cnt"))
    cum = _cumulative_per_value(per_value, group_cols, ["cnt"])
    totals = per_value.groupBy(*group_cols).agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("ref_distinct")
    )
    probs = [i / n_bins for i in range(n_bins + 1)]
    nd = F.col("n").cast("double")
    structs = []
    for i, p in enumerate(probs):
        h = F.lit(float(p)) * (nd - F.lit(1.0))
        for side, k in (
            (0, F.floor(h).cast("long")),
            (1, F.least(F.floor(h).cast("long") + 1, F.col("n") - 1)),
        ):
            structs.append(
                F.struct(
                    F.lit(i).alias("pi"), k.alias("k"),
                    h.alias("h"), F.lit(side).alias("side"),
                )
            )
    pos = totals.select(
        *group_cols, "n", "ref_distinct", F.explode(F.array(*structs)).alias("s")
    ).select(
        *group_cols, "n", "ref_distinct",
        F.col("s.pi").alias("pi"), F.col("s.k").alias("k"),
        F.col("s.h").alias("h"), F.col("s.side").alias("side"),
    )
    c, p_ = cum.alias("c"), F.broadcast(pos).alias("p")
    cond = (F.col("p.k") >= F.col("c.cum_cnt") - F.col("c.cnt")) & (
        F.col("p.k") < F.col("c.cum_cnt")
    )
    for g in group_cols:
        cond = cond & (F.col(f"c.{g}") == F.col(f"p.{g}"))
    picked = c.join(p_, cond, "inner").select(
        *[F.col(f"p.{g}") for g in group_cols],
        F.col("p.pi"), F.col("p.h"), F.col("p.side"),
        F.col("p.n"), F.col("p.ref_distinct"), F.col("c.v"),
    )
    pdf = picked.toPandas()  # groups x 2(n_bins+1) rows — tiny

    out_rows, key_iter = [], (
        pdf[list(group_cols)].drop_duplicates().itertuples(index=False, name=None)
        if group_cols
        else ([()] if len(pdf) else [])
    )
    for key in key_iter:
        sub = pdf
        for g, kv in zip(group_cols, key):
            sub = sub[sub[g] == kv]
        edges = []
        for i in range(len(probs)):
            pp = sub[sub["pi"] == i]
            lo = float(pp[pp["side"] == 0]["v"].iloc[0])
            hi = float(pp[pp["side"] == 1]["v"].iloc[0])
            h = float(pp["h"].iloc[0])
            frac = float(h - np.floor(h))
            edges.append(float(lo + frac * (hi - lo)))
        out_rows.append(
            (*key, edges, int(sub["n"].iloc[0]), int(sub["ref_distinct"].iloc[0]))
        )
    schema = T.StructType(
        [ref_df.schema[g] for g in group_cols]
        + [
            T.StructField("edges", T.ArrayType(T.DoubleType())),
            T.StructField("ref_count", T.LongType()),
            T.StructField("ref_distinct", T.LongType()),
        ]
    )
    return spark.createDataFrame(out_rows, schema)


def _sides(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str],
    cast_double: bool = True,
) -> DataFrame:
    """Union (ref, prod) into (group_cols..., side, v) with finite filtering."""
    def prep(df: DataFrame, side: int) -> DataFrame:
        if cast_double:
            return clean_values(df, column, group_cols).select(
                *group_cols, F.lit(side).alias("side"), F.col("v")
            )
        return df.select(
            *group_cols, F.lit(side).alias("side"), F.col(column).alias("v")
        ).where(F.col("v").isNotNull())

    return prep(ref_df, _REF).unionByName(prep(prod_df, _PROD))


def _group_key(row: pd.Series, group_cols: Sequence[str]):
    return tuple(row[g] for g in group_cols)


def _verdict_frame(
    verdicts: list[tuple[tuple, DriftVerdict | None, str | None]],
    group_cols: Sequence[str],
) -> pd.DataFrame:
    """Flatten (group_key, verdict, error) triples into a pandas frame."""
    rows = []
    for key, v, err in verdicts:
        row = dict(zip(group_cols, key))
        if v is not None:
            row.update(
                test=v.test,
                score=v.score,
                threshold=v.threshold,
                is_drifted=v.is_drifted,
                p_value=v.p_value,
                reference_size=v.reference_size,
                production_size=v.production_size,
                feature=v.feature_name,
                details=v.details,
                error=None,
            )
        else:
            row.update(
                test=None, score=None, threshold=None, is_drifted=None,
                p_value=None, reference_size=None, production_size=None,
                feature=None, details={}, error=err,
            )
        rows.append(row)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------

def psi_test_grouped(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str] = (),
    threshold: float | None = None,
    n_bins: int | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """PSI per group: ref-quantile bins (±inf caps) -> histogram both sides.

    Two distributed passes (psi.py:154-162 protocol):
      1. exact/approx quantile edges + distinct count from the reference side
      2. bucket both sides against broadcast edges, groupBy(group, side, bin)
    Finalization on (groups x 2 x n_bins) counts driver-side.
    """
    threshold = config.psi_threshold if threshold is None else threshold
    n_bins = config.psi_bins if n_bins is None else n_bins

    # Adaptive plan (same probe as KS/W1): PSI standalone normally pays TWO
    # distributed passes (quantile edges, then histogram-vs-edges); when the
    # per-value sketch fits the collect cap, ONE job + the fused-path driver
    # kernel (exact weighted-percentile edges + searchsorted binning —
    # Spark-percentile parity verified bitwise on the sketch) replaces both.
    # Deliberate: this path ignores config.approx / exact_quantile_plan —
    # under the cap the sketch holds the full distribution, so exact edges
    # are free and the approx knob would only DEGRADE the result at equal
    # cost. An approx=True config therefore silently upgrades to exact
    # whenever the column's distinct count fits the cap; above the cap the
    # distributed fallback below honors the knobs as configured.
    cap = config.sketch_collect_max_rows
    if cap:
        sides = _sides(ref_df, prod_df, column, group_cols)
        per_value = sides.groupBy(*group_cols, "v").agg(
            F.sum(F.when(F.col("side") == _REF, 1).otherwise(0)).alias("c_ref"),
            F.sum(F.when(F.col("side") == _PROD, 1).otherwise(0)).alias("c_prod"),
        )
        pdf_sketch, persisted = _materialize_sketch(per_value, cap)
        if pdf_sketch is not None:
            return _verdict_frame(
                _psi_verdicts_from_sketch(
                    pdf_sketch, group_cols, column, threshold, n_bins
                ),
                group_cols,
            )
        # overflow: the two-pass fallback below re-derives edges from the
        # raw reference side (it never consumes the per-value sketch), so
        # release the probe's cache rather than pin it for nothing
        persisted.unpersist()

    edges = (
        quantile_edges_selection(ref_df, column, n_bins, group_cols, config)
        if (not config.approx and config.exact_quantile_plan == "selection")
        else quantile_edges(ref_df, column, n_bins, group_cols, config)
    )
    # inner edges drop the 0% and 100% quantiles (±inf caps replace them)
    edges = edges.select(
        *group_cols,
        F.slice(F.col("edges"), 2, n_bins - 1).alias("inner_edges"),
        F.col("edges"),
        "ref_distinct",
    )
    sides = _sides(ref_df, prod_df, column, group_cols)
    # LEFT join: a group with production data but no reference rows keeps
    # its side rows with NULL edges, so it gets an error verdict below
    # instead of silently vanishing from the frame (an orphan partition
    # absent from the baseline is exactly the thing to report)
    joined = (
        sides.join(F.broadcast(edges), list(group_cols), "left")
        if group_cols
        else sides.crossJoin(F.broadcast(edges))
    )
    counts = (
        joined.withColumn("bin", bucket_by_edges(F.col("v"), F.col("inner_edges")))
        .groupBy(*group_cols, "side", "bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.first("edges").alias("edges"),
            F.first("ref_distinct").alias("ref_distinct"),
        )
    )
    pdf = counts.toPandas()

    verdicts = []
    if not group_cols and pdf.empty:
        verdicts.append(((), None, "no data"))
    for key, sub in _iter_group_subframes(pdf, group_cols):
        if sub["edges"].iloc[0] is None or (
            isinstance(sub["ref_distinct"].iloc[0], float)
            and np.isnan(sub["ref_distinct"].iloc[0])
        ):
            verdicts.append(
                (key, None, "Reference dataset is empty after removing NaN/inf")
            )
            continue
        if int(sub["ref_distinct"].iloc[0]) <= 1:
            verdicts.append(
                (key, None, "Reference distribution is constant — PSI requires variance")
            )
            continue
        rc = np.zeros(n_bins, dtype=np.int64)
        pc = np.zeros(n_bins, dtype=np.int64)
        bins = sub["bin"].to_numpy(dtype=np.int64)
        cnts = sub["cnt"].to_numpy(dtype=np.int64)
        is_ref = (sub["side"] == _REF).to_numpy()
        np.add.at(rc, bins[is_ref], cnts[is_ref])
        np.add.at(pc, bins[~is_ref], cnts[~is_ref])
        if rc.sum() == 0:
            verdicts.append((key, None, "Reference dataset is empty after removing NaN/inf"))
            continue
        if pc.sum() == 0:
            verdicts.append((key, None, "Production dataset is empty after removing NaN/inf"))
            continue
        edges_arr = sub["edges"].iloc[0]
        v = psi_from_counts(rc, pc, threshold, bin_edges=edges_arr, feature_name=column)
        verdicts.append((key, v, None))
    return _verdict_frame(verdicts, group_cols)


def _psi_kernel(
    v: np.ndarray,
    cr: np.ndarray,
    cp: np.ndarray,
    n_bins: int,
    threshold: float,
    column: str,
) -> tuple[DriftVerdict | None, str | None]:
    """PSI from one group's sorted per-value sketch: exact weighted-percentile
    edges from the reference counts (Spark `percentile` parity — verified
    bitwise over (value, count) sketches), searchsorted binning, then the
    same ``psi_from_counts`` finalize as the distributed two-pass plan.
    Shared by ``fused_tests_from_sketch`` and the adaptive
    ``psi_test_grouped`` fast path."""
    n_ref, n_prod = int(cr.sum()), int(cp.sum())
    if n_ref == 0:
        return None, "Reference dataset is empty after removing NaN/inf"
    ref_mask = cr > 0
    if int(ref_mask.sum()) <= 1:
        return None, "Reference distribution is constant — PSI requires variance"
    if n_prod == 0:
        return None, "Production dataset is empty after removing NaN/inf"
    probs = np.linspace(0.0, 1.0, n_bins + 1)
    edges = _weighted_percentiles(v[ref_mask], cr[ref_mask], probs)
    inner = edges[1:-1]
    bins = np.searchsorted(inner, v, side="right")
    rc = np.zeros(n_bins, dtype=np.int64)
    pc = np.zeros(n_bins, dtype=np.int64)
    np.add.at(rc, bins, cr)
    np.add.at(pc, bins, cp)
    return (
        psi_from_counts(
            rc, pc, threshold, bin_edges=edges, feature_name=column
        ),
        None,
    )


def _psi_verdicts_from_sketch(
    sketch_pdf: pd.DataFrame,
    group_cols: Sequence[str],
    column: str,
    threshold: float,
    n_bins: int,
) -> list[tuple[tuple, DriftVerdict | None, str | None]]:
    """Per-group ``_psi_kernel`` over a collected per-value sketch
    (one hash-groupby pass — O(sketch_rows), not O(groups x sketch_rows))."""
    sketch_pdf = sketch_pdf[sketch_pdf["v"].notna()]
    verdicts: list[tuple[tuple, DriftVerdict | None, str | None]] = []
    for key, sub in _iter_group_subframes(sketch_pdf, group_cols):
        sub = sub.sort_values("v")
        v = sub["v"].to_numpy(dtype=np.float64)
        cr = sub["c_ref"].to_numpy(dtype=np.int64)
        cp = sub["c_prod"].to_numpy(dtype=np.int64)
        verdict, err = _psi_kernel(v, cr, cp, n_bins, threshold, column)
        verdicts.append((key, verdict, err))
    if not verdicts and not group_cols:
        verdicts.append(
            ((), None, "Reference dataset is empty after removing NaN/inf")
        )
    return verdicts


def psi_test(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    threshold: float | None = None,
    n_bins: int | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DriftVerdict:
    """Single-pair PSI with the reference's ValueError semantics (psi.py:145-152)."""
    threshold = config.psi_threshold if threshold is None else threshold
    n_bins = config.psi_bins if n_bins is None else n_bins
    frame = psi_test_grouped(ref_df, prod_df, column, (), threshold, n_bins, config)
    return _single(frame, "psi", threshold, column)


# ---------------------------------------------------------------------------
# KS
# ---------------------------------------------------------------------------

def _ks_verdicts_from_sketch(
    sketch_pdf: pd.DataFrame,
    group_cols: Sequence[str],
    column: str,
    threshold: float,
    config: EngineConfig,
) -> list[tuple[tuple, DriftVerdict | None, str | None]]:
    """Per-group exact KS (D = max ECDF gap) over a collected per-value
    sketch — the driver half of the adaptive plan in ``ks_test_grouped``;
    identical math to the fused-sketch KS path. One hash-groupby pass —
    O(sketch_rows), not O(groups x sketch_rows)."""
    sketch_pdf = sketch_pdf[sketch_pdf["v"].notna()]
    verdicts: list[tuple[tuple, DriftVerdict | None, str | None]] = []
    for key, sub in _iter_group_subframes(sketch_pdf, group_cols):
        sub = sub.sort_values("v")
        cr = sub["c_ref"].to_numpy(dtype=np.int64)
        cp = sub["c_prod"].to_numpy(dtype=np.int64)
        n_ref, n_prod = int(cr.sum()), int(cp.sum())
        if n_ref == 0:
            verdicts.append(
                (key, None, "Reference dataset contains only NaN/inf values")
            )
        elif n_prod == 0:
            verdicts.append(
                (key, None, "Production dataset contains only NaN/inf values")
            )
        else:
            d = float(
                np.max(np.abs(np.cumsum(cr) / n_ref - np.cumsum(cp) / n_prod))
            )
            verdicts.append(
                (
                    key,
                    ks_verdict(d, n_ref, n_prod, threshold, column,
                               method=config.ks_pvalue_method),
                    None,
                )
            )
    if not verdicts and not group_cols:
        verdicts.append(
            ((), None, "Reference dataset contains only NaN/inf values")
        )
    return verdicts


def ks_test_grouped(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str] = (),
    threshold: float | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """Exact distributed KS statistic per group.

    Pre-aggregates to per-(group, distinct value) counts, then the
    range-partitioned two-pass prefix sum (``_cumulative_per_value``) builds
    both ECDFs with every stage fully parallel — no single-reducer window
    sort; D = max |F_ref - F_prod|.
    """
    threshold = config.ks_threshold if threshold is None else threshold
    sides = _sides(ref_df, prod_df, column, group_cols)
    per_value = sides.groupBy(*group_cols, "v").agg(
        F.sum(F.when(F.col("side") == _REF, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("side") == _PROD, 1).otherwise(0)).alias("c_prod"),
    )
    # Adaptive plan (same probe as wasserstein_test_grouped): one job +
    # driver ECDF sweep when the distinct-value set fits the cap; on
    # overflow the fully distributed prefix-sum plan reuses the persisted
    # sketch (its 3 consumers would otherwise each recompute the
    # corpus-scale aggregation).
    cap = config.sketch_collect_max_rows
    persisted = None
    if cap:
        pdf_sketch, persisted = _materialize_sketch(per_value, cap)
        if pdf_sketch is not None:
            return _verdict_frame(
                _ks_verdicts_from_sketch(
                    pdf_sketch, group_cols, column, threshold, config
                ),
                group_cols,
            )
        per_value = persisted
    try:
        cum = _cumulative_per_value(per_value, group_cols, ["c_ref", "c_prod"])
        stats = cum.groupBy(*group_cols).agg(
            F.max("total_c_ref").alias("n_ref"),
            F.max("total_c_prod").alias("n_prod"),
            F.max(
                F.abs(
                    F.try_divide(F.col("cum_c_ref"), F.col("total_c_ref"))
                    - F.try_divide(F.col("cum_c_prod"), F.col("total_c_prod"))
                )
            ).alias("d"),
        )
        pdf = stats.toPandas()
    finally:
        if persisted is not None:
            persisted.unpersist()
    verdicts = []
    for _, r in pdf.iterrows():
        key = tuple(r[g] for g in group_cols)
        n, m = int(r["n_ref"] or 0), int(r["n_prod"] or 0)
        if n == 0:
            verdicts.append((key, None, "Reference dataset contains only NaN/inf values"))
        elif m == 0:
            verdicts.append((key, None, "Production dataset contains only NaN/inf values"))
        else:
            verdicts.append((
                key,
                ks_verdict(float(r["d"]), n, m, threshold, column,
                           method=config.ks_pvalue_method),
                None,
            ))
    if not pdf.shape[0] and not group_cols:
        verdicts.append(((), None, "Reference dataset contains only NaN/inf values"))
    return _verdict_frame(verdicts, group_cols)


def ks_test(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    threshold: float | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DriftVerdict:
    threshold = config.ks_threshold if threshold is None else threshold
    frame = ks_test_grouped(ref_df, prod_df, column, (), threshold, config)
    return _single(frame, "ks", threshold, column)


# ---------------------------------------------------------------------------
# JS / Hellinger (shared equal-width binning over the combined range)
# ---------------------------------------------------------------------------

def _binned_counts_shared_range(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str],
    n_bins: int,
    domain: tuple[float, float] | None = None,
) -> pd.DataFrame:
    """Equal-width bins over combined min/max (jensen_shannon.py:53-59).

    With ``domain=(lo, hi)`` given (e.g. token ids: [0, vocab)), the min/max
    pre-pass and the broadcast range join disappear — binning becomes literal
    arithmetic fused into one single-pass aggregation. Use it whenever the
    column's bounds are known a priori; it is the scale path.
    """
    sides = _sides(ref_df, prod_df, column, group_cols)
    if domain is not None:
        lo, hi = float(domain[0]), float(domain[1])
        width = (hi - lo) / n_bins
        raw = F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int")
        bin_col = (
            F.when(F.col("v") == F.lit(hi), F.lit(n_bins - 1))
            .otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)))
        )
        return (
            sides.withColumn("bin", bin_col)
            .groupBy(*group_cols, "side", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .toPandas()
        )
    ranges = sides.groupBy(*group_cols).agg(
        F.min("v").alias("_lo"), F.max("v").alias("_hi")
    )
    joined = (
        sides.join(F.broadcast(ranges), list(group_cols), "inner")
        if group_cols
        else sides.crossJoin(F.broadcast(ranges))
    )
    # np.linspace edge semantics; degenerate lo==hi puts everything in bin 0
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    raw = F.floor((F.col("v") - F.col("_lo")) / width).cast("int")
    bin_col = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .when(F.col("v") == F.col("_hi"), F.lit(n_bins - 1))
        .otherwise(F.least(raw, F.lit(n_bins - 1)))
    )
    return (
        joined.withColumn("bin", bin_col)
        .groupBy(*group_cols, "side", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .toPandas()
    )


def binned_counts_fixed_domain_arrow(
    df: DataFrame,
    code_col: str,
    arr_col: str,
    n_bins: int,
    domain: tuple[float, float],
) -> DataFrame:
    """Fixed-domain binned counts of an ARRAY column with NO explode.

    The explode plan materializes one row per token through whole-stage
    codegen and a hash aggregate — at 10^12 tokens that is the dominant
    stage of the whole validation pass (measured alpha ~0.96 of the batch
    wall). This path keeps the arrays packed: each Arrow batch flattens to
    one numpy vector (zero-copy-ish), bins with the SAME double arithmetic
    as the codegen expression (bitwise-identical `floor((v-lo)/width)`), and
    bincounts into <= groups x n_bins partial rows per batch — so the
    shuffle moves thousands of pre-aggregated rows instead of billions of
    token rows. Output: (code_col int, bin int, cnt long) partials; sum
    downstream. Input ``code_col`` must be a small int group code
    (int-coded partition key); NULL arrays contribute nothing (explode
    parity).
    """
    lo, hi = float(domain[0]), float(domain[1])
    width = (hi - lo) / n_bins
    out_schema = T.StructType(
        [
            T.StructField(code_col, T.IntegerType()),
            T.StructField("bin", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def hist_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            arr = rb.column(1)
            codes_col = rb.column(0)
            # per-list lengths with NULL lists as 0 — aligns np.repeat with
            # flatten(), which contributes nothing for null entries
            lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            if int(lens.sum()) == 0:
                continue
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            codes = np.repeat(
                codes_col.to_numpy(zero_copy_only=False).astype(np.int64),
                lens,
            )
            # explode parity: clean_values drops NULL/NaN/inf elements, and
            # flatten() keeps element-level nulls (as NaN after to_numpy) —
            # mask them out or floor(NaN)->INT64_MIN crashes bincount
            keep = np.isfinite(flat)
            if not keep.all():
                flat = flat[keep]
                codes = codes[keep]
                if flat.size == 0:
                    continue
            # same double arithmetic as the codegen expression in
            # _binned_counts_shared_range's domain branch
            raw = np.floor((flat - lo) / width)
            bins = np.clip(raw, 0, n_bins - 1).astype(np.int64)
            bins[flat == hi] = n_bins - 1
            combined = codes * n_bins + bins
            counts = np.bincount(combined)
            nz = np.nonzero(counts)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array((nz // n_bins).astype(np.int32), pa.int32()),
                    pa.array((nz % n_bins).astype(np.int32), pa.int32()),
                    pa.array(counts[nz].astype(np.int64), pa.int64()),
                ],
                names=[code_col, "bin", "cnt"],
            )

    return (
        df.select(code_col, arr_col)
        .mapInArrow(hist_batches, out_schema)
        .groupBy(code_col, "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _histogram_pair_test(
    kernel,
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str],
    threshold: float,
    n_bins: int,
    domain: tuple[float, float] | None = None,
) -> pd.DataFrame:
    pdf = _binned_counts_shared_range(
        ref_df, prod_df, column, group_cols, n_bins, domain
    )
    return _kernel_over_binned_counts(kernel, pdf, group_cols, n_bins, threshold, column)


def _kernel_over_binned_counts(
    kernel, pdf: pd.DataFrame, group_cols: Sequence[str], n_bins: int,
    threshold: float, column: str,
) -> pd.DataFrame:
    verdicts = []
    for key, sub in _iter_group_subframes(pdf, group_cols):
        rc = np.zeros(n_bins, dtype=np.int64)
        pc = np.zeros(n_bins, dtype=np.int64)
        bins = sub["bin"].to_numpy(dtype=np.int64)
        cnts = sub["cnt"].to_numpy(dtype=np.int64)
        is_ref = (sub["side"] == _REF).to_numpy()
        np.add.at(rc, bins[is_ref], cnts[is_ref])
        np.add.at(pc, bins[~is_ref], cnts[~is_ref])
        if rc.sum() == 0:
            verdicts.append((key, None, "Reference dataset is empty after removing NaN/inf"))
        elif pc.sum() == 0:
            verdicts.append((key, None, "Production dataset is empty after removing NaN/inf"))
        else:
            verdicts.append((key, kernel(rc, pc, threshold, feature_name=column), None))
    if not verdicts and not group_cols:
        verdicts.append(((), None, "Reference dataset is empty after removing NaN/inf"))
    return _verdict_frame(verdicts, group_cols)


def histogram_kernel_from_counts(
    counts_pdf: pd.DataFrame,
    kernel_name: str,
    group_cols: Sequence[str],
    n_bins: int,
    threshold: float,
    feature: str = "unknown",
) -> pd.DataFrame:
    """Run a drift kernel over pre-computed binned counts (one collect reused
    by several kernels — the validation plan's token-histogram path).

    ``kernel_name``: 'js' | 'hellinger' | 'chi2' (chi2 treats the bins as
    categories — a bucketed chi-squared, the standard coarsening for
    high-cardinality domains like token ids).
    """
    if kernel_name == "js":
        return _kernel_over_binned_counts(
            js_from_counts, counts_pdf, group_cols, n_bins, threshold, feature
        )
    if kernel_name == "hellinger":
        return _kernel_over_binned_counts(
            hellinger_from_counts, counts_pdf, group_cols, n_bins, threshold, feature
        )
    if kernel_name == "chi2":
        def chi2_kernel(rc, pc, thr, feature_name):
            cats = [str(i) for i in range(len(rc))]
            return chi2_from_counts(cats, rc, pc, thr, feature_name=feature_name)

        return _kernel_over_binned_counts(
            chi2_kernel, counts_pdf, group_cols, n_bins, threshold, feature
        )
    raise ValueError(f"unknown kernel {kernel_name!r}")


def js_test_grouped(
    ref_df, prod_df, column, group_cols=(), threshold=None, n_bins=None,
    config: EngineConfig = DEFAULT_CONFIG, domain=None,
) -> pd.DataFrame:
    threshold = config.js_threshold if threshold is None else threshold
    n_bins = config.hist_bins if n_bins is None else n_bins
    return _histogram_pair_test(
        js_from_counts, ref_df, prod_df, column, group_cols, threshold, n_bins,
        domain,
    )


def js_test(ref_df, prod_df, column, threshold=None, n_bins=None,
            config: EngineConfig = DEFAULT_CONFIG) -> DriftVerdict:
    threshold = config.js_threshold if threshold is None else threshold
    frame = js_test_grouped(ref_df, prod_df, column, (), threshold, n_bins, config)
    return _single(frame, "jensen_shannon", threshold, column)


def hellinger_test_grouped(
    ref_df, prod_df, column, group_cols=(), threshold=None, n_bins=None,
    config: EngineConfig = DEFAULT_CONFIG, domain=None,
) -> pd.DataFrame:
    threshold = config.hellinger_threshold if threshold is None else threshold
    n_bins = config.hist_bins if n_bins is None else n_bins
    return _histogram_pair_test(
        hellinger_from_counts, ref_df, prod_df, column, group_cols, threshold,
        n_bins, domain,
    )


def hellinger_test(ref_df, prod_df, column, threshold=None, n_bins=None,
                   config: EngineConfig = DEFAULT_CONFIG) -> DriftVerdict:
    threshold = config.hellinger_threshold if threshold is None else threshold
    frame = hellinger_test_grouped(ref_df, prod_df, column, (), threshold, n_bins, config)
    return _single(frame, "hellinger", threshold, column)


# ---------------------------------------------------------------------------
# Wasserstein-1
# ---------------------------------------------------------------------------

def _w1_kernel(
    v: np.ndarray,
    cr: np.ndarray,
    cp: np.ndarray,
    threshold: float,
    column: str,
) -> tuple[DriftVerdict | None, str | None]:
    """IQR-normalized W1 from one group's sorted (value, c_ref, c_prod) rows.

    Same math as the distributed plan (CDF-gap integral over sorted distinct
    union values, wasserstein.py:20-75 semantics): W1 = Σ |F_ref − F_prod|·Δv;
    IQR / population-std / 1.0 normalization ladder from the SAME sketch
    (exact weighted percentiles — Spark `percentile` parity ≤ 1 ulp).
    """
    n_ref, n_prod = int(cr.sum()), int(cp.sum())
    if n_ref == 0 or n_prod == 0:
        return None, "empty side after removing NaN/inf"
    if len(v) > 1:
        gap = np.abs(np.cumsum(cr) / n_ref - np.cumsum(cp) / n_prod)[:-1]
        w1 = float(np.sum(gap * np.diff(v)))
    else:
        w1 = 0.0
    ref_mask = cr > 0
    q = _weighted_percentiles(
        v[ref_mask], cr[ref_mask], np.array([0.25, 0.75])
    )
    iqr = float(q[1] - q[0])
    if iqr < 1e-10:
        mean = float(np.sum(v[ref_mask] * cr[ref_mask])) / n_ref
        std = float(
            np.sqrt(np.sum(cr[ref_mask] * (v[ref_mask] - mean) ** 2) / n_ref)
        )
        iqr = std or 1.0
    score = w1 / iqr
    return (
        DriftVerdict(
            test="wasserstein",
            score=score,
            threshold=threshold,
            is_drifted=bool(score > threshold),
            reference_size=n_ref,
            production_size=n_prod,
            feature_name=column,
            details={"raw_distance": w1, "iqr": iqr},
        ),
        None,
    )


def _w1_verdicts_from_sketch(
    sketch_pdf: pd.DataFrame,
    group_cols: Sequence[str],
    column: str,
    threshold: float,
) -> list[tuple[tuple, DriftVerdict | None, str | None]]:
    """Per-group `_w1_kernel` over a collected per-value sketch (one
    hash-groupby pass — O(sketch_rows), not O(groups x sketch_rows))."""
    sketch_pdf = sketch_pdf[sketch_pdf["v"].notna()]
    verdicts: list[tuple[tuple, DriftVerdict | None, str | None]] = []
    for key, sub in _iter_group_subframes(sketch_pdf, group_cols):
        sub = sub.sort_values("v")
        v = sub["v"].to_numpy(dtype=np.float64)
        cr = sub["c_ref"].to_numpy(dtype=np.int64)
        cp = sub["c_prod"].to_numpy(dtype=np.int64)
        verdict, err = _w1_kernel(v, cr, cp, threshold, column)
        verdicts.append((key, verdict, err))
    if not verdicts and not group_cols:
        verdicts.append(((), None, "empty side after removing NaN/inf"))
    return verdicts


def wasserstein_test_grouped(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str] = (),
    threshold: float | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """IQR-normalized W1 per group, computed as the exact CDF-gap integral.

    W1 = Σ_i |F_ref(v_i) − F_prod(v_i)| · (v_{i+1} − v_i) over sorted distinct
    union values — identical to scipy.stats.wasserstein_distance. Same
    pre-aggregate + parallel prefix-sum structure as KS (``next_v`` stitches
    the CDF-gap widths across range-chunk boundaries); the IQR (fallback
    population std, fallback 1.0 — wasserstein.py:52-56) fuses into the same job.
    """
    threshold = config.wasserstein_threshold if threshold is None else threshold
    sides = _sides(ref_df, prod_df, column, group_cols)
    per_value = sides.groupBy(*group_cols, "v").agg(
        F.sum(F.when(F.col("side") == _REF, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("side") == _PROD, 1).otherwise(0)).alias("c_prod"),
    )
    # Adaptive plan: ONE job (sketch -> bounded collect -> numpy kernel,
    # IQR/std fused from the same sketch) when the distinct-value set fits
    # the probe cap — the common case, and 3 fewer Spark jobs than the
    # distributed path (no approxQuantile pass, no chunk windows, no
    # percentile aggregation). A cap overflow means distinct ~ rows
    # (continuous column at scale): fall through to the prefix-sum plan,
    # whose every stage stays parallel, paying the probe as one extra
    # aggregation pass only in that case.
    cap = config.sketch_collect_max_rows
    persisted = None
    if cap:
        pdf_sketch, persisted = _materialize_sketch(per_value, cap)
        if pdf_sketch is not None:
            verdicts = _w1_verdicts_from_sketch(
                pdf_sketch, group_cols, column, threshold
            )
            return _verdict_frame(verdicts, group_cols)
        per_value = persisted
    try:
        cum = _cumulative_per_value(
            per_value, group_cols, ["c_ref", "c_prod"], with_next_value=True
        )
        dist = cum.groupBy(*group_cols).agg(
            F.sum(
                F.abs(
                    F.try_divide(F.col("cum_c_ref"), F.col("total_c_ref"))
                    - F.try_divide(F.col("cum_c_prod"), F.col("total_c_prod"))
                )
                * F.coalesce(F.col("next_v") - F.col("v"), F.lit(0.0))
            ).alias("w1"),
            F.max("total_c_ref").alias("n_ref"),
            F.max("total_c_prod").alias("n_prod"),
        )
        # reference-side IQR + population std for normalization
        refstats = clean_values(ref_df, column, group_cols)
        iqr_agg = refstats.groupBy(*group_cols).agg(
            F.percentile(F.col("v"), F.array(F.lit(0.25), F.lit(0.75))).alias("q"),
            F.stddev_pop("v").alias("std"),
        )
        joined = (
            dist.join(iqr_agg, list(group_cols), "left") if group_cols
            else dist.crossJoin(iqr_agg)
        )
        pdf = joined.toPandas()
    finally:
        if persisted is not None:
            persisted.unpersist()
    verdicts = []
    for _, r in pdf.iterrows():
        key = tuple(r[g] for g in group_cols)
        n, m = int(r["n_ref"] or 0), int(r["n_prod"] or 0)
        if n == 0 or m == 0:
            verdicts.append((key, None, "empty side after removing NaN/inf"))
            continue
        q = r["q"]
        iqr = float(q[1] - q[0]) if q is not None else 0.0
        if iqr < 1e-10:
            iqr = float(r["std"] or 0.0) or 1.0
        score = float(r["w1"]) / iqr
        verdicts.append(
            (
                key,
                DriftVerdict(
                    test="wasserstein",
                    score=score,
                    threshold=threshold,
                    is_drifted=bool(score > threshold),
                    reference_size=n,
                    production_size=m,
                    feature_name=column,
                    details={"raw_distance": float(r["w1"]), "iqr": iqr},
                ),
                None,
            )
        )
    if not verdicts and not group_cols:
        verdicts.append(((), None, "empty side after removing NaN/inf"))
    return _verdict_frame(verdicts, group_cols)


def wasserstein_test(ref_df, prod_df, column, threshold=None,
                     config: EngineConfig = DEFAULT_CONFIG) -> DriftVerdict:
    threshold = config.wasserstein_threshold if threshold is None else threshold
    frame = wasserstein_test_grouped(ref_df, prod_df, column, (), threshold, config)
    return _single(frame, "wasserstein", threshold, column)


# ---------------------------------------------------------------------------
# Chi-squared (categorical)
# ---------------------------------------------------------------------------

def _guarded_category_counts(
    per_cat: DataFrame, group_cols: Sequence[str], cap: int
) -> DataFrame:
    """Two-phase distributed top-K over per-(group, v) count rows.

    Phase 1 ranks WITHIN each shuffle partition (parallel window keyed by
    spark_partition_id — a row outside its partition's top-K cannot be in
    the global top-K under the strict (count desc, value asc) total order)
    and pre-aggregates each partition's tail. Phase 2 ranks the surviving
    candidates globally; that window's exchange moves <= partitions x cap
    rows per group — BOUNDED by construction, never data-proportional —
    and its losers fold into the tail. One plan, one action: both phases
    consume the same ranked subtree, so the per-category aggregation is
    computed once (exchange reuse). Output: (group..., _is_other, v,
    c_ref, c_prod, n_cats) — exactly groups x (cap + 1) rows.
    """
    gcols = [F.col(g) for g in group_cols]
    order = [F.desc(F.col("c_ref") + F.col("c_prod")), F.col("v")]
    w_local = Window.partitionBy(*gcols, F.col("_pid")).orderBy(*order)
    ranked = per_cat.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lr", F.row_number().over(w_local)
    )
    cand = ranked.where(F.col("_lr") <= cap)
    w_global = Window.partitionBy(*gcols).orderBy(*order)
    graded = cand.withColumn("_gr", F.row_number().over(w_global))
    kept = graded.where(F.col("_gr") <= cap).select(
        *group_cols,
        F.lit(False).alias("_is_other"),
        F.col("v"),
        F.col("c_ref"),
        F.col("c_prod"),
        F.lit(1).cast("long").alias("n_cats"),
    )
    v_type = per_cat.schema["v"].dataType
    tail = (
        ranked.where(F.col("_lr") > cap)
        .select(*group_cols, "c_ref", "c_prod")
        .unionByName(
            graded.where(F.col("_gr") > cap).select(*group_cols, "c_ref", "c_prod")
        )
        .groupBy(*group_cols)
        .agg(
            F.sum("c_ref").alias("c_ref"),
            F.sum("c_prod").alias("c_prod"),
            F.count(F.lit(1)).alias("n_cats"),
        )
        # an ungrouped global agg over EMPTY input still emits one
        # (NULL, NULL, 0) row — drop it
        .where(F.col("n_cats") > 0)
        .select(
            *group_cols,
            F.lit(True).alias("_is_other"),
            F.lit(None).cast(v_type).alias("v"),
            F.col("c_ref"),
            F.col("c_prod"),
            F.col("n_cats"),
        )
    )
    return kept.unionByName(tail)


def _phase1_folded_counts(
    per_cat: DataFrame, group_cols: Sequence[str], cap: int
) -> DataFrame:
    """Phase 1 of the top-K guard as ONE conditional aggregation.

    Ranks within each shuffle partition (parallel window — a row outside its
    partition's top-K cannot be in the global top-K under the strict
    (count desc, value asc) total order), then folds winners and losers in a
    single groupBy: winners keep their own ``v`` key, losers collapse onto a
    NULL key (``_sides`` filters NULL values, so NULL is free as a marker).
    The ranked subtree is consumed exactly ONCE — no union, no second
    window, no reliance on exchange reuse. Output is bounded by
    groups x (shuffle_partitions x cap + 1) rows; phase 2 (the global
    top-K among candidates) runs driver-side on the collected fold
    (``_phase2_topk_pdf``) in the common case, or falls back to the
    distributed ``_guarded_category_counts`` when the fold overflows the
    collect probe.
    """
    gcols = [F.col(g) for g in group_cols]
    order = [F.desc(F.col("c_ref") + F.col("c_prod")), F.col("v")]
    w_local = Window.partitionBy(*gcols, F.col("_pid")).orderBy(*order)
    ranked = per_cat.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lr", F.row_number().over(w_local)
    )
    return ranked.groupBy(
        *group_cols, F.when(F.col("_lr") <= cap, F.col("v")).alias("v")
    ).agg(
        F.sum("c_ref").alias("c_ref"),
        F.sum("c_prod").alias("c_prod"),
        F.count(F.lit(1)).alias("n_cats"),
    )


def _phase2_topk_pdf(
    pdf: pd.DataFrame, group_cols: Sequence[str], cap: int
) -> pd.DataFrame:
    """Driver half of the top-K guard: global rank over the bounded fold.

    Per group: sort candidates by (pooled count desc, value asc) — the same
    strict total order as the partition-local rank — keep the top ``cap``,
    fold the losers into the NULL-key tail row. Returns the exact schema the
    distributed ``_guarded_category_counts`` collects: (group..., _is_other,
    v, c_ref, c_prod, n_cats), at most groups x (cap + 1) rows.
    """
    out_rows: list[dict] = []
    for key, sub in _iter_group_subframes(pdf, group_cols):
        gdict = dict(zip(group_cols, key))
        cand = sub[sub["v"].notna()].copy()
        cand["_pooled"] = cand["c_ref"] + cand["c_prod"]
        cand = cand.sort_values(
            ["_pooled", "v"], ascending=[False, True], kind="mergesort"
        )
        winners = cand.iloc[:cap]
        losers = cand.iloc[cap:]
        tail = sub[sub["v"].isna()]
        for _, r in winners.iterrows():
            out_rows.append(
                {**gdict, "_is_other": False, "v": r["v"],
                 "c_ref": int(r["c_ref"]), "c_prod": int(r["c_prod"]),
                 "n_cats": 1}
            )
        n_collapsed = int(tail["n_cats"].sum()) + len(losers)
        if n_collapsed:
            out_rows.append(
                {**gdict, "_is_other": True, "v": None,
                 "c_ref": int(tail["c_ref"].sum()) + int(losers["c_ref"].sum()),
                 "c_prod": int(tail["c_prod"].sum()) + int(losers["c_prod"].sum()),
                 "n_cats": n_collapsed}
            )
    return pd.DataFrame(
        out_rows,
        columns=[*group_cols, "_is_other", "v", "c_ref", "c_prod", "n_cats"],
    )


def _iter_group_subframes(pdf: pd.DataFrame, group_cols: Sequence[str]):
    """Yield ``(key_tuple, sub_frame)`` per distinct group via ONE pandas
    hash-groupby pass — O(sketch_rows) total, replacing the per-key
    re-masking of the full collected frame (O(groups x sketch_rows)) that
    became a driver bottleneck at 10k+ groups near the sketch cap.

    Groups appear in first-occurrence order (``sort=False``), matching the
    old ``drop_duplicates().itertuples()`` iteration. NULL keys are kept
    (``dropna=False``), NaN grouping with NaN (the old code used an
    explicit isna() mask for this). Key values are read
    back from each subframe's first row rather than from pandas' groupby
    labels, so the tuples carry the exact stored objects (None stays None
    in object columns, numpy scalars keep their dtype) — byte-identical to
    what ``itertuples`` produced.
    """
    if not group_cols:
        if len(pdf):
            yield (), pdf
        return
    gcols = list(group_cols)
    for _, sub in pdf.groupby(gcols, sort=False, dropna=False):
        yield tuple(sub[g].iloc[0] for g in gcols), sub


def chi2_test_grouped(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str] = (),
    threshold: float | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """Chi-squared GoF per group over category counts.

    Category alignment = groupBy counts per side + pandas outer alignment
    (the distributed analogue of the reference's sorted key-union,
    chi_squared.py:140-149). Values are cast to string (chi_squared.py:194).

    Driver-memory guard: only the top ``config.chi2_max_categories``
    categories per group (by pooled count, ties broken by value) collect
    individually; the tail collapses into one logged ``__other__`` bucket,
    so the collect stays O(groups x K) regardless of column cardinality.
    The top-K is two-phase: a parallel per-shuffle-partition rank prunes
    the data-proportional set (phase 1, ``_phase1_folded_counts`` — one
    conditional aggregation, ranked subtree consumed once), then the global
    rank over the bounded candidate fold runs driver-side
    (``_phase2_topk_pdf``) when the fold fits the collect probe — the
    common case, one Spark job end-to-end — or distributed
    (``_guarded_category_counts``) when it doesn't. Either way the global
    rank touches <= partitions x K rows per group, never a window over all
    distinct values, and under the cap the result is identical to the
    unguarded test. For domains where even the distinct set is huge
    (e.g. token ids) use the fixed-domain binned path
    (``histogram_kernel_from_counts``) instead.
    """
    threshold = config.chi2_threshold if threshold is None else threshold
    cap = config.chi2_max_categories
    sides = _sides(ref_df, prod_df, column, group_cols, cast_double=False)
    # group on the NATIVE type — string hash-aggregation is ~15x slower on
    # wide explode inputs; stringify categories in the tiny finalize instead
    # (the reference's str coercion, chi_squared.py:194, applied post-agg)
    per_cat = sides.groupBy(*group_cols, "v").agg(
        F.sum(F.when(F.col("side") == _REF, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("side") == _PROD, 1).otherwise(0)).alias("c_prod"),
    )
    # Adaptive phase 2: collect the bounded phase-1 fold and rank in the
    # driver (one Spark job, ranked subtree consumed once) unless the fold
    # overflows the probe cap — then the fully distributed two-phase plan.
    probe_cap = config.sketch_collect_max_rows
    folded = (
        _phase1_folded_counts(per_cat, group_cols, cap)
        .limit(probe_cap + 1)
        .toPandas()
        if probe_cap
        else None
    )
    if folded is not None and len(folded) <= probe_cap:
        pdf = _phase2_topk_pdf(folded, group_cols, cap)
    else:
        pdf = _guarded_category_counts(per_cat, group_cols, cap).toPandas()
    # preserve the reference's python str() coercion for kept categories
    pdf["v"] = np.where(
        pdf["_is_other"], "__other__", pdf["v"].astype(str)
    )
    verdicts = []
    for key, sub in _iter_group_subframes(pdf, group_cols):
        ref_counts = dict(zip(sub["v"], sub["c_ref"]))
        prod_counts = dict(zip(sub["v"], sub["c_prod"]))
        cats = sorted(k for k in set(ref_counts) | set(prod_counts))
        n_collapsed = int(sub[sub["_is_other"]]["n_cats"].sum())
        if not any(ref_counts.get(c, 0) > 0 for c in cats):
            verdicts.append((key, None, "reference_counts must not be empty"))
            continue
        try:
            v = chi2_from_counts(
                cats,
                [int(ref_counts.get(c, 0)) for c in cats],
                [int(prod_counts.get(c, 0)) for c in cats],
                threshold,
                feature_name=column,
            )
            if n_collapsed:
                v.details["other_bucket_categories"] = n_collapsed
                v.details["max_categories"] = cap
            verdicts.append((key, v, None))
        except ValueError as e:
            verdicts.append((key, None, str(e)))
    if not verdicts and not group_cols:
        verdicts.append(((), None, "reference_counts must not be empty"))
    return _verdict_frame(verdicts, group_cols)


def chi2_test(ref_df, prod_df, column, threshold=None,
              config: EngineConfig = DEFAULT_CONFIG) -> DriftVerdict:
    threshold = config.chi2_threshold if threshold is None else threshold
    frame = chi2_test_grouped(ref_df, prod_df, column, (), threshold, config)
    return _single(frame, "chi_squared", threshold, column)


# ---------------------------------------------------------------------------
# Fused per-value-sketch path: ONE distributed pass feeds PSI + KS + JS
# ---------------------------------------------------------------------------

def per_value_sketch(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str] = (),
    keep_nulls: bool = False,
) -> DataFrame:
    """One aggregation producing per-(group, distinct value) side counts.

    The shared scan for ``fused_tests_from_sketch``: PSI, KS, and JS all
    reduce to functions of the (v, c_ref, c_prod) sketch, so running them as
    three separate grouped tests costs three full scans of both tables plus
    three sets of driver/codegen latency — the Amdahl term that capped
    end-to-end 8->32 scaling at 0.66 in round 1. Intended for columns whose
    distinct-value set is bounded (token counts, categorical ints); for
    unbounded continuous columns use the individual *_test_grouped operators,
    whose distributed prefix-sum path never collects the sketch.

    ``keep_nulls=True`` skips the finite filter so NULL values appear as one
    ``v IS NULL`` row per group — letting ``profile_from_sketch`` compute
    null fractions and total row counts from the SAME scan (intended for
    integral columns, where null is the only non-finite state; drift kernels
    drop the null rows driver-side).
    """
    if keep_nulls:
        def prep(df: DataFrame, side: int) -> DataFrame:
            return df.select(
                *group_cols,
                F.lit(side).alias("side"),
                F.col(column).cast("double").alias("v"),
            )

        sides = prep(ref_df, _REF).unionByName(prep(prod_df, _PROD))
    else:
        sides = _sides(ref_df, prod_df, column, group_cols)
    return sides.groupBy(*group_cols, "v").agg(
        F.sum(F.when(F.col("side") == _REF, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("side") == _PROD, 1).otherwise(0)).alias("c_prod"),
    )


def _weighted_percentiles(
    values: np.ndarray, counts: np.ndarray, probs: np.ndarray
) -> np.ndarray:
    """Exact percentiles of the expanded multiset (Spark F.percentile /
    numpy 'linear' semantics) from (sorted value, count) pairs."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    k = probs * (n - 1)
    lo_idx = np.searchsorted(cum, np.floor(k), side="right")
    hi_idx = np.searchsorted(cum, np.ceil(k), side="right")
    lo, hi = values[lo_idx], values[hi_idx]
    return lo + (k - np.floor(k)) * (hi - lo)


def fused_tests_from_sketch(
    sketch_pdf: pd.DataFrame,
    group_cols: Sequence[str],
    column: str,
    config: EngineConfig = DEFAULT_CONFIG,
) -> dict[str, pd.DataFrame]:
    """PSI + KS + JS + W1 grouped verdict frames from ONE collected sketch.

    Exactly reproduces the *_test_grouped outputs (same scores and
    error strings; groups with production data but an empty reference get
    PSI error rows rather than vanishing) while paying for one Spark job
    instead of five (PSI needs two passes standalone). Driver cost is
    O(groups x distinct values) — the collected sketch.
    """
    # a keep_nulls sketch carries (v IS NULL) rows for profile_from_sketch;
    # the drift kernels operate on clean values only (parity with _sides)
    sketch_pdf = sketch_pdf[sketch_pdf["v"].notna()]
    out_psi: list = []
    out_ks: list = []
    out_js: list = []
    out_w1: list = []
    n_bins_psi = config.psi_bins
    n_bins_js = config.hist_bins

    empty_ref_msg = "Reference dataset is empty after removing NaN/inf"
    empty_prod_msg = "Production dataset is empty after removing NaN/inf"

    any_key = False
    for key, sub in _iter_group_subframes(sketch_pdf, group_cols):
        any_key = True
        sub = sub.sort_values("v")
        v = sub["v"].to_numpy(dtype=np.float64)
        cr = sub["c_ref"].to_numpy(dtype=np.int64)
        cp = sub["c_prod"].to_numpy(dtype=np.int64)
        n_ref, n_prod = int(cr.sum()), int(cp.sum())

        # ---- KS (ks_test_grouped parity) --------------------------------
        if n_ref == 0:
            out_ks.append((key, None, "Reference dataset contains only NaN/inf values"))
        elif n_prod == 0:
            out_ks.append((key, None, "Production dataset contains only NaN/inf values"))
        else:
            d = float(
                np.max(np.abs(np.cumsum(cr) / n_ref - np.cumsum(cp) / n_prod))
            )
            out_ks.append(
                (
                    key,
                    ks_verdict(d, n_ref, n_prod, config.ks_threshold, column,
                               method=config.ks_pvalue_method),
                    None,
                )
            )

        # ---- JS (js_test_grouped parity: shared-range equal-width) -------
        if n_ref == 0:
            out_js.append((key, None, empty_ref_msg))
        elif n_prod == 0:
            out_js.append((key, None, empty_prod_msg))
        else:
            lo, hi = float(v[0]), float(v[-1])
            if hi == lo:
                bins = np.zeros(len(v), dtype=np.int64)
            else:
                width = (hi - lo) / n_bins_js
                bins = np.minimum(
                    np.floor((v - lo) / width).astype(np.int64), n_bins_js - 1
                )
                bins[v == hi] = n_bins_js - 1
            rc = np.zeros(n_bins_js, dtype=np.int64)
            pc = np.zeros(n_bins_js, dtype=np.int64)
            np.add.at(rc, bins, cr)
            np.add.at(pc, bins, cp)
            out_js.append(
                (key, js_from_counts(rc, pc, config.js_threshold, feature_name=column), None)
            )

        # ---- W1 (wasserstein_test_grouped parity) ------------------------
        out_w1.append(
            (key, *_w1_kernel(v, cr, cp, config.wasserstein_threshold, column))
        )

        # ---- PSI (psi_test_grouped parity; a group with production data
        # but an EMPTY reference — e.g. an orphan partition absent from the
        # baseline — reports an error row, never silently vanishes) --------
        out_psi.append(
            (key, *_psi_kernel(v, cr, cp, n_bins_psi, config.psi_threshold, column))
        )

    if not any_key and not group_cols:
        out_ks.append(((), None, "Reference dataset contains only NaN/inf values"))
        out_js.append(((), None, empty_ref_msg))
        out_w1.append(((), None, "empty side after removing NaN/inf"))

    return {
        "psi": _verdict_frame(out_psi, group_cols),
        "ks": _verdict_frame(out_ks, group_cols),
        "jensen_shannon": _verdict_frame(out_js, group_cols),
        "wasserstein": _verdict_frame(out_w1, group_cols),
    }


_PROFILE_PROBS = np.array([0.25, 0.50, 0.75, 0.95, 0.99])


def profile_from_sketch(
    sketch_pdf: pd.DataFrame,
    group_cols: Sequence[str],
    feature: str,
    side: str = "prod",
) -> pd.DataFrame:
    """``profile.profile_columns`` parity from a keep_nulls per-value sketch.

    Count/mean/std(pop)/min/max/exact linear-interpolated percentiles/
    distinct/null_fraction/total_rows are all functions of the (v, count)
    sketch, so the validation plan's profile job collapses into the SAME
    scan that feeds PSI+KS+JS. Exact for integral columns (bounded values:
    the weighted E[v²] stays inside 2^53).
    """
    c_col = "c_prod" if side == "prod" else "c_ref"
    rows = []
    for key, sub in _iter_group_subframes(sketch_pdf, group_cols):
        sub = sub[sub[c_col] > 0]
        null_cnt = int(sub[sub["v"].isna()][c_col].sum())
        fin = sub[sub["v"].notna()].sort_values("v")
        v = fin["v"].to_numpy(dtype=np.float64)
        c = fin[c_col].to_numpy(dtype=np.int64)
        n = int(c.sum())
        total = n + null_cnt
        if total == 0:
            continue  # group absent on this side (profile groups by its own df)
        row = dict(zip(group_cols, key))
        if n == 0:
            pct = [None] * len(_PROFILE_PROBS)
            row.update(
                feature=feature, count=0, mean=None, std=None,
                min_value=None, max_value=None,
            )
        else:
            mean = float(np.average(v, weights=c))
            var = float(np.average((v - mean) ** 2, weights=c))
            pct = _weighted_percentiles(v, c, _PROFILE_PROBS).tolist()
            row.update(
                feature=feature,
                count=n,
                mean=mean,
                std=float(np.sqrt(var)),
                min_value=float(v[0]),
                max_value=float(v[-1]),
            )
        row.update(
            percentile_25=pct[0], median=pct[1], percentile_75=pct[2],
            percentile_95=pct[3], percentile_99=pct[4],
            null_fraction=(total - n) / total,
            unique_count=int(len(v)),
            total_rows=total,
        )
        rows.append(row)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------

def _single(frame: pd.DataFrame, test: str, threshold: float, column: str) -> DriftVerdict:
    """Unwrap a 1-row grouped frame, re-raising errors like the reference."""
    if frame.empty:
        raise ValueError("Reference dataset must not be empty")
    row = frame.iloc[0]
    if row["error"] is not None:
        raise ValueError(row["error"])
    return DriftVerdict(
        test=test,
        score=float(row["score"]),
        threshold=float(row["threshold"]),
        is_drifted=bool(row["is_drifted"]),
        p_value=None if pd.isna(row["p_value"]) else float(row["p_value"]),
        reference_size=int(row["reference_size"]),
        production_size=int(row["production_size"]),
        feature_name=column,
        details=row.get("details") or {},
    )


# ---------------------------------------------------------------------------
# Anderson-Darling k-sample (k=2) — SURVEY T7
# ---------------------------------------------------------------------------

def anderson_darling_test_grouped(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    group_cols: Sequence[str] = (),
    threshold: float = 0.05,
) -> pd.DataFrame:
    """Midrank two-sample Anderson-Darling per group (Scholz-Stephens A2akN).

    Same distributed shape as KS: per-(group, distinct value) counts, one
    window pass builds the midrank cumulative terms, one aggregation reduces
    the per-sample inner sums; normalization + significance interpolation run
    on scalars driver-side (functions.numeric.anderson_darling_significance,
    matching scipy.stats.anderson_ksamp's published algorithm — the reference
    wraps that at anderson_darling.py:50-55 and reports
    significance_level/100 as the p-value).
    """
    from aumos_drift_detector_spark.functions.numeric import (
        anderson_darling_significance,
    )

    sides = _sides(ref_df, prod_df, column, group_cols)
    per_value = sides.groupBy(*group_cols, "v").agg(
        F.sum(F.when(F.col("side") == _REF, 1).otherwise(0)).alias("cr"),
        F.sum(F.when(F.col("side") == _PROD, 1).otherwise(0)).alias("cp"),
    )
    lj = F.col("cr") + F.col("cp")
    cum = _cumulative_per_value(per_value, group_cols, ["cr", "cp"]).select(
        *group_cols,
        F.col("cr"),
        F.col("cp"),
        lj.alias("lj"),
        (F.col("cum_cr") + F.col("cum_cp") - lj / 2.0).alias("bj"),
        (F.col("cum_cr") - F.col("cr") / 2.0).alias("m_ref"),
        (F.col("cum_cp") - F.col("cp") / 2.0).alias("m_prod"),
        F.col("total_cr").alias("n_ref"),
        F.col("total_cp").alias("n_prod"),
    )
    n_total = F.col("n_ref") + F.col("n_prod")
    denom = F.col("bj") * (n_total - F.col("bj")) - n_total * F.col("lj") / 4.0
    inner_ref = F.col("lj") * (n_total * F.col("m_ref") - F.col("n_ref") * F.col("bj")) ** 2
    inner_prod = F.col("lj") * (n_total * F.col("m_prod") - F.col("n_prod") * F.col("bj")) ** 2
    sums = cum.groupBy(*group_cols).agg(
        F.sum(F.when(denom > 0, F.try_divide(inner_ref, denom))).alias("s_ref"),
        F.sum(F.when(denom > 0, F.try_divide(inner_prod, denom))).alias("s_prod"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_prod").alias("n_prod"),
    )
    pdf = sums.toPandas()
    verdicts = []
    for _, r in pdf.iterrows():
        key = tuple(r[g] for g in group_cols)
        n, m = int(r["n_ref"] or 0), int(r["n_prod"] or 0)
        if n == 0 or m == 0:
            verdicts.append((key, None, "empty side after removing NaN/inf"))
            continue
        big_n = n + m
        a2akn = (big_n - 1) / big_n * (float(r["s_ref"]) / n + float(r["s_prod"]) / m) / big_n
        tk, sig = anderson_darling_significance(a2akn, [n, m])
        verdicts.append(
            (
                key,
                DriftVerdict(
                    test="anderson_darling",
                    score=sig,
                    threshold=threshold,
                    is_drifted=bool(sig < threshold),
                    p_value=sig,
                    reference_size=n,
                    production_size=m,
                    feature_name=column,
                    details={"statistic": a2akn, "normalized": tk},
                ),
                None,
            )
        )
    if not verdicts and not group_cols:
        verdicts.append(((), None, "empty side after removing NaN/inf"))
    return _verdict_frame(verdicts, group_cols)


def anderson_darling_test(
    ref_df: DataFrame,
    prod_df: DataFrame,
    column: str,
    threshold: float = 0.05,
) -> DriftVerdict:
    frame = anderson_darling_test_grouped(ref_df, prod_df, column, (), threshold)
    return _single(frame, "anderson_darling", threshold, column)
