"""Model-performance metrics over prediction logs (SURVEY A10/A11, W5).

Reference computes these in a rolling in-memory deque
(performance_monitor.py:531-635); here they are grouped aggregations over a
predictions table ``(segment..., y_true, y_pred, score)``:

- accuracy / RMSE / MAE: single conditional aggregates
- macro-F1: per-(group, class) TP/FP/FN counts -> tiny per-group finalize
- AUC: rank-based Mann-Whitney — rank() window over score, then
  AUC = (sum(rank | positive) - n_pos(n_pos+1)/2) / (n_pos * n_neg),
  which equals the sort-sweep trapezoid the reference runs (ties handled by
  average rank, matching the standard estimator).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classification_metrics(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    y_true: str = "y_true",
    y_pred: str = "y_pred",
) -> DataFrame:
    """accuracy + macro-F1 per group.

    One pass builds per-(group, class) TP/FP/FN; macro-F1 averages per-class
    F1 over the union of true/predicted classes (reference semantics).
    """
    t, p = F.col(y_true), F.col(y_pred)
    # NULL labels/predictions would otherwise become a phantom class whose
    # F1 coalesces to 0.0, silently deflating macro-F1 (round-3 review)
    df = df.where(t.isNotNull() & p.isNotNull())
    per_class = (
        df.select(
            *group_cols,
            F.explode(F.array_distinct(F.array(t.cast("string"), p.cast("string")))).alias("cls"),
            t.cast("string").alias("_t"),
            p.cast("string").alias("_p"),
        )
        .groupBy(*group_cols, "cls")
        .agg(
            F.sum(((F.col("_t") == F.col("cls")) & (F.col("_p") == F.col("cls"))).cast("long")).alias("tp"),
            F.sum(((F.col("_t") != F.col("cls")) & (F.col("_p") == F.col("cls"))).cast("long")).alias("fp"),
            F.sum(((F.col("_t") == F.col("cls")) & (F.col("_p") != F.col("cls"))).cast("long")).alias("fn"),
        )
    )
    f1 = F.try_divide(
        2 * F.col("tp"), (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    macro = per_class.groupBy(*group_cols).agg(
        F.avg(F.coalesce(f1, F.lit(0.0))).alias("macro_f1")
    )
    acc = df.groupBy(*group_cols).agg(
        F.avg((t == p).cast("double")).alias("accuracy"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return (
        acc.join(macro, list(group_cols), "inner") if group_cols
        else acc.crossJoin(macro)
    )


def regression_metrics(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    y_true: str = "y_true",
    y_pred: str = "y_pred",
) -> DataFrame:
    """RMSE + MAE per group — one aggregation."""
    err = F.col(y_pred).cast("double") - F.col(y_true).cast("double")
    return df.groupBy(*group_cols).agg(
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(F.abs(err)).alias("mae"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def auc_binary(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    label_col: str = "y_true",
    score_col: str = "score",
) -> DataFrame:
    """Rank-based ROC-AUC per group (Mann-Whitney U / tie-averaged ranks).

    Fully parallel at any group cardinality: rows pre-aggregate to a
    per-(group, score) sketch, the tie-averaged midranks come from the
    range-partitioned parallel prefix sums (``drift._cumulative_per_value``
    — the same no-single-reducer machinery as KS/W1; the former
    ``Window.partitionBy().orderBy(score)`` plan moved the ENTIRE
    prediction log through one task when ungrouped), and one tiny
    aggregation over distinct-score rows finishes the U statistic.
    midrank(s) = cum_before(s) + (n_tie(s) + 1)/2 — exactly the
    rank + (ties-1)/2 average of the sort-sweep
    (performance_monitor.py:576-604).
    """
    from aumos_drift_detector_spark.operators.drift import _cumulative_per_value

    lbl = F.col(label_col).cast("double")
    sc = F.col(score_col).cast("double")
    clean = df.where(lbl.isNotNull() & sc.isNotNull())
    # n_pos_s and n_neg_s ride as SUM columns: _cumulative_per_value's input
    # must be exactly (group, v, sum_cols) — see its invariant note
    per_score = clean.groupBy(*group_cols, sc.alias("v")).agg(
        F.sum((lbl == 1.0).cast("long")).alias("n_pos_s"),
        F.sum((lbl == 0.0).cast("long")).alias("n_neg_s"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    cum = _cumulative_per_value(
        per_score, group_cols, ["n_pos_s", "n_neg_s", "n_tot"]
    )
    midrank = (F.col("cum_n_tot") - F.col("n_tot")) + (F.col("n_tot") + 1) / 2.0
    agg = cum.groupBy(*group_cols).agg(
        F.sum(F.col("n_pos_s") * midrank).alias("rank_pos_sum"),
        F.sum("n_pos_s").alias("n_pos"),
        F.sum("n_neg_s").alias("n_neg"),
    )
    auc = F.try_divide(
        F.col("rank_pos_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0,
        F.col("n_pos") * F.col("n_neg"),
    )
    return agg.select(*group_cols, "n_pos", "n_neg", auc.alias("auc"))
