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

    Exactly one window sort per group + one aggregation — the distributed
    restatement of the reference's sort-sweep (performance_monitor.py:576-604).
    """
    lbl = F.col(label_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(F.col(score_col).cast("double"))
    # average rank for ties: rank spans [rank, rank + count(tie)-1]
    tie_w = Window.partitionBy(*group_cols, F.col(score_col).cast("double"))
    ranked = df.select(
        *group_cols,
        lbl.alias("_y"),
        (F.rank().over(w) + (F.count(F.lit(1)).over(tie_w) - 1) / 2.0).alias("_r"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_y") == 1.0, F.col("_r"))).alias("rank_pos_sum"),
        F.sum((F.col("_y") == 1.0).cast("long")).alias("n_pos"),
        F.sum((F.col("_y") == 0.0).cast("long")).alias("n_neg"),
    )
    auc = F.try_divide(
        F.col("rank_pos_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0,
        F.col("n_pos") * F.col("n_neg"),
    )
    return agg.select(*group_cols, "n_pos", "n_neg", auc.alias("auc"))
