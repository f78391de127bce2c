"""Multivariate drift: PCA reconstruction error (T9) and C2ST (T10).

Spark-first restatements of the reference's sklearn-based detectors
(reference adapters/multivariate_drift.py:22-149) using pyspark.ml — the
model FIT runs distributed, the verdict math on driver-side scalars:

- PCA reconstruction: StandardScaler + PCA(k) fit on the reference side;
  per-row reconstruction MSE computed as a column expression from the
  orthonormal-basis identity ||x - W W^T x||^2 = ||x||^2 - ||W^T x||^2
  (no inverse_transform materialization); drift iff
  (prod_err - ref_err) / (ref_err + 1e-10) > threshold (default 0.15).
- C2ST: GBTClassifier distinguishes reference (0) from production (1);
  AUROC via our rank-based perfmon.auc_binary on a held-out split
  (seeded 80/20 instead of the reference's 5-fold CV — the verdict
  threshold 0.6 is robust to the estimator choice); drift iff AUROC > 0.6.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aumos_drift_detector_spark.functions.kernels import DriftVerdict

_REF, _PROD = 0, 1


def _assembled(ref_df: DataFrame, prod_df: DataFrame, feature_cols: Sequence[str]):
    from pyspark.ml.feature import VectorAssembler

    sides = ref_df.select(*feature_cols, F.lit(_REF).alias("side")).unionByName(
        prod_df.select(*feature_cols, F.lit(_PROD).alias("side"))
    )
    sides = sides.na.drop(subset=list(feature_cols))
    va = VectorAssembler(inputCols=list(feature_cols), outputCol="_features")
    return va.transform(sides)


def pca_reconstruction_drift(
    ref_df: DataFrame,
    prod_df: DataFrame,
    feature_cols: Sequence[str],
    threshold: float = 0.15,
    n_components: int = 10,
) -> DriftVerdict:
    from pyspark.ml.feature import PCA, StandardScaler

    data = _assembled(ref_df, prod_df, feature_cols).cache()
    try:
        ref = data.where(F.col("side") == _REF)
        scaler = StandardScaler(
            withMean=True, withStd=True, inputCol="_features", outputCol="_scaled"
        ).fit(ref)
        scaled = scaler.transform(data)
        n_comp = min(n_components, len(feature_cols))
        n_ref = ref.count()
        n_comp = min(n_comp, max(1, n_ref - 1))
        pca = PCA(k=n_comp, inputCol="_scaled", outputCol="_proj").fit(
            scaled.where(F.col("side") == _REF)
        )
        projected = pca.transform(scaled)

        # ||x - WW^T x||^2 = ||x||^2 - ||W^T x||^2 for orthonormal W; mean over
        # rows and feature dims to match sklearn's np.mean((X - X_rec)**2)
        from pyspark.ml.functions import vector_to_array

        sq = lambda col: F.aggregate(
            vector_to_array(F.col(col)), F.lit(0.0), lambda a, x: a + x * x
        )
        errs = (
            projected.select(
                "side", ((sq("_scaled") - sq("_proj")) / len(feature_cols)).alias("err")
            )
            .groupBy("side")
            .agg(F.avg("err").alias("mean_err"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_side = {r["side"]: r for r in errs}
        ref_err = float(by_side[_REF]["mean_err"])
        prod_err = float(by_side[_PROD]["mean_err"])
        score = (prod_err - ref_err) / (ref_err + 1e-10)
        return DriftVerdict(
            test="pca_reconstruction",
            score=score,
            threshold=threshold,
            is_drifted=bool(score > threshold),
            reference_size=int(by_side[_REF]["n"]),
            production_size=int(by_side[_PROD]["n"]),
            feature_name=",".join(feature_cols),
            details={
                "reference_reconstruction_error": ref_err,
                "reconstruction_error": prod_err,
                "n_components": n_comp,
                "explained_variance": float(sum(pca.explainedVariance)),
            },
        )
    finally:
        data.unpersist()


def classifier_two_sample_test(
    ref_df: DataFrame,
    prod_df: DataFrame,
    feature_cols: Sequence[str],
    threshold: float = 0.6,
    seed: int = 42,
    max_iter: int = 20,
) -> DriftVerdict:
    from pyspark.ml.classification import GBTClassifier

    from aumos_drift_detector_spark.operators.perfmon import auc_binary

    data = _assembled(ref_df, prod_df, feature_cols).withColumn(
        "label", F.col("side").cast("double")
    )
    train, test = data.randomSplit([0.8, 0.2], seed=seed)
    train = train.cache()
    try:
        gbt = GBTClassifier(
            featuresCol="_features", labelCol="label", maxIter=max_iter,
            maxDepth=3, seed=seed,
        ).fit(train)
        scored = gbt.transform(test)
        from pyspark.ml.functions import vector_to_array

        scores = scored.select(
            F.lit("all").alias("seg"),
            F.col("label").cast("int").alias("y_true"),
            vector_to_array("probability")[1].alias("score"),
        )
        row = auc_binary(scores, ["seg"]).collect()[0]
        auroc = float(row["auc"])
        return DriftVerdict(
            test="classifier_two_sample",
            score=auroc,
            threshold=threshold,
            is_drifted=bool(auroc > threshold),
            reference_size=int(row["n_neg"]),
            production_size=int(row["n_pos"]),
            feature_name=",".join(feature_cols),
            details={
                "feature_importances": [float(x) for x in gbt.featureImportances.toArray()],
            },
        )
    finally:
        train.unpersist()
