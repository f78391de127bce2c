"""Tests for the hashed linear quality classifier."""

import math

import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.quality_model import (
    score_quality_model,
    train_quality_classifier,
)

GOOD_WORDS = ["research", "analysis", "method", "result", "figure", "study"]
BAD_WORDS = ["click", "buy", "winner", "free", "prize", "subscribe"]


@pytest.fixture(scope="module")
def seed_df(spark):
    rows = []
    for i in range(150):
        good = " ".join(GOOD_WORDS[j % len(GOOD_WORDS)] for j in range(i, i + 8))
        bad = " ".join(BAD_WORDS[j % len(BAD_WORDS)] for j in range(i, i + 8))
        rows.append((f"g{i}", f"{good} common filler words", 1))
        rows.append((f"b{i}", f"{bad} common filler words", 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"]).cache()


@pytest.fixture(scope="module")
def model(seed_df):
    return train_quality_classifier(seed_df, "text", "label", n_features=1 << 12)


class TestTrain:
    def test_separates_classes(self, spark, seed_df, model):
        weights, bias = model
        held = spark.createDataFrame(
            [
                ("h1", "research method and analysis of the result", 1),
                ("h2", "click buy free prize winner now subscribe", 0),
            ],
            ["doc_id", "text", "label"],
        )
        scored = {
            r["doc_id"]: r["quality_score"]
            for r in score_quality_model(
                held, "text", weights, bias, n_features=1 << 12
            ).collect()
        }
        assert scored["h1"] > 0.9
        assert scored["h2"] < 0.1

    def test_deterministic_fit(self, seed_df, model):
        w2, b2 = train_quality_classifier(
            seed_df, "text", "label", n_features=1 << 12
        )
        assert model[0] == w2 and model[1] == b2

    def test_validation(self, spark, seed_df):
        with pytest.raises(ValueError):
            train_quality_classifier(
                seed_df.where(F.lit(False)), "text", "label"
            )
        with pytest.raises(ValueError, match="max_rows"):
            train_quality_classifier(
                seed_df, "text", "label", max_rows=10
            )


class TestScore:
    def test_map_and_join_paths_agree(self, spark, seed_df, model):
        weights, bias = model
        wdf = seed_df.sparkSession.createDataFrame(
            [(k, v) for k, v in weights.items()], ["feature", "weight"]
        )
        a = {
            r["doc_id"]: round(r["quality_score"], 12)
            for r in score_quality_model(
                seed_df, "text", weights, bias, n_features=1 << 12
            ).collect()
        }
        b = {
            r["doc_id"]: round(r["quality_score"], 12)
            for r in score_quality_model(
                seed_df, "text", wdf, bias, n_features=1 << 12, id_col="doc_id"
            ).collect()
        }
        assert a == b
        with pytest.raises(ValueError, match="id_col"):
            score_quality_model(seed_df, "text", wdf, bias)

    def test_empty_model_scores_bias(self, spark, seed_df):
        got = score_quality_model(seed_df.limit(3), "text", {}, bias=1.0).collect()
        want = 1.0 / (1.0 + math.exp(-1.0))
        assert all(abs(r["quality_score"] - want) < 1e-12 for r in got)

    def test_map_path_zero_shuffle(self, spark, seed_df, model):
        weights, bias = model
        small = dict(list(weights.items())[:50])
        plan = (
            score_quality_model(seed_df, "text", small, bias, n_features=1 << 12)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_columns_preserved(self, spark, seed_df, model):
        weights, bias = model
        wdf = seed_df.sparkSession.createDataFrame(
            [(k, v) for k, v in weights.items()], ["feature", "weight"]
        )
        got = score_quality_model(
            seed_df, "text", wdf, bias, n_features=1 << 12, id_col="doc_id"
        )
        assert set(got.columns) == {"doc_id", "text", "label", "quality_score"}
        assert got.count() == seed_df.count()
