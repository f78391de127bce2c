"""Shared Spark fixtures for the test suite.

Small local session: test data is tiny, so few shuffle partitions keep the
suite fast; production-scale settings live in bench.py / the validation plan.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master(os.environ.get("SPARK_TEST_MASTER", "local[4]"))
        .appName("aumos-drift-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms6g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )
    yield session
    session.stop()


def make_value_df(spark, values, col="value"):
    """1-column double DataFrame from a numpy array / list (NaN-preserving)."""
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({col: np.asarray(values, dtype=float)}))


@pytest.fixture(scope="session")
def value_df_factory(spark):
    def factory(values, col="value"):
        return make_value_df(spark, values, col)

    return factory
