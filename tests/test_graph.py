"""Tests for distributed connected components / duplicate clustering."""

import random

import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)]
        got = _spark_cc(spark, edges)
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

    def test_long_chain_converges_in_log_rounds(self, spark):
        # a 200-node path is the adversarial case for label propagation
        # (diameter 199); the alternating algorithm must still converge
        edges = [(i, i + 1) for i in range(200)]
        got = _spark_cc(spark, edges)
        assert set(got.values()) == {0}
        assert len(got) == 201

    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(42)
        nodes = list(range(1000))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(1500)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find(edges)
        got = _spark_cc(spark, edges)
        assert got == want

    def test_duplicate_and_reversed_edges(self, spark):
        edges = [(2, 1), (1, 2), (2, 1), (3, 2)]
        got = _spark_cc(spark, edges)
        assert got == {1: 1, 2: 1, 3: 1}

    def test_string_ids(self, spark):
        df = spark.createDataFrame(
            [("d2", "d1"), ("d2", "d3"), ("x9", "x8")], ["src", "dst"]
        )
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x8": "x8", "x9": "x8"}


class TestDedupClusters:
    def test_survivor_is_min(self, spark):
        pairs = spark.createDataFrame(
            [(5, 3), (3, 1), (9, 8)], ["id_a", "id_b"]
        )
        rows = {
            r["doc_id"]: (r["cluster_id"], r["is_survivor"])
            for r in dedup_clusters(pairs).collect()
        }
        assert rows == {
            1: (1, True),
            3: (1, False),
            5: (1, False),
            8: (8, True),
            9: (8, False),
        }


def test_self_loop_only_nodes_root_themselves(spark):
    """A node appearing ONLY in self-loop edges must come out rooted at
    itself, not vanish (regression: _canon drops src==dst rows, and the
    node universe used to be derived from the post-canon edges)."""
    from aumos_drift_detector_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (7, 7), (2, 3)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7}
