"""Distributed connected components for duplicate-cluster resolution.

Near-dup detection (minhash / simhash / embedding LSH) emits PAIRS; corpus
dedup needs CLUSTERS — the transitive closure of those pairs — so each
cluster keeps exactly one survivor. This module computes components with
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14): each round is
two groupBy-aggregate passes over the edge list, and the edge list
contracts toward a star per component in O(log n) rounds even on
pathological chain graphs (plain min-label propagation needs O(diameter)).
Everything is DataFrame explode/groupBy arithmetic — no driver-side graph,
no per-row Python — so a 10^11-edge candidate graph shards across the
cluster like any other aggregation.

The fixpoint loop runs on the driver (as every iterative Spark algorithm
does), with ``localCheckpoint`` each round to cut lineage and a checksum
convergence test (count + hashed edge-set signature) instead of a full
subtract join.

No reference analogue; this completes the LLM-pipeline dedup family of
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge list as (src>dst) pairs, self-loops dropped."""
    e = edges.select(
        F.greatest(F.col("src"), F.col("dst")).alias("src"),
        F.least(F.col("src"), F.col("dst")).alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    grouped = both.groupBy("src").agg(
        F.collect_set("dst").alias("nbrs"),
    )
    m = F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("src"))))
    return (
        grouped.select(
            F.col("src").alias("u"),
            m.alias("m"),
            F.explode(F.col("nbrs")).alias("v"),
        )
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to the larger endpoint; link its ≤-neighbors (and
    itself) to the minimum of the star."""
    oriented = edges.select(
        F.greatest(F.col("src"), F.col("dst")).alias("src"),
        F.least(F.col("src"), F.col("dst")).alias("dst"),
    )
    grouped = oriented.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    m = F.array_min(F.col("nbrs"))  # all nbrs < src, so min(N ∪ {u}) = min(N)
    return (
        grouped.select(
            F.col("src").alias("u"),
            m.alias("m"),
            F.explode(
                F.array_union(F.col("nbrs"), F.array(F.col("src")))
            ).alias("v"),
        )
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Cheap order-insensitive fixpoint check: (edge count, xor of pair hashes)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            # xor-fold: order-insensitive, collision-irrelevant (a false
            # "converged" would need an xor collision in the SAME iteration
            # that also preserved the count — and the loop re-verifies by
            # running until TWO stable rounds)
            F.expr("aggregate(collect_list(hash(src, dst)), 0, (a, x) -> a ^ x)"),
            F.lit(0),
        ).alias("sig"),
    ).collect()[0]
    return int(row["n"]), int(row["sig"])


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """``(node, component)`` for every node in ``edges``; the component id
    is the COMPONENT MINIMUM node id (a canonical, engine-replayable label).

    Alternates large-star and small-star rounds until the edge list is
    stable for two consecutive rounds (each round provably monotone, per
    the SoCC'14 proof the fixpoint is the star graph rooted at each
    component's minimum). Raises after ``max_iter`` rounds — at that point
    the input is pathological (the bound is ~log n; 50 covers any
    realistic graph).
    """
    raw = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # node universe from the RAW edges: _canon drops self-loops, and a
    # node appearing ONLY in self-loop rows must still come out rooted at
    # itself (the final left-join+coalesce below), not vanish
    nodes = (
        raw.select(F.col("src").alias("node"))
        .unionByName(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = _canon(raw)
    e = e.localCheckpoint(eager=True)
    prev = _signature(e)
    stable = 0
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _signature(e)
        if cur == prev:
            stable += 1
            if stable >= 2:
                break
        else:
            stable = 0
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint is a star: every edge points v -> root(min); isolated nodes
    # (self-paired inputs) root themselves
    roots = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return (
        nodes.join(roots, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Duplicate clusters from a near-dup PAIR frame: one row per member
    ``(doc_id, cluster_id, is_survivor)`` where ``cluster_id`` is the
    cluster's minimum doc id and the survivor is that minimum — the same
    keep-the-min convention as :func:`operators.dedup.dedup_exact`."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )
