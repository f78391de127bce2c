"""Approximate-nearest-neighbor search over embedding columns.

- ``cosine_topk``: brute-force exact top-k against one query vector — the
  correctness baseline. Dot products run as JVM higher-order functions
  (``zip_with`` + ``aggregate``), no Python in the row path.
- ``cosine_topk_batch``: many query vectors at once via a vectorized pandas
  UDF (one numpy matmul per Arrow batch) — the throughput path for scoring.
- ``ivf_topk``: IVF-style two-stage search — KMeans coarse quantizer
  (pyspark.ml), probe the ``n_probe`` nearest centroids, exact rerank inside
  probed cells. The scale path: scan cost drops to n_probe/n_cells of the
  table, routing via a broadcast of the (tiny) centroid matrix.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lit_vec(vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k for one query vector."""
    q = _lit_vec(query)
    qn = float(np.sqrt(np.dot(query, query)))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    df: DataFrame,
    vec_col: str,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k for a batch of query vectors via Arrow-vectorized numpy matmul.

    Each executor receives Arrow batches, computes a (batch x n_queries)
    similarity matrix in one BLAS call, and emits per-batch top-k candidates;
    a final per-query window takes the global top-k. Two stages, one shuffle
    of only candidate rows (k per query per batch).
    """
    from pyspark.sql import Window

    qm = np.asarray(queries, dtype=np.float64)
    qnorm = np.linalg.norm(qm, axis=1, keepdims=True)
    qm_n = qm / np.where(qnorm == 0, 1.0, qnorm)
    n_q = qm_n.shape[0]
    bc = df.sparkSession.sparkContext.broadcast(qm_n)

    out_schema = T.StructType(
        [
            T.StructField("query_idx", T.IntegerType()),
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        qmat = bc.value
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.where(norms == 0, 1.0, norms)
            sims = vecs @ qmat.T  # (batch, n_q)
            ids = pdf[id_col].to_numpy()
            rows = []
            kk = min(k, len(ids))
            for qi in range(qmat.shape[0]):
                top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
                for t in top:
                    rows.append((qi, ids[t], float(sims[t, qi])))
            yield pd.DataFrame(rows, columns=["query_idx", id_col, "cosine"])

    candidates = df.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_idx").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


class IvfIndex:
    """Persistable IVF index: KMeans cells + probe-and-rerank search.

    ``build_ivf_index`` fits the coarse quantizer ONCE; ``save``/``load``
    persist the cell assignment as parquet PARTITIONED BY CELL, so a loaded
    index's probes are answered with partition pruning — a search scans only
    the n_probe cells' files, never the full table (the 100-TB path:
    write-time clustering, read-time pruning). Searching without saving
    still reuses the one fitted assignment across queries (fixes the
    refit-per-call weakness of the round-1 function).
    """

    def __init__(
        self,
        assigned: DataFrame,
        centers: np.ndarray,
        vec_col: str,
        id_col: str,
    ) -> None:
        self.assigned = assigned
        self.centers = np.asarray(centers, dtype=np.float64)
        self.vec_col = vec_col
        self.id_col = id_col

    def probe_cells(self, query: Sequence[float], n_probe: int) -> list[int]:
        q = np.asarray(query, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        cn = self.centers / np.maximum(
            np.linalg.norm(self.centers, axis=1, keepdims=True), 1e-12
        )
        return [int(c) for c in np.argsort(-(cn @ qn))[:n_probe]]

    def search(
        self, query: Sequence[float], k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        """Exact top-k within the probed cells (standard IVF recall trade)."""
        probed = self.assigned.where(
            F.col("_cell").isin(self.probe_cells(query, n_probe))
        )
        return cosine_topk(probed, self.vec_col, query, k, self.id_col)

    def save(self, path: str) -> None:
        path = path.rstrip("/")
        (
            self.assigned.select(self.id_col, self.vec_col, "_cell")
            .write.mode("overwrite")
            .partitionBy("_cell")
            .parquet(f"{path}/cells")
        )
        spark = self.assigned.sparkSession
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(self.centers)],
            "cell int, center array<double>",
        ).write.mode("overwrite").parquet(f"{path}/centroids")

    @classmethod
    def load(
        cls, spark, path: str, vec_col: str = "embedding", id_col: str = "vec_id"
    ) -> "IvfIndex":
        path = path.rstrip("/")
        assigned = spark.read.parquet(f"{path}/cells")
        rows = sorted(
            spark.read.parquet(f"{path}/centroids").collect(),
            key=lambda r: r["cell"],
        )
        centers = np.array([r["center"] for r in rows], dtype=np.float64)
        return cls(assigned, centers, vec_col, id_col)


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
) -> IvfIndex:
    """Fit the coarse quantizer and assign cells (one KMeans + one transform)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn(
        "_mlvec", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_mlvec", predictionCol="_cell")
    model = km.fit(with_vec)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(with_vec).drop("_mlvec")
    return IvfIndex(assigned, centers, vec_col, id_col)


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF search (builds a throwaway index; prefer
    ``build_ivf_index`` + ``IvfIndex.search``/``save`` for repeated queries)."""
    return build_ivf_index(df, vec_col, id_col, n_cells, seed).search(
        query, k, n_probe
    )
