"""Hashed-bag-of-words linear quality classifier (fastText/CCNet-style).

The standard corpus-filtering recipe: score every document with a linear
model over hashed word features, keep the high-scoring tail. The scale
asymmetry drives the design — LABELS are scarce (a seed set of curated
good/bad examples, thousands to low-millions of rows) while SCORING runs
over the full 100-TB corpus:

- :func:`score_quality_model` is the distributed side: per-word md5-derived
  feature ids, a weight lookup, and a sigmoid — ALL pure column
  expressions (a map literal for lexicon-sized models, a broadcast join
  for hashed-width models). Zero Python in the hot path, SQL-replayable
  hashing (the ``md5_60`` contract of operators.dedup), and for the map
  variant zero shuffle: the score rides the scan.
- :func:`train_quality_classifier` is the seed-set side: hashed count
  features are built JVM-side, the capped seed set is collected, and a
  seeded full-batch logistic regression fits in numpy on the driver.
  Deterministic in (data, seed, iters) — no engine-private parallelism in
  the fit. A seed set above ``max_rows`` raises rather than silently
  subsampling.

No reference analogue (the reference validates models, not corpora); this
extends the LLM-pipeline family of operators/text.py.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_feature(word: Column, n_features: int) -> Column:
    """Portable hashed feature id: ``md5_60(word) % n_features``.

    Delegates to the ONE md5_60 definition
    (``operators.dedup._base_hash``) — bit-identical in any engine with
    md5, so trained weights keyed by these ids are engine-portable
    artifacts that stay in sync with the rest of the md5_60 family.
    """
    from aumos_drift_detector_spark.operators.dedup import _base_hash

    return _base_hash(word, "md5_60") % F.lit(n_features)


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def score_quality_model(
    df: DataFrame,
    text_col: str,
    weights: Mapping[int, float] | DataFrame,
    bias: float = 0.0,
    n_features: int = 1 << 16,
    out_col: str = "quality_score",
    id_col: str | None = None,
) -> DataFrame:
    """Per-document quality score ``sigmoid(bias + Σ_words w[feature(word)])``.

    ``weights`` is either a feature->weight mapping (small models: becomes
    a map LITERAL, the score is a zero-shuffle per-row expression fused
    into the scan) or a ``(feature long, weight double)`` DataFrame (wide
    hashed models: explode -> broadcast weight join -> one re-aggregation
    keyed by ``id_col``, which is REQUIRED and must be unique per row for
    that path; only lexicon HITS reach the shuffle). A synthetic
    monotonically_increasing_id would NOT do here: the frame is evaluated
    once for the hit aggregation and once for the join-back, and a
    nondeterministic upstream (shuffle fetch order) could assign the two
    evaluations different ids, attaching scores to the wrong rows. Words
    absent from the model contribute 0 either way, so both paths agree
    exactly.
    """
    words = _words(F.col(text_col))
    if isinstance(weights, DataFrame):
        if id_col is None:
            raise ValueError(
                "score_quality_model with a weights DataFrame needs id_col "
                "(a unique per-row key to re-attach aggregated scores)"
            )
        wdf = F.broadcast(
            weights.select(
                F.col("feature").cast("long"), F.col("weight").cast("double")
            )
        )
        hits = (
            df.select(F.col(id_col), F.explode(words).alias("_w"))
            .select(
                id_col, hashed_feature(F.col("_w"), n_features).alias("feature")
            )
            .join(wdf, "feature")
            .groupBy(id_col)
            .agg(F.sum("weight").alias("_s"))
        )
        return (
            df.join(hits, id_col, "left")
            .withColumn(
                out_col,
                F.when(
                    F.col(text_col).isNull(), F.lit(None).cast("double")
                ).otherwise(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                F.lit(float(bias))
                                + F.coalesce(F.col("_s"), F.lit(0.0))
                            )
                        )
                    )
                ),
            )
            .drop("_s")
        )
    if not weights:
        wsum: Column = F.lit(0.0)
    else:
        pairs: list[Column] = []
        for fid, w in sorted(weights.items()):
            pairs += [F.lit(int(fid)), F.lit(float(w))]
        wmap = F.create_map(*pairs)
        wsum = F.aggregate(
            F.transform(
                words,
                lambda w: F.coalesce(
                    F.element_at(wmap, hashed_feature(w, n_features)),
                    F.lit(0.0),
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return df.withColumn(
        out_col,
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + wsum))),
    )


def train_quality_classifier(
    labeled_df: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 1 << 16,
    max_rows: int = 200_000,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 7,
) -> tuple[dict[int, float], float]:
    """Fit the linear quality model on a labeled seed set; returns
    ``(weights, bias)`` ready for :func:`score_quality_model`.

    Feature counts are built DISTRIBUTED (explode -> per-(doc,feature)
    count — the only part that touches raw text); the collected frame is
    one row per (doc, feature) with count, bounded by the seed set's token
    diversity, and the dense label vector is ``max_rows``-capped (raises
    if exceeded — silent subsampling would bias the classifier). The fit
    itself is full-batch gradient descent on the logistic loss with L2,
    seeded initialization — rerunning reproduces the same weights to the
    last bit, unlike a parallel LBFGS whose reduction order floats.
    """
    n = labeled_df.count()
    if n == 0:
        raise ValueError("labeled seed set is empty")
    if n > max_rows:
        raise ValueError(
            f"seed set has {n} rows > max_rows={max_rows}; quality-classifier "
            "training is a driver-side fit on a curated seed set — sample "
            "explicitly upstream if you really want a subset"
        )
    keyed = labeled_df.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.col(label_col).cast("double").alias("_y"),
        _words(F.col(text_col)).alias("_ws"),
    )
    # _rid is consumed by TWO separate actions (labels, triples); pin one
    # materialized evaluation so a nondeterministic upstream (shuffle fetch
    # order, unseeded sample) cannot hand the two jobs different ids and
    # misalign labels with features
    keyed = keyed.localCheckpoint(eager=True)
    labels_pdf = keyed.select("_rid", "_y").toPandas()
    trips = (
        keyed.select("_rid", F.explode("_ws").alias("_w"))
        .select("_rid", hashed_feature(F.col("_w"), n_features).alias("_f"))
        .groupBy("_rid", "_f")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .toPandas()
    )
    rid_index = {r: i for i, r in enumerate(labels_pdf["_rid"].to_numpy())}
    rows = np.array([rid_index[r] for r in trips["_rid"].to_numpy()], dtype=np.int64)
    cols = trips["_f"].to_numpy(dtype=np.int64)
    cnts = trips["_c"].to_numpy(dtype=np.float64)
    y = labels_pdf["_y"].to_numpy(dtype=np.float64)

    rng = np.random.default_rng(seed)
    used = np.unique(cols)
    col_index = {f: i for i, f in enumerate(used)}
    cidx = np.array([col_index[f] for f in cols], dtype=np.int64)
    w = rng.normal(0.0, 0.01, size=used.size)
    b = 0.0
    for _ in range(iters):
        margin = np.zeros(y.size)
        np.add.at(margin, rows, cnts * w[cidx])
        p = 1.0 / (1.0 + np.exp(-(margin + b)))
        err = p - y
        grad_w = np.zeros(used.size)
        np.add.at(grad_w, cidx, cnts * err[rows])
        grad_w = grad_w / y.size + l2 * w
        grad_b = float(err.mean())
        w -= lr * grad_w
        b -= lr * grad_b
    return {int(f): float(w[i]) for f, i in col_index.items()}, float(b)
