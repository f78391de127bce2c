"""End-to-end corpus-preparation pipeline: the flagship composition.

Chains the LLM-training-data operators into the standard preparation
sequence a 100-TB corpus actually goes through before tokenization:

    exact dedup -> benchmark decontamination -> quality gate
        -> importance resampling -> train/val/test split -> audit

Every stage is one of this package's individually-oracle-verified
operators, and the COMPOSITION itself is replayed end-to-end by a single
DuckDB oracle in the driver contract (`corpus_pipeline_documents`), so
the stages are proven to compose — same rounding, same hash draws, same
boundary conventions — not just to work in isolation.

Scale shape (the part that must survive 1000 executors):
- dedup: one shuffle on the content fingerprint;
- decontamination: bench side is broadcast (eval sets are small by
  construction), ONE streaming scan of train, then a broadcast ANTI join
  of the contaminated-id set (bounded by the bench pair count) back onto
  train — train never shuffles on its own id;
- quality gate + resampling + split: pure column expressions, zero
  shuffle, fused into the surrounding stages by Catalyst;
- audit: a 3-row aggregate.
So the whole pipeline costs dedup's shuffle plus one scan — everything
else rides along in the same stages.

No reference analogue (the reference validates models, not corpora);
this composes the operator family of operators/dedup.py, text.py,
sampling.py.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.dedup import (
    dedup_exact,
    decontamination_pairs,
)
from aumos_drift_detector_spark.operators.sampling import (
    deterministic_split,
    mixture_rebalance,
    weighted_sample,
)
from aumos_drift_detector_spark.operators.text import dup_word_fraction


def corpus_prep_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dup_word_max: float = 0.6,
    shingle_size: int = 3,
    contain_threshold: float = 0.5,
    keep_prob: Column | None = None,
    fractions: Mapping[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Prepared training corpus with a ``split`` label per surviving row.

    ``bench`` rows are held-out evaluation items: they are excluded from
    the output outright AND any training document containing one (n-gram
    containment >= ``contain_threshold``) is dropped. ``keep_prob`` is a
    per-row keep-probability column for importance resampling (default:
    keep everything). All stages are deterministic in (``id_col``,
    ``salt``) — reruns and subsets reproduce the same corpus.
    """
    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})

    # a single-file (or few-file) input serializes the shingle explode on
    # one core; widen it to the cluster's parallelism. At real corpus scale
    # the scan already has far more partitions than cores and this branch
    # never fires — no shuffle is added to the 100-TB path.
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)

    bench_ids = F.broadcast(bench.select(F.col(id_col)))
    # Decontamination runs on the RAW (pre-dedup) train side: containment
    # is a pure function of text, so every copy of a contaminated document
    # is flagged together and the later anti join removes exactly the same
    # survivors — while the contaminated-id branch no longer recomputes the
    # dedup window shuffle (Catalyst cannot reuse it across the two
    # branches: their pruned scan schemas differ, so the exchanges don't
    # canonicalize equal). One full-corpus shuffle total, not two.
    raw_train = docs.join(bench_ids, id_col, "left_anti")
    contaminated = (
        decontamination_pairs(
            raw_train, bench, id_col, text_col, shingle_size, contain_threshold
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    deduped = dedup_exact(docs, id_col, [text_col])
    # exclude the bench rows themselves (eval items are not training data)
    train = deduped.join(bench_ids, id_col, "left_anti")
    clean = train.join(F.broadcast(contaminated), id_col, "left_anti")
    quality = clean.where(
        dup_word_fraction(F.col(text_col)) <= F.lit(dup_word_max)
    )
    sampled = (
        weighted_sample(quality, id_col, keep_prob, salt=salt)
        if keep_prob is not None
        else quality
    )
    # the split MUST draw independently of the sample: both hash
    # md5(id|salt), so sharing one salt would condition the split on
    # sampling survival (survivors have small draws -> nearly everything
    # would label 'train')
    return deterministic_split(
        sampled, id_col, fractions, salt=f"{salt}:split"
    )


def corpus_quality_mix_pipeline(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    weights: Mapping[int, float],
    bias: float,
    target: Mapping[str, float],
    *,
    n_features: int = 1 << 16,
    fractions: Mapping[str, float] | None = None,
    salt: str = "v2",
) -> DataFrame:
    """Quality-scored, mixture-balanced corpus: the model-driven half of
    corpus preparation, composing the round-5 operator family:

        quality-model scoring -> score-weighted importance resampling
            -> domain-mixture rebalance -> train/val/test split

    The model score (rounded at 6 decimals — the engine-portable boundary)
    IS the keep probability, so higher-quality documents survive
    proportionally more often (DSIR-style selection); the survivors are
    then rebalanced toward ``target`` over ``domain_col`` and split. Each
    stage draws from md5(id|salt) with a DISTINCT salt suffix, so the
    three decisions are independent.

    Scale shape: scoring is a zero-shuffle map-literal expression, the
    resample is a pure filter, the rebalance adds one map-side count and a
    broadcast of |domains| probabilities — the corpus crosses no shuffle
    at all in this pipeline.
    """
    from aumos_drift_detector_spark.operators.quality_model import (
        score_quality_model,
    )

    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    scored = score_quality_model(
        docs, text_col, weights, bias, n_features=n_features
    )
    sampled = weighted_sample(
        scored, id_col, F.round(F.col("quality_score"), 6), salt=salt
    )
    balanced = mixture_rebalance(
        sampled, domain_col, target, id_col, salt=f"{salt}:mix"
    )
    return deterministic_split(
        balanced, id_col, fractions, salt=f"{salt}:split"
    )


def corpus_prep_audit(
    labeled: DataFrame, size_col: str, split_col: str = "split"
) -> DataFrame:
    """Per-split audit frame: ``(split, n_docs, total_size)``."""
    return (
        labeled.groupBy(split_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(size_col)).alias("total_size"),
        )
        .orderBy(split_col)
    )


def corpus_token_budget(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer,
    ppl_max: float,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Token-budget accounting after a perplexity gate — the question a
    training run actually asks of a prepared corpus: *how many tokens do
    we have, per slice, once the quality gate is applied?*

    Composes the round-5 tokens family: every document is self-scored by
    the stupid-backoff LM (operators/lm.py) and BPE-encoded under
    ``tokenizer`` (operators/bpe.py); documents with ``ppl_proxy`` above
    ``ppl_max`` are dropped (the CCNet head/middle selection, with the
    corpus itself as the reference model); the survivors' token counts
    aggregate per ``group_cols``:

        group..., n_docs, n_docs_kept, pct_docs_kept,
        n_tokens_kept, avg_ppl_kept

    Scale shape: the LM's five keyed joins and the encode's two shuffles
    dominate; the gate and audit ride along (a filter plus one grouped
    aggregation over per-document rows, i.e. corpus-row — not token —
    cardinality).  The whole composition is replayed by one DuckDB
    oracle (`token_budget_documents`) built from the LM and encode
    replays as nested CTEs, proving the stages compose exactly (same
    rounding boundary on the gate, same join keys).
    """
    from aumos_drift_detector_spark.operators.bpe import bpe_encode
    from aumos_drift_detector_spark.operators.lm import lm_perplexity

    gcols = list(group_cols)
    lm = lm_perplexity(docs, id_col, text_col).select(id_col, "ppl_proxy")
    enc = bpe_encode(docs, id_col, text_col, tokenizer).select(
        id_col, "n_bpe_tokens"
    )
    joined = (
        docs.select(id_col, *gcols)
        .join(lm, id_col)
        .join(enc, id_col)
        .withColumn("_kept", F.col("ppl_proxy") <= F.lit(float(ppl_max)))
    )
    if not gcols:
        joined = joined.withColumn("_g", F.lit(1))
    keynames = gcols if gcols else ["_g"]
    kept_i = F.col("_kept").cast("long")
    out = joined.groupBy(*keynames).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept_i).alias("n_docs_kept"),
        F.round(F.sum(kept_i) / F.count(F.lit(1)), 6).alias("pct_docs_kept"),
        F.coalesce(
            F.sum(F.when(F.col("_kept"), F.col("n_bpe_tokens"))), F.lit(0)
        ).alias("n_tokens_kept"),
        F.round(F.avg(F.when(F.col("_kept"), F.col("ppl_proxy"))), 6).alias(
            "avg_ppl_kept"
        ),
    )
    return out if gcols else out.drop("_g")
