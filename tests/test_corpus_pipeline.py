"""End-to-end corpus-preparation pipeline composition tests."""

import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.plans.corpus_pipeline import (
    corpus_prep_audit,
    corpus_prep_pipeline,
)


@pytest.fixture(scope="module")
def corpus(spark):
    bench = spark.createDataFrame(
        [("b1", "quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs_rows = [
        # contaminated: contains bench b1 verbatim
        ("d1", "intro text then quick brown fox jumps over the lazy dog closing words"),
        # exact duplicate pair: only d2 survives dedup
        ("d2", "a perfectly ordinary training document about spark plans"),
        ("d3", "a perfectly ordinary training document about spark plans"),
        # high-repetition: dup_word_frac = 1 - 2/8 = 0.75 > 0.6
        ("d4", "spam spam spam spam spam spam spam ham"),
        # clean survivors
        ("d5", "distributed aggregation with partial map side combine stages"),
        ("d6", "columnar storage formats enable predicate pushdown and pruning"),
        # the bench row also appears in the corpus and must be excluded
        ("b1", "quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(docs_rows, ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text")
    )
    return docs, bench


class TestCorpusPrepPipeline:
    def test_stage_semantics(self, spark, corpus):
        docs, bench = corpus
        labeled = corpus_prep_pipeline(docs, bench, "doc_id", "text")
        ids = {r["doc_id"] for r in labeled.select("doc_id").collect()}
        # d1 contaminated, b1 is bench, d4 fails quality, d2/d3 dedup to d2
        assert ids == {"d2", "d5", "d6"}
        assert "split" in labeled.columns

    def test_deterministic(self, spark, corpus):
        docs, bench = corpus
        a = sorted(
            (r["doc_id"], r["split"])
            for r in corpus_prep_pipeline(docs, bench, "doc_id", "text").collect()
        )
        b = sorted(
            (r["doc_id"], r["split"])
            for r in corpus_prep_pipeline(docs, bench, "doc_id", "text").collect()
        )
        assert a == b

    def test_audit_totals(self, spark, corpus):
        docs, bench = corpus
        labeled = corpus_prep_pipeline(docs, bench, "doc_id", "text")
        audit = corpus_prep_audit(labeled, "n_chars").collect()
        assert sum(r["n_docs"] for r in audit) == 3
        total = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
        assert sum(r["total_size"] for r in audit) == sum(
            total[i] for i in ("d2", "d5", "d6")
        )

    def test_split_decorrelated_from_sampling(self, spark):
        # both stages hash md5(id|salt); with a SHARED salt the split would
        # be conditioned on sampling survival (survivors have small draws
        # -> everything lands 'train'). The pipeline salts the split
        # independently, so val/test stay populated after a 50% sample.
        docs = spark.range(2000).select(
            F.col("id").cast("string").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("unique token"),
                F.col("id").cast("string"),
                F.lit("filler words one two three four five six"),
            ).alias("text"),
        ).withColumn("n_chars", F.length("text"))
        bench = docs.where(F.lit(False))
        labeled = corpus_prep_pipeline(
            docs, bench, "doc_id", "text", keep_prob=F.lit(0.5)
        )
        counts = {
            r["split"]: r["n"]
            for r in labeled.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n = sum(counts.values())
        assert abs(n / 2000 - 0.5) < 0.05
        assert abs(counts["train"] / n - 0.8) < 0.05
        assert abs(counts.get("val", 0) / n - 0.1) < 0.04
        assert abs(counts.get("test", 0) / n - 0.1) < 0.04

    def test_anti_joins_are_broadcast(self, spark, corpus):
        docs, bench = corpus
        plan = (
            corpus_prep_pipeline(docs, bench, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # bench exclusion + contaminated-id exclusion: train must never
        # shuffle on its own id for either anti join
        assert plan.count("BroadcastHashJoin") >= 2


class TestCorpusQualityMixPipeline:
    @pytest.fixture(scope="class")
    def mix_corpus(self, spark):
        import hashlib

        # lexicon: one strongly-good and one strongly-bad word, hashed with
        # the operator's own md5_60 arithmetic
        def fid(w):
            return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % (1 << 16)

        weights = {fid("excellent"): 4.0, fid("terrible"): -4.0}
        rows = []
        for i in range(300):
            dom = f"s{i % 3}"
            good = i % 2 == 0
            word = "excellent" if good else "terrible"
            rows.append((i, f"{word} document body {i}", dom))
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        return docs, weights

    def test_quality_drives_survival_and_target_mixture(self, spark, mix_corpus):
        from aumos_drift_detector_spark.plans.corpus_pipeline import (
            corpus_quality_mix_pipeline,
        )

        docs, weights = mix_corpus
        out = corpus_quality_mix_pipeline(
            docs, "doc_id", "text", "source",
            weights, 0.0, {"s0": 1, "s1": 1},
        ).cache()
        pdf = out.toPandas()
        # sigmoid(4) ~ 0.982 keep vs sigmoid(-4) ~ 0.018: survivors are
        # overwhelmingly the 'excellent' half
        n_good = int((pdf["doc_id"] % 2 == 0).sum())
        assert n_good > 0.9 * len(pdf)
        # s2 absent from target -> dropped; s0/s1 both present
        assert set(pdf["source"]) == {"s0", "s1"}
        assert set(pdf["split"]) <= {"train", "val", "test"}
        assert "quality_score" in pdf.columns
        # deterministic end to end
        again = corpus_quality_mix_pipeline(
            docs, "doc_id", "text", "source",
            weights, 0.0, {"s0": 1, "s1": 1},
        ).toPandas()
        assert sorted(pdf["doc_id"]) == sorted(again["doc_id"])


class TestCorpusTokenBudget:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                # en: two docs, one repetitive outlier (high self-ppl is
                # NOT guaranteed on tiny corpora, so gate on a computed
                # boundary below instead of guessing)
                (1, "low low low low", "en"),
                (2, "low lower lowest", "en"),
                (3, "new newer newest", "de"),
            ],
            "doc_id long, text string, lang string",
        )

    def test_budget_gate_and_totals(self, spark):
        from aumos_drift_detector_spark.operators.bpe import BpeTokenizer
        from aumos_drift_detector_spark.operators.lm import lm_perplexity
        from aumos_drift_detector_spark.plans.corpus_pipeline import (
            corpus_token_budget,
        )

        docs = self._docs(spark)
        tok = BpeTokenizer(merges=(("l", "o"), ("lo", "w"), ("low", "</w>")))
        ppl = {
            r["doc_id"]: r["ppl_proxy"]
            for r in lm_perplexity(docs, "doc_id", "text").collect()
        }
        # gate exactly between the two en docs: boundary is inclusive
        lo, hi = sorted([ppl[1], ppl[2]])
        out = {
            r["lang"]: r.asDict()
            for r in corpus_token_budget(
                docs, "doc_id", "text", tok, ppl_max=lo, group_cols=("lang",)
            ).collect()
        }
        en = out["en"]
        assert en["n_docs"] == 2
        assert en["n_docs_kept"] == 1
        assert en["pct_docs_kept"] == 0.5
        assert en["n_tokens_kept"] > 0
        # de doc's ppl may fall on either side of en's boundary; just
        # check the accounting is consistent
        de = out["de"]
        assert de["n_docs"] == 1
        assert de["n_docs_kept"] in (0, 1)
        if de["n_docs_kept"] == 0:
            assert de["n_tokens_kept"] == 0 and de["avg_ppl_kept"] is None

    def test_budget_global_group_and_all_dropped(self, spark):
        from aumos_drift_detector_spark.operators.bpe import BpeTokenizer
        from aumos_drift_detector_spark.plans.corpus_pipeline import (
            corpus_token_budget,
        )

        docs = self._docs(spark)
        out = corpus_token_budget(
            docs, "doc_id", "text", BpeTokenizer(merges=()), ppl_max=0.0
        ).collect()
        assert len(out) == 1
        r = out[0].asDict()
        assert r["n_docs"] == 3 and r["n_docs_kept"] == 0
        assert r["n_tokens_kept"] == 0
        assert r["avg_ppl_kept"] is None
        assert "_g" not in r
