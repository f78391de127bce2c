"""Tests for deterministic sampling, split assignment, and repetition scores."""

import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.sampling import (
    deterministic_split,
    mixture_rebalance,
    stratified_quota_sample,
    weighted_sample,
)
from aumos_drift_detector_spark.operators.text import repetition_scores


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(f"id{i:03d}", f"s{i % 3}") for i in range(90)]
    return spark.createDataFrame(rows, ["id", "stratum"]).cache()


class TestStratifiedQuotaSample:
    def test_exact_quotas_and_drop_unlisted(self, spark, strata_df):
        got = stratified_quota_sample(
            strata_df, "stratum", {"s0": 7, "s1": 30, "s2": 100}, "id"
        )
        counts = {r["stratum"]: r["n"] for r in got.groupBy("stratum").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        # s1 quota matches its size exactly; s2's quota exceeds it (all 30
        # return); a quota dict without a stratum would drop it entirely
        assert counts == {"s0": 7, "s1": 30, "s2": 30}
        got2 = stratified_quota_sample(
            strata_df, "stratum", {"s0": 7}, "id"
        )
        assert got2.select("stratum").distinct().collect()[0][0] == "s0"

    def test_deterministic_and_salt_sensitive(self, spark, strata_df):
        q = {"s0": 5, "s1": 5, "s2": 5}
        a = {r["id"] for r in stratified_quota_sample(
            strata_df, "stratum", q, "id").select("id").collect()}
        b = {r["id"] for r in stratified_quota_sample(
            strata_df, "stratum", q, "id").select("id").collect()}
        c = {r["id"] for r in stratified_quota_sample(
            strata_df, "stratum", q, "id", salt="v2").select("id").collect()}
        assert a == b
        assert a != c  # a redraw of 15 of 90 ids collides with ~1e-12 prob

    def test_passthrough_columns_survive(self, spark, strata_df):
        extra = strata_df.withColumn("payload", F.length("id"))
        got = stratified_quota_sample(extra, "stratum", {"s0": 3}, "id")
        assert set(got.columns) == {"id", "stratum", "payload"}

    def test_empty_quotas_returns_empty_frame(self, spark, strata_df):
        # regression: createDataFrame([]) used to raise
        # CANNOT_INFER_EMPTY_SCHEMA; empty quota map means "drop everything"
        got = stratified_quota_sample(strata_df, "stratum", {}, "id")
        assert got.count() == 0
        assert got.columns == strata_df.columns


class TestDeterministicSplit:
    def test_fraction_validation(self, spark, strata_df):
        with pytest.raises(ValueError):
            deterministic_split(strata_df, "id", {})
        with pytest.raises(ValueError):
            deterministic_split(strata_df, "id", {"train": 0.5, "val": 0.2})
        # sums to 1.0 but a negative mass would walk the cumulative
        # threshold past the keyspace mid-chain
        with pytest.raises(ValueError):
            deterministic_split(strata_df, "id", {"train": 1.2, "val": -0.2})

    def test_full_mass_on_first_label(self, spark, strata_df):
        # regression: cumulative fraction 1.0 used to format as the 9-char
        # '100000000', which sorts below ~94% of digests — rows leaked to
        # the zero-mass label
        got = deterministic_split(strata_df, "id", {"train": 1.0, "val": 0.0})
        assert got.where(F.col("split") != "train").count() == 0

    def test_stable_under_repartition_and_subset(self, spark, strata_df):
        frac = {"train": 0.8, "val": 0.1, "test": 0.1}
        full = {
            r["id"]: r["split"]
            for r in deterministic_split(strata_df, "id", frac).collect()
        }
        shuffled = {
            r["id"]: r["split"]
            for r in deterministic_split(
                strata_df.repartition(13), "id", frac
            ).collect()
        }
        assert full == shuffled
        # a SUBSET frame (even a different table sharing the ids) agrees
        sub = strata_df.where(F.col("stratum") == "s1").select("id")
        sub_map = {
            r["id"]: r["split"]
            for r in deterministic_split(sub, "id", frac).collect()
        }
        assert all(full[k] == v for k, v in sub_map.items())

    def test_proportions_approximate(self, spark):
        ids = spark.range(4000).select(F.col("id").cast("string").alias("id"))
        got = deterministic_split(ids, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert abs(counts["train"] / 4000 - 0.8) < 0.03
        assert abs(counts["val"] / 4000 - 0.1) < 0.03
        assert abs(counts["test"] / 4000 - 0.1) < 0.03

    def test_single_label_degenerates(self, spark, strata_df):
        got = deterministic_split(strata_df, "id", {"all": 1.0})
        assert got.where(F.col("split") != "all").count() == 0

    def test_split_plan_has_no_shuffle(self, spark, strata_df):
        # the subset-stability guarantee rests on the label being a pure
        # column expression — any Exchange here would betray hidden state
        plan = (
            deterministic_split(strata_df, "id", {"train": 0.9, "val": 0.1})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestWeightedSample:
    def test_exact_edges_and_clamp(self, spark, strata_df):
        # p=1 keeps everything (numeric bound 2^32 > any 32-bit draw),
        # p=0 keeps nothing, out-of-range p clamps rather than misbehaving
        assert weighted_sample(strata_df, "id", F.lit(1.0)).count() == 90
        assert weighted_sample(strata_df, "id", F.lit(0.0)).count() == 0
        assert weighted_sample(strata_df, "id", F.lit(7.5)).count() == 90
        assert weighted_sample(strata_df, "id", F.lit(-2.0)).count() == 0

    def test_proportion_and_determinism(self, spark):
        ids = spark.range(4000).select(F.col("id").cast("string").alias("id"))
        kept = weighted_sample(ids, "id", F.lit(0.25))
        n = kept.count()
        assert abs(n / 4000 - 0.25) < 0.03
        a = {r["id"] for r in kept.collect()}
        b = {r["id"] for r in weighted_sample(ids, "id", F.lit(0.25)).collect()}
        assert a == b
        c = {
            r["id"]
            for r in weighted_sample(ids, "id", F.lit(0.25), salt="v2").collect()
        }
        assert a != c

    def test_subset_consistency_and_per_row_prob(self, spark):
        # the keep decision depends only on (id, salt, p-row): a subset
        # frame agrees with the full frame, and a per-row probability
        # column drives differential keep rates
        df = spark.range(2000).select(
            F.col("id").cast("string").alias("id"),
            F.when(F.col("id") % 2 == 0, F.lit(0.9)).otherwise(F.lit(0.1)).alias("p"),
        )
        kept = weighted_sample(df, "id", "p").toPandas()
        even = sum(int(i) % 2 == 0 for i in kept["id"])
        odd = len(kept) - even
        assert even > 800 and odd < 200
        sub = df.where(F.col("id").cast("long") < 500)
        sub_kept = {r["id"] for r in weighted_sample(sub, "id", "p").collect()}
        full_kept = {i for i in kept["id"] if int(i) < 500}
        assert sub_kept == full_kept

    def test_no_shuffle(self, spark, strata_df):
        plan = (
            weighted_sample(strata_df, "id", F.lit(0.5))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestMixtureRebalance:
    @pytest.fixture(scope="class")
    def domain_df(self, spark):
        # skewed domains: web 3000, code 900, books 100
        rows = [(f"w{i}", "web") for i in range(3000)]
        rows += [(f"c{i}", "code") for i in range(900)]
        rows += [(f"b{i}", "books") for i in range(100)]
        return spark.createDataFrame(rows, ["id", "domain"]).cache()

    def test_bottleneck_domain_keeps_everything(self, spark, domain_df):
        # equal target weights -> books (smallest n/w) is the bottleneck:
        # p_books = 1 exactly, every books row survives
        got = mixture_rebalance(
            domain_df, "domain", {"web": 1, "code": 1, "books": 1}, "id"
        )
        counts = {
            r["domain"]: r["n"]
            for r in got.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert counts["books"] == 100
        # expected 100 per domain; md5 draws give binomial noise around it
        assert abs(counts["web"] - 100) < 40
        assert abs(counts["code"] - 100) < 40

    def test_target_mixture_reached(self, spark, domain_df):
        # 2:1:1 over (web, code, books): C = min(3000/0.5, 900/0.25,
        # 100/0.25) = 400 -> expect 200/100/100
        got = mixture_rebalance(
            domain_df, "domain", {"web": 2, "code": 1, "books": 1}, "id"
        )
        counts = {
            r["domain"]: r["n"]
            for r in got.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert counts["books"] == 100  # bottleneck, p=1
        assert abs(counts["web"] - 200) < 55
        assert abs(counts["code"] - 100) < 40

    def test_zero_weight_and_unlisted_dropped(self, spark, domain_df):
        got = mixture_rebalance(
            domain_df, "domain", {"web": 1, "code": 0}, "id"
        )
        doms = {r["domain"] for r in got.select("domain").distinct().collect()}
        assert doms == {"web"}
        # zero-weight domain must not cap C: web is its own bottleneck -> p=1
        assert got.count() == 3000

    def test_deterministic_and_repartition_stable(self, spark, domain_df):
        t = {"web": 1, "code": 2, "books": 1}
        a = {r["id"] for r in mixture_rebalance(domain_df, "domain", t, "id").collect()}
        b = {
            r["id"]
            for r in mixture_rebalance(
                domain_df.repartition(7), "domain", t, "id"
            ).collect()
        }
        assert a == b
        c = {
            r["id"]
            for r in mixture_rebalance(
                domain_df, "domain", t, "id", salt="v2"
            ).collect()
        }
        assert a != c

    def test_empty_target_and_validation(self, spark, domain_df):
        assert mixture_rebalance(domain_df, "domain", {}, "id").count() == 0
        with pytest.raises(ValueError):
            mixture_rebalance(domain_df, "domain", {"web": -1}, "id")
        with pytest.raises(ValueError):
            mixture_rebalance(domain_df, "domain", {"web": 0.0}, "id")


class TestSequencePacking:
    def _packed(self, spark, budget=100, n_buckets=1):
        from aumos_drift_detector_spark.operators.packing import next_fit_pack

        rows = [(f"d{i}", s) for i, s in enumerate([60, 50, 40, 30, 250, 10, 90])]
        df = spark.createDataFrame(rows, ["doc_id", "n"])
        return next_fit_pack(df, "doc_id", "n", budget=budget, n_buckets=n_buckets)

    def test_budget_respected_and_oversize_isolated(self, spark):
        got = self._packed(spark).toPandas()
        sums = got.groupby("pack_id")["size"].sum()
        oversize = got[got["size"] > 100]
        # the 250-size doc must be ALONE in its pack
        assert len(oversize) == 1
        over_pack = oversize["pack_id"].iloc[0]
        assert (got["pack_id"] == over_pack).sum() == 1
        # every other pack fits the budget
        assert (sums.drop(over_pack) <= 100).all()
        # nothing dropped, positions start at 0 per pack
        assert len(got) == 7
        assert (got.groupby("pack_id")["pack_pos"].min() == 0).all()

    def test_next_fit_is_order_deterministic(self, spark):
        a = self._packed(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
        b = self._packed(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)

    def test_multi_bucket_packs_do_not_mix(self, spark):
        got = self._packed(spark, n_buckets=4).toPandas()
        # pack_id embeds the bucket: one bucket per pack by construction
        assert (
            got["pack_id"].str.slice(0, 4).astype(int) == got["bucket"]
        ).all()

    def test_large_n_buckets_not_capped_at_256(self, spark):
        from aumos_drift_detector_spark.operators.packing import next_fit_pack

        # regression: bucket from 2 md5 hex chars capped at 256 non-empty
        # buckets, 4x-skewing sizes at n_buckets=1024 (an executor-OOM risk
        # for users sizing buckets to fit memory)
        df = spark.range(4000).select(
            F.col("id").cast("string").alias("doc_id"), F.lit(10).alias("n")
        )
        got = next_fit_pack(df, "doc_id", "n", budget=100, n_buckets=1024)
        n_distinct = got.select("bucket").distinct().count()
        assert n_distinct > 256
        # ~4000 draws over 1024 buckets: expect nearly all buckets hit
        assert n_distinct > 900

    def test_null_sizes_excluded_and_utilization(self, spark):
        from aumos_drift_detector_spark.operators.packing import (
            next_fit_pack,
            pack_utilization,
        )

        df = spark.createDataFrame(
            [("a", 70), ("b", None), ("c", 40)], "doc_id string, n long"
        )
        packed = next_fit_pack(df, "doc_id", "n", budget=100, n_buckets=1)
        assert packed.count() == 2
        audit = pack_utilization(packed, 100).collect()[0]
        assert audit["n_docs"] == 2 and audit["n_oversize_docs"] == 0
        assert audit["n_packs"] == 2  # 70+40 > 100 -> two packs
        assert audit["fill_fraction"] == round(110 / 200, 6)


class TestRepetitionScores:
    def test_hand_computed_fractions(self, spark):
        df = spark.createDataFrame(
            [
                ("d1", "a a a a"),          # 1/4 distinct words; 2-grams all "a a"
                ("d2", "a b c d"),          # no repetition
                ("d3", "x"),                # short doc: whole-document gram
                ("d4", "go go stop go go"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r for r in repetition_scores(df, "doc_id", "text").collect()}
        assert got["d1"]["dup_word_frac"] == 0.75
        assert got["d1"]["dup_2gram_frac"] == round(1 - 1 / 3, 6)
        assert got["d2"]["dup_word_frac"] == 0.0
        assert got["d2"]["dup_2gram_frac"] == 0.0
        assert got["d3"]["dup_word_frac"] == 0.0
        assert got["d3"]["dup_2gram_frac"] == 0.0
        # d4: 5 words, 2 distinct -> 0.6; grams [go go, go stop, stop go,
        # go go] -> 4 total, 3 distinct -> 0.25
        assert got["d4"]["dup_word_frac"] == 0.6
        assert got["d4"]["dup_2gram_frac"] == 0.25

    def test_null_text_propagates(self, spark):
        df = spark.createDataFrame([("d1", None)], "doc_id string, text string")
        row = repetition_scores(df, "doc_id", "text").collect()[0]
        assert row["dup_word_frac"] is None and row["dup_2gram_frac"] is None

    def test_oracle_null_branch_matches_operator(self, spark):
        # the sf0.01 documents table has no NULL texts, so the contract
        # gate never exercises _REPETITION_SQL's CASE gate — pin the
        # Spark<->DuckDB agreement on a NULL row here
        import duckdb
        import pandas as pd

        import __spark_entry__ as entry

        rows = [("d1", "go go stop"), ("d2", None), ("d3", "x")]
        sdf = (
            repetition_scores(
                spark.createDataFrame(rows, "doc_id string, text string"),
                "doc_id",
                "text",
            )
            .orderBy("doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        odf = con.execute(entry._REPETITION_SQL).df()
        assert sdf["doc_id"].tolist() == odf["doc_id"].tolist()
        for c in ("dup_word_frac", "dup_2gram_frac"):
            for a, b in zip(sdf[c].tolist(), odf[c].tolist()):
                assert (pd.isna(a) and pd.isna(b)) or a == b
