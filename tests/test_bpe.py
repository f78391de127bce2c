"""Tests for the distributed BPE tokenizer (operators/bpe.py):
driver/distributed training parity, fold == scan merge equivalence,
encode invariants, and equivalence of the two published encode orders
(min-rank one-at-a-time vs rank-order merge-all) on trained tables."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.bpe import (
    DEMO_MERGES,
    END_OF_WORD,
    BpeTokenizer,
    _apply_merge,
    _encode_kernel,
    _fold_merge,
    _train_kernel,
    bpe_encode,
    encode_words,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    (1, "low low low lower lowest"),
    (2, "new newer newest wide wider widest"),
    (3, "low new low newer wide lowest"),
    (4, "the the the a a an"),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# kernels


def test_apply_merge_left_to_right_non_overlap():
    assert _apply_merge(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert _apply_merge(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    assert _apply_merge(("a", "b", "b"), "a", "b") == ("ab", "b")
    assert _apply_merge(("a", "a", "b"), "a", "b") == ("a", "ab")
    assert _apply_merge(("x",), "a", "b") == ("x",)


def test_apply_merge_matches_reference_scan_on_random_sequences():
    """replace-last fold == explicit leftmost non-overlapping scan."""

    def scan(syms, left, right):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    rng = random.Random(7)
    alphabet = ["a", "b", "ab", "ba", "c"]
    for _ in range(300):
        syms = tuple(rng.choices(alphabet, k=rng.randint(1, 12)))
        left, right = rng.choice(alphabet), rng.choice(alphabet)
        assert _apply_merge(syms, left, right) == scan(syms, left, right)


def test_train_kernel_classic_example():
    # Sennrich-style toy: 'l o w </w>' dominated pairs merge first.
    merges = _train_kernel([("low", 5), ("lower", 2)], num_merges=4, min_count=2)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # freq-7 'low' prefix beats anything from 'lower' alone.
    assert len(merges) == 4


def test_train_kernel_min_count_stops():
    merges = _train_kernel([("ab", 1)], num_merges=10, min_count=2)
    assert merges == []
    merges = _train_kernel([("ab", 1)], num_merges=10, min_count=1)
    # a+b, ab+</w> — then nothing left to merge.
    assert merges == [("a", "b"), ("ab", END_OF_WORD)]


def test_encode_kernel_concatenation_invariant():
    ranks = {p: i for i, p in enumerate(DEMO_MERGES)}
    for w in ["join", "window", "zzz", "a", "scan", "columns"]:
        toks = _encode_kernel(w, ranks)
        assert "".join(toks) == w + END_OF_WORD


def test_encode_orders_equivalent_on_trained_table():
    """min-rank one-at-a-time (the implementation + the DuckDB oracle)
    == rank-order merge-all (subword-nmt's published encode) for any
    table produced by BPE training."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = _train_kernel(wf, num_merges=12, min_count=1)
    ranks = {p: i for i, p in enumerate(merges)}

    def rank_order(word):
        syms = tuple(word) + (END_OF_WORD,)
        for left, right in merges:
            syms = _apply_merge(syms, left, right)
        return list(syms)

    for w, _ in wf + [("wides", 1), ("lowestest", 1), ("x", 1)]:
        assert _encode_kernel(w, ranks) == rank_order(w)


# ---------------------------------------------------------------------------
# distributed twins


def test_fold_merge_matches_apply_merge(spark):
    cases = [
        ("a a a", "a", "a"),
        ("a a a a", "a", "a"),
        ("a b b", "a", "b"),
        ("a a b", "a", "b"),
        ("ab c ab c", "ab", "c"),
        ("x", "a", "b"),
    ]
    df = spark.createDataFrame([(s,) for s, _, _ in cases], "s string")
    for s, left, right in cases:
        got = (
            df.where(F.col("s") == s)
            .select(_fold_merge(F.split("s", " "), left, right).alias("m"))
            .first()["m"]
        )
        assert tuple(got) == _apply_merge(tuple(s.split(" ")), left, right), s


def test_train_driver_equals_distributed(spark):
    docs = _docs(spark)
    drv = train_bpe(docs, "text", num_merges=16, min_count=2)
    dist = train_bpe(docs, "text", num_merges=16, min_count=2, collect_cap=0)
    assert drv.merges == dist.merges
    assert len(drv.merges) > 4


def test_train_distributed_min_count_early_stop(spark):
    docs = _docs(spark, [(1, "ab cd")])
    dist = train_bpe(docs, "text", num_merges=8, min_count=2, collect_cap=0)
    assert dist.merges == ()


def test_word_frequencies(spark):
    wf = {
        r["w"]: r["freq"]
        for r in word_frequencies(_docs(spark), "text").collect()
    }
    assert wf["low"] == 5
    assert wf["the"] == 3


def test_encode_words_distinct_dim(spark):
    tok = BpeTokenizer(merges=(("l", "o"), ("lo", "w"), ("low", END_OF_WORD)))
    dim = spark.createDataFrame([("low",), ("lower",), ("x",)], "w string")
    got = {r["w"]: (r["toks"], r["n_tok"]) for r in encode_words(dim, tok).collect()}
    assert got["low"] == (["low</w>"], 1)
    assert got["lower"] == (["low", "e", "r", END_OF_WORD], 4)
    assert got["x"] == (["x", END_OF_WORD], 2)


def test_bpe_encode_end_to_end(spark):
    docs = _docs(spark)
    tok = train_bpe(docs, "text", num_merges=16, min_count=2)
    out = {r["doc_id"]: r.asDict() for r in bpe_encode(docs, "doc_id", "text", tok).collect()}
    ranks = tok.ranks
    for doc_id, text in CORPUS:
        words = text.split()
        expect = [t for w in words for t in _encode_kernel(w, ranks)]
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["bpe_tokens"] == expect
        assert out[doc_id]["n_bpe_tokens"] == len(expect)


def test_bpe_encode_empty_and_whitespace_docs(spark):
    docs = _docs(spark, [(1, "low"), (2, "   "), (3, "")])
    tok = BpeTokenizer(merges=())
    out = bpe_encode(docs, "doc_id", "text", tok).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert out[0]["bpe_tokens"] == ["l", "o", "w", END_OF_WORD]


def test_demo_merges_reproducible_from_sf0001(spark):
    """DEMO_MERGES is exactly train_bpe(sf0.001 documents, 48, 2)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = train_bpe(docs, "text", num_merges=48, min_count=2)
    assert list(tok.merges) == DEMO_MERGES


def test_bpe_corpus_stats_grouped(spark):
    tok = BpeTokenizer(merges=(("l", "o"), ("lo", "w"), ("low", END_OF_WORD)))
    docs = spark.createDataFrame(
        [(1, "low low x", "en"), (2, "low", "de")],
        "doc_id long, text string, lang string",
    )
    from aumos_drift_detector_spark.operators.bpe import bpe_corpus_stats

    out = {
        r["lang"]: r.asDict()
        for r in bpe_corpus_stats(docs, "text", tok, group_cols=("lang",)).collect()
    }
    # en: 'low'->[low</w>] (x2), 'x'->[x, </w>]; both of x's tokens are
    # fallback (neither is a merge output), low</w> is not.
    en = out["en"]
    assert en["n_words"] == 3
    assert en["n_tokens"] == 4
    assert en["fertility"] == round(4 / 3, 6)
    assert en["char_fallback_rate"] == 0.5
    assert en["distinct_tokens"] == 3  # low</w>, x, </w>
    de = out["de"]
    assert (de["n_words"], de["n_tokens"], de["char_fallback_rate"]) == (1, 1, 0.0)


def test_bpe_corpus_stats_global_and_empty_merges(spark):
    from aumos_drift_detector_spark.operators.bpe import bpe_corpus_stats

    docs = _docs(spark, [(1, "ab ab")])
    out = bpe_corpus_stats(docs, "text", BpeTokenizer(merges=())).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # every token is a raw symbol under an empty merge table
    assert r["char_fallback_rate"] == 1.0
    assert r["n_words"] == 2 and r["n_tokens"] == 6
    assert r["distinct_tokens"] == 3  # a, b, </w>
    assert "lang" not in r and "_g" not in r
