"""Distributed byte-pair-encoding tokenizer: corpus-scale training + encoding.

The canonical subword tokenizer of LLM pre-training (Sennrich et al.,
2016, "Neural Machine Translation of Rare Words with Subword Units";
the GPT-2 byte-level variant differs only in the initial alphabet).
This module restates both halves as DataFrame programs:

``train_bpe``
    The classic scale move IS the algorithm: the corpus collapses to a
    word-frequency dim with ONE corpus-scale shuffle (explode + groupBy
    word), and every merge iteration after that touches only the
    vocab-sized dim — exactly how the reference single-node trainers
    (subword-nmt, GPT-2) operate on ``Counter(words)`` rather than the
    raw text.  Per iteration: adjacent-pair counts are one grouped
    aggregation with map-side partial combine, the argmax is a 1-row
    collect (count desc, then lexicographic (left, right) — fully
    deterministic), and the merge application is a JVM-side
    ``F.aggregate`` fold (replace-last scan == left-to-right
    non-overlapping merge).  Lineage is truncated with
    ``localCheckpoint`` every few merges so a 1000-merge run does not
    accumulate a 1000-deep plan.

    Adaptive plan (the repo-wide sketch pattern, see drift.py): when the
    vocab dim fits ``collect_cap`` the whole merge loop runs as a driver
    kernel over the collected (word, freq) pairs — bit-identical to the
    distributed loop (pytest-pinned) and hundreds of Spark jobs cheaper.
    Above the cap the distributed loop takes over unchanged; a 100-TB
    corpus with a 100M-word vocab trains without ever materializing the
    vocab on the driver.

``bpe_encode``
    Encoding exploits Zipf: only DISTINCT words are encoded (an
    Arrow-batched ``mapInPandas`` running the min-rank/leftmost merge
    loop per word), then the vocab-sized token dim joins back to word
    positions (AQE broadcasts it when it fits) and per-document token
    sequences reassemble with one grouped sort-free ``array_sort`` over
    (pos, tokens) structs.  The corpus-scale cost is two shuffles
    (dim join keyed by word, reassembly keyed by doc) — no per-token
    shuffle, no window.

Determinism / oracle story: every step is integer counting, exact
lexicographic tie-breaks, and string concatenation, so a SQL engine can
replay encoding exactly — the DuckDB oracle (``__spark_entry__``)
re-runs the min-rank/leftmost loop as a recursive CTE over the same
merge table and must reproduce the per-document token stream md5.
Training's per-iteration argmax-over-aggregate is NOT expressible as a
single recursive CTE (SQL forbids aggregates over the recursive
relation), so ``bpe_train_documents`` ships rows-only with the
distributed==driver==pure-Python parity pinned in pytest instead.

Algorithm equivalences relied on (and pinned by tests):
  - replace-last fold == left-to-right non-overlapping pair merge
    (the fold can only falsely re-trigger if ``l + r == l``, i.e. an
    empty right symbol, which cannot occur);
  - one-occurrence-at-a-time encoding with global min-rank re-selection
    == merge-all-occurrences-per-rank, for any merge table produced by
    BPE training (a pair involving a merge's output always ranks after
    that merge, so merging one occurrence never enables a lower rank).

End-of-word marker: ``</w>`` is appended to each word's character
sequence (the Sennrich convention) so merges distinguish word-final
subwords.  Corpora whose raw text could itself contain the 4-char
sequence ``</w>`` as a word would alias the marker; the marker is a
module constant for such cases.

Reference parity: the reference has no tokenizer; this is a pipeline
extension (SURVEY.md "LLM-data-pipeline operators", tokens family)
alongside text.bpe_token_estimate (which it upgrades from a chars/4
heuristic to a real learned segmentation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import clean_words as _words
from .text import widen_narrow_input as _widen

END_OF_WORD = "</w>"


# ---------------------------------------------------------------------------
# driver kernels (also the reference semantics for the distributed twins)


def _apply_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of (left, right) -> left+right,
    as a replace-last scan (see module docstring for the equivalence)."""
    out: list[str] = []
    merged = left + right
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = merged
        else:
            out.append(s)
    return tuple(out)


def _train_kernel(
    word_freqs: Iterable[tuple[str, int]],
    num_merges: int,
    min_count: int,
) -> list[tuple[str, str]]:
    """Merge loop over a word-frequency table (Sennrich et al., 2016).

    Tie-break: highest count, then lexicographically smallest (l, r) —
    identical to the distributed ``orderBy(desc(cnt), asc(l), asc(r))``.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        syms = tuple(word) + (END_OF_WORD,)
        vocab[syms] = vocab.get(syms, 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((left, right))
        vocab = dict(_merge_items(vocab, left, right))
    return merges


def _has_pair(syms: tuple[str, ...], left: str, right: str) -> bool:
    return any(a == left and b == right for a, b in zip(syms, syms[1:]))


def _merge_items(
    vocab: dict[tuple[str, ...], int], left: str, right: str
) -> Iterator[tuple[tuple[str, ...], int]]:
    """Yield (syms, freq) accumulating collisions (two distinct symbol
    sequences can merge to the same sequence)."""
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        key = _apply_merge(syms, left, right) if _has_pair(syms, left, right) else syms
        out[key] = out.get(key, 0) + freq
    return iter(out.items())


def _encode_kernel(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Min-rank / leftmost-occurrence merge loop (the recursive-CTE
    oracle replays exactly this)."""
    syms = list(word) + [END_OF_WORD]
    while True:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            return syms
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]


# ---------------------------------------------------------------------------
# distributed training


@dataclass(frozen=True)
class BpeTokenizer:
    """An ordered merge table; rank == list index."""

    merges: tuple[tuple[str, str], ...]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _char_syms(word: Column) -> Column:
    """word -> [c1, c2, ..., '</w>'].  ``(?!$)`` splits before every
    character without a trailing empty element (Java 8+ drops the
    zero-width leading empty)."""
    return F.concat(F.split(word, "(?!$)"), F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms: Column) -> Column:
    """Array of (l, r) structs for adjacent symbol pairs; empty for
    single-symbol sequences (``sequence(1, 0)`` would count DOWN)."""
    n = F.size(syms)
    return F.when(
        n > 1,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _fold_merge(syms: Column, left: str, right: str) -> Column:
    """JVM-side replace-last merge fold — the distributed twin of
    ``_apply_merge``, guarded so untouched rows skip the fold."""
    l_lit, r_lit, m_lit = F.lit(left), F.lit(right), F.lit(left + right)
    folded = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l_lit)
            & (s == r_lit),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m_lit)),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    has = F.exists(
        _adjacent_pairs(syms), lambda p: (p["l"] == l_lit) & (p["r"] == r_lit)
    )
    return F.when(has, folded).otherwise(syms)


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(w, freq) — the single corpus-scale shuffle of BPE training."""
    return (
        _widen(df).select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 64,
    min_count: int = 2,
    collect_cap: int = 1_000_000,
    checkpoint_every: int = 8,
) -> BpeTokenizer:
    """Learn a BPE merge table from a text corpus.

    Under ``collect_cap`` distinct words the merge loop runs on the
    driver over the collected frequency table (bit-identical, pinned by
    pytest); above it, the distributed loop iterates on the cached vocab
    dim.  ``min_count`` stops before degenerate merges learned from
    near-singleton pairs.
    """
    wf = word_frequencies(df, text_col)
    if collect_cap:
        probe = wf.limit(collect_cap + 1).collect()
        if len(probe) <= collect_cap:
            merges = _train_kernel(
                ((r["w"], r["freq"]) for r in probe), num_merges, min_count
            )
            return BpeTokenizer(merges=tuple(merges))

    cur = wf.select(_char_syms(F.col("w")).alias("syms"), "freq").localCheckpoint()
    merges_out: list[tuple[str, str]] = []
    for it in range(num_merges):
        best = (
            cur.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges_out.append((left, right))
        cur = cur.select(_fold_merge(F.col("syms"), left, right).alias("syms"), "freq")
        if (it + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint()
    return BpeTokenizer(merges=tuple(merges_out))


# ---------------------------------------------------------------------------
# distributed encoding


def encode_words(words_df: DataFrame, tokenizer: BpeTokenizer) -> DataFrame:
    """(w) -> (w, toks array<string>, n_tok) via Arrow-batched pandas —
    one encode per DISTINCT word (Zipf does the rest)."""
    ranks = tokenizer.ranks

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = [_encode_kernel(w, ranks) for w in pdf["w"]]
            yield pd.DataFrame(
                {"w": pdf["w"], "toks": toks, "n_tok": [len(t) for t in toks]}
            )

    # Explicit repartition so the Python merge loop runs cluster-wide: the
    # distinct-words exchange upstream carries only a few hundred KB, so
    # AQE coalesces it to ONE post-shuffle partition and the whole vocab
    # would encode serially in a single Python worker (measured 7.4s
    # single-task stage at sf1.0 vs ~0.5s spread over 32).  A user
    # repartition-by-num is exempt from AQE coalescing; the vocab dim is
    # small, so the extra exchange is noise at any scale (guide §2.5:
    # partition count must follow compute cost, not byte size — each row
    # here costs a full merge loop, not a hash probe).
    sc = words_df.sparkSession.sparkContext
    return words_df.select("w").repartition(sc.defaultParallelism).mapInPandas(
        run, "w string, toks array<string>, n_tok bigint"
    )


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, tokenizer: BpeTokenizer
) -> DataFrame:
    """Per-document BPE token stream.

    Output, one row per document with >= 1 word:
      id, n_words, n_bpe_tokens, bpe_tokens (array<string>, in document
      order).  Two corpus-scale shuffles: the vocab-dim join keyed by
      word (broadcast under AQE when the vocab fits) and the reassembly
      keyed by document.
    """
    pos = (
        _widen(df).select(F.col(id_col), _words(F.col(text_col)).alias("_ws"))
        .where(F.size("_ws") > 0)
        .select(
            id_col,
            F.size("_ws").alias("_nw"),
            F.posexplode("_ws").alias("_p", "w"),
        )
    )
    dim = encode_words(pos.select("w").distinct(), tokenizer)
    return (
        pos.join(dim, "w")
        .groupBy(id_col)
        .agg(
            F.max("_nw").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "toks"))),
                    lambda x: x["toks"],
                )
            ).alias("bpe_tokens"),
        )
    )


def bpe_corpus_stats(
    df: DataFrame,
    text_col: str,
    tokenizer: BpeTokenizer,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group tokenizer evaluation — the acceptance gate run before a
    tokenizer ships against a new corpus slice:

      n_words, n_tokens, fertility (tokens per word, the compression
      metric), char_fallback_rate (fraction of emitted tokens that are
      NOT a learned merge output, i.e. raw alphabet symbols — high
      fallback on a slice means the merge table never saw its script),
      distinct_tokens.

    Same Zipf-deduped plan as ``bpe_encode``: only distinct words are
    encoded, per-word fallback counts are computed once on the vocab dim
    (a ``F.filter`` over the broadcast-literal merged-token set, so no
    token-instance explode for the rate), and only the distinct-token
    count pays a token-level aggregation (two-phase via countDistinct's
    partial aggregates).
    """
    gcols = list(group_cols)
    pos = _widen(df).select(
        *gcols, F.explode(_words(F.col(text_col))).alias("w")
    )
    dim = encode_words(pos.select("w").distinct(), tokenizer)
    merged = [left + right for left, right in tokenizer.merges]
    if merged:
        # Per-word fallback counts via a broadcast ANTI-join of the
        # (vocab-sized) exploded dim tokens against the merged-token dim —
        # NOT `~t.isin(merged)`: an IN-list embeds every merged token as a
        # plan literal, which at a real 32k-50k-merge vocab is a 50k-
        # literal expression tree (plan bloat / codegen limits).  The join
        # stays dim-scale: tokens of DISTINCT words only, never a
        # token-instance explode.
        merged_dim = F.broadcast(
            df.sparkSession.createDataFrame(
                [(m,) for m in merged], "tok string"
            )
        )
        fallback_counts = (
            dim.select("w", F.explode("toks").alias("tok"))
            .join(merged_dim, "tok", "left_anti")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n_fallback"))
        )
        dim = dim.join(fallback_counts, "w", "left").withColumn(
            "n_fallback", F.coalesce("n_fallback", F.lit(0))
        )
    else:
        dim = dim.withColumn("n_fallback", F.col("n_tok"))
    joined = pos.join(dim, "w")
    if not gcols:
        joined = joined.withColumn("_g", F.lit(1))
    keynames = gcols if gcols else ["_g"]
    base = joined.groupBy(*keynames).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_fallback").alias("n_fallback"),
    )
    dt = (
        joined.select(*keynames, F.explode("toks").alias("tok"))
        .groupBy(*keynames)
        .agg(F.countDistinct("tok").alias("distinct_tokens"))
    )
    out = base.join(dt, keynames).select(
        *gcols,
        "n_words",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("n_words"), 6).alias("fertility"),
        F.round(F.col("n_fallback") / F.col("n_tokens"), 6).alias(
            "char_fallback_rate"
        ),
        "distinct_tokens",
    )
    return out


#: Fixed demonstration merge table for the oracle-checked contract query:
#: produced by ``train_bpe`` (driver path == distributed path, parity
#: pytest-pinned) on the deterministic sf0.001 ``documents`` corpus with
#: num_merges=48, min_count=2 — regenerate with
#: ``scripts/gen_demo_merges.py``.  A tokenizer is a fixed artifact
#: applied to any corpus, so pinning the table keeps
#: ``bpe_encode_documents`` scale-factor-independent.
DEMO_MERGES: list[tuple[str, str]] = [
    # regenerated by scripts/gen_demo_merges.py — do not edit by hand
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("o", "r"),
    ("t", "</w>"),
    ("er", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("l", "u"),
    ("i", "n"),
    ("y", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("g", "</w>"),
    ("a", "s"),
    ("h", "</w>"),
    ("a", "</w>"),
    ("s", "t"),
    ("a", "t"),
    ("a", "n</w>"),
    ("c", "an</w>"),
    ("s", "can</w>"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n</w>"),
    ("d", "ow</w>"),
    ("in", "dow</w>"),
    ("w", "indow</w>"),
    ("d", "er</w>"),
    ("or", "der</w>"),
    ("or", "t</w>"),
    ("s", "ort</w>"),
    ("p", "</w>"),
    ("par", "t</w>"),
    ("u", "p</w>"),
    ("a", "g"),
    ("ag", "g</w>"),
    ("a", "lu"),
    ("alu", "e</w>"),
    ("v", "alue</w>"),
    ("in", "e</w>"),
    ("l", "ine</w>"),
    ("e", "y</w>"),
    ("k", "ey</w>"),
    ("i", "n</w>"),
    ("j", "o"),
    ("jo", "in</w>"),
]
