"""Deduplication operators for training-data pipelines.

Four dedup families, all declarative DataFrame plans (no per-row Python):

- exact:       content fingerprint (md5/xxhash64) -> two-phase hash aggregate
- minhash-LSH: word shingles -> k permuted min-hashes (one base hash + affine
               permutations, all column arithmetic) -> banded bucket join
- simhash:     64-bit weighted bit-vote signature -> hamming-band candidates
- ngram-jaccard: exact Jaccard on shingle sets for candidate pairs via a
               shingle-posting self-join

Scale notes: the shingle explode multiplies rows by ~doc length / shingle
stride; every downstream join keys on (band, hash) or shingle — both
high-cardinality, so shuffles stay balanced. Candidate verification joins are
semi-joins on doc ids. MinHash permutation constants are deterministic
(seeded) so runs are reproducible.
"""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: a*h stays under 2^62, inside int64 (no overflow
# under ANSI arithmetic); 2^31 hash space is ample for minhash permutations
_MERSENNE_P = (1 << 31) - 1


def _base_hash(col: Column, hash_fn: str) -> Column:
    """Base content hash for the sketch families.

    ``xxhash64`` (default) is the fast JVM path. ``md5_60`` is a 60-bit
    hash derived from the md5 hex digest (conv(substr(md5, 1, 15), 16, 10))
    — bit-identical in any SQL engine with md5, which makes the whole
    minhash/simhash pipeline reproducible by an external oracle (DuckDB
    recomputes it as a base-16 digit sum). Non-negative, fits a signed long.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn: {hash_fn!r} (xxhash64 | md5_60)")


def exact_duplicates(df: DataFrame, id_col: str, content_cols: Sequence[str]) -> DataFrame:
    """Exact-duplicate groups by content fingerprint (md5 over all content cols).

    Returns (fingerprint, n_copies, doc_ids array, keep_id) — one row per
    duplicate group; ``keep_id`` is the min id (the canonical survivor).
    """
    fp = _content_fp(content_cols)
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, content_cols: Sequence[str]) -> DataFrame:
    """Keep one row (min id) per exact content group. One shuffle."""
    from pyspark.sql import Window

    fp = _content_fp(content_cols)
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _content_fp(content_cols: Sequence[str]) -> Column:
    """The ONE exact-content fingerprint (md5 over unit-separated columns)
    shared by exact_duplicates / dedup_exact / incremental_dedup — a second
    definition would silently desynchronize the dedup family."""
    return F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])
    )


def _bloom_positions(fp: Column, n_bits: int, k: int) -> Column:
    """``k`` Bloom bit positions for a fingerprint, as ``array<long>``.

    Each position is an independent 60-bit md5-derived hash
    (``conv(substr(md5(fp|i), 1, 15), 16, 10) % n_bits``) — pure JVM column
    arithmetic, identical on the build and probe sides by construction, and
    replayable by any engine with md5 (same contract as ``md5_60``).
    """
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat_ws("|", fp, F.lit(str(i)))), 1, 15),
                16,
                10,
            ).cast("long")
            % F.lit(n_bits)
            for i in range(k)
        ]
    )


def build_fingerprint_bloom(
    corpus_df: DataFrame,
    content_cols: Sequence[str],
    n_bits: int = 1 << 22,
    k: int = 5,
) -> np.ndarray:
    """Bloom filter (packed uint8 bit array) over corpus content fingerprints.

    The positions are computed JVM-side and deduplicated BEFORE collection,
    so the driver receives at most ``min(k·|corpus|, n_bits)`` distinct
    longs regardless of corpus size — the collect is bounded by the sketch
    size you chose, never by the data. Size ``n_bits ≈ 10·|corpus|`` for a
    ~0.9% false-positive rate at k=5.

    Scale bound (honest): the returned array is ``n_bits/8`` bytes and is
    broadcast to executors by :func:`incremental_dedup`, which holds to
    ~1e9 corpus keys (1.25 GB at 10 bits/key). Beyond that, skip the Bloom
    prefilter and rely on the fingerprint anti-join against a corpus index
    bucketed by fingerprint (the verification path below, minus the probe).
    """
    if n_bits <= 0 or n_bits % 8:
        raise ValueError("n_bits must be a positive multiple of 8")
    pos = (
        corpus_df.select(
            F.explode(
                _bloom_positions(_content_fp(content_cols), n_bits, k)
            ).alias("pos")
        )
        .distinct()
        .toPandas()["pos"]
        .to_numpy(dtype=np.int64)
    )
    bits = np.zeros(n_bits >> 3, dtype=np.uint8)
    if pos.size:
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    content_cols: Sequence[str],
    n_bits: int = 1 << 22,
    k: int = 5,
    bloom: np.ndarray | None = None,
) -> DataFrame:
    """New-batch rows whose exact content is NOT already in the corpus.

    The incremental-ingest primitive: a 100-TB corpus is built in batches,
    and each new batch must drop documents the corpus already holds WITHOUT
    re-deduplicating the whole corpus. Two stages:

    1. **Bloom prefilter** — the corpus fingerprint Bloom (built once per
       ingest via :func:`build_fingerprint_bloom`, reusable across batches)
       is broadcast; each new row tests its k positions. No false
       negatives, so rows that miss are PROVABLY new and skip the join
       entirely. Positions are JVM column expressions; only the bit lookup
       is Python — one Arrow-vectorized numpy gather, no per-row work.
    2. **Verification join** — surviving candidates (true dups + ~1% false
       positives) anti-join the corpus fingerprints, so the join's probe
       side carries only the candidate fraction of the batch. At scale the
       corpus side is a fingerprint index bucketed by fingerprint, making
       the join shuffle-free on the 100-TB side.

    Output == ``new_df`` anti-joined on fingerprint (the Bloom is invisible
    in the result — false positives are re-admitted by the join), so an
    exact SQL oracle needs no Bloom replay. Within-batch duplicates are NOT
    collapsed here; compose with :func:`dedup_exact` for that.
    """
    fp = _content_fp(content_cols)
    if bloom is None:
        bloom = build_fingerprint_bloom(corpus_df, content_cols, n_bits, k)
    if bloom.size * 8 != n_bits:
        raise ValueError(
            f"bloom has {bloom.size * 8} bits, expected n_bits={n_bits}"
        )
    bc = new_df.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def _member(pos: pd.Series) -> pd.Series:
        bits = bc.value
        if not len(pos):
            return pd.Series([], dtype=bool)
        arr = np.asarray(pos.tolist(), dtype=np.int64)
        hit = (bits[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    probed = new_df.withColumn("_fp", fp).withColumn(
        "_member", _member(_bloom_positions(F.col("_fp"), n_bits, k))
    )
    dup_fps = (
        probed.where(F.col("_member"))
        .select("_fp")
        .distinct()
        .join(
            corpus_df.select(fp.alias("_fp")).distinct(), "_fp", "left_semi"
        )
    )
    return (
        probed.join(dup_fps, "_fp", "left_anti")
        .drop("_fp", "_member")
    )


def word_grams(text: Column, n: int) -> Column:
    """All inclusive word n-grams (with duplicates) as an array column.

    The ONE definition of gram construction shared by the shingle-based
    dedup operators and text.repetition_scores (their DuckDB oracles replay
    these semantics verbatim — a second copy would silently desynchronize).
    Documents shorter than n words yield one whole-document gram. NULL or
    empty text degenerates to a single '' gram (greatest() skips the NULL
    size): callers that must not match on it filter '' explicitly.
    """
    words = F.split(text, r"\s+")
    k = F.size(words) - F.lit(n - 1)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM higher-order fns).

    Documents shorter than n words yield one whole-document shingle so they
    still participate in hashing.
    """
    return F.array_distinct(word_grams(text, n))


def word_shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct xxhash64 hashes of word n-gram slices, whitespace-only
    shingles dropped — the hash-level twin of
    ``filter(word_shingles(text, n), trim(s) != '')``.

    Hashing the k-word SLICE directly (xxhash64 chains array elements)
    skips materializing the space-joined shingle string entirely.  Words
    from a ``\\s+`` split contain no whitespace, so slice equality ==
    joined-string equality (concat_ws with a single space is injective
    over such word sequences) and ``trim(joined) == ''`` holds exactly
    when every word in the slice is ``''`` — replicated here as
    ``NOT exists(w != '')``.  Distinct hash count == distinct shingle
    count up to 64-bit collisions (the repo-wide xxhash64 tolerance).
    """
    words = F.split(text, r"\s+")
    k = F.size(words) - F.lit(n - 1)
    slices = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.slice(words, i, n),
    )
    kept = F.filter(slices, lambda s: F.exists(s, lambda w: w != F.lit("")))
    return F.array_distinct(F.transform(kept, lambda s: F.xxhash64(s)))


def _permutation_constants(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, minhash array<long>) via one base hash + k affine permutations.

    Classic trick: instead of k independent hash passes over the shingles,
    hash each shingle once (``hash_fn``) and derive permutation i as
    ``(a_i * h + b_i) mod p`` (p = 2^31-1) — pure column arithmetic, one
    explode, one aggregate. ``hash_fn='md5_60'`` makes every value
    reproducible by an external SQL oracle (see ``_base_hash``).
    """
    consts = _permutation_constants(num_hashes, seed)
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_size)).alias("shingle"),
    ).withColumn(
        "h", F.pmod(_base_hash(F.col("shingle"), hash_fn), F.lit(_MERSENNE_P))
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE_P))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(consts)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("minhash"),
    )


def _band_rows(
    signatures: DataFrame, id_col: str, num_bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, band_hash) rows — exactly three narrow columns, so the
    x``num_bands`` explode and the self-join shuffle never carry the
    signature array."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: docs sharing any band hash become candidate pairs.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b; est_jaccard is the
    fraction of equal minhash components (the unbiased Jaccard estimator).
    The band join keys on (band, band_hash) — a self-join on a high-
    cardinality key, shuffle-balanced; the all-pairs explosion inside one
    bucket is bounded by bucket size (near-duplicate cliques).

    Shuffle hygiene: the band rows carry ONLY (id, band, band_hash) — the
    64-long signature array does NOT ride the x``num_bands`` explode or the
    self-join shuffle (that would replicate ~512 bytes x 16 bands x 2 sides
    per doc). The deduplicated candidate id-pairs rejoin ``signatures``
    twice, so each signature crosses the wire once per side of each
    surviving pair, not once per band row.
    """
    bands = _band_rows(signatures, id_col, num_bands, rows_per_band)
    left = bands.alias("l")
    right = bands.alias("r")
    pair_ids = (
        left.join(
            right,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sig = signatures.select(F.col(id_col), F.col("minhash"))
    pairs = pair_ids.join(
        sig.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a")),
        "id_a",
    ).join(
        sig.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b")),
        "id_b",
    )
    est = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.size("mh_a")
    return pairs.select("id_a", "id_b", est.cast("double").alias("est_jaccard"))


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """End-to-end near-dup pairs with est_jaccard >= threshold."""
    rows_per_band = num_hashes // num_bands
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_size, seed, hash_fn
    )
    cands = minhash_lsh_candidates(sig, id_col, num_bands, rows_per_band)
    return cands.where(F.col("est_jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
    stop_shingle_cap: int | None = 10_000,
) -> DataFrame:
    """EXACT Jaccard over shingle sets for pairs sharing >= 1 shingle.

    Posting-list self-join: explode distinct shingles, join on shingle,
    count common shingles per pair, then |A ∪ B| = |A| + |B| − common.

    The self-join is quadratic in posting length, so one viral shingle would
    produce O(n²) pairs. ``stop_shingle_cap`` drops shingles whose posting
    list exceeds the cap BEFORE the join (standard stop-shingle / prefix
    filtering); the Jaccard is then exact over the reduced shingle universe
    (both the intersection AND the set sizes exclude stop shingles — the
    coherent definition). The number of dropped shingles is computed eagerly
    and logged — no silent cap. ``stop_shingle_cap=None`` disables the
    filter (exact over everything, unsafe on adversarial corpora).
    """
    import logging

    shing = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_size).alias("sh")
    )
    posts = shing.select(id_col, F.explode("sh").alias("shingle"))
    if stop_shingle_cap is not None:
        hot = (
            posts.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .where(F.col("df_count") > stop_shingle_cap)
        )
        n_hot = hot.count()
        if n_hot:
            logging.getLogger(__name__).warning(
                "ngram_jaccard: dropping %d stop-shingles with posting length > %d",
                n_hot, stop_shingle_cap,
            )
            posts = posts.join(
                F.broadcast(hot.select("shingle")), "shingle", "left_anti"
            )
    # sizes from the (possibly filtered) postings: shingles are distinct per
    # doc, so a count per id equals the reduced-universe set size
    sizes = posts.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    l, r = posts.alias("l"), posts.alias("r")
    common = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).cast("double").alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold)


def decontamination_pairs(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check: which train docs CONTAIN a bench doc.

    Asymmetric n-gram containment ``|S(train) ∩ S(bench)| / |S(bench)|`` —
    the standard decontamination measure from the published GPT-3/PaLM
    procedures (a long training document contains a short benchmark item
    outright even though symmetric Jaccard against it would be tiny).
    Output: (train_id, bench_id, n_common, bench_total, containment) for
    pairs whose rounded containment meets ``threshold``.

    Scale plan: the benchmark side is small BY CONSTRUCTION (eval sets are
    thousands of rows; train is the 100-TB side), so its exploded shingle
    postings — carrying the per-doc set size, avoiding a second join — are
    broadcast. ONE streaming scan of train feeds a broadcast hash join on
    shingle; only genuinely matching (train, bench, shingle) rows exist
    after the join, so the shuffle into the pair aggregation moves matched
    shingles only, never an all-pairs frame. The denominator is
    bench-only, so no train-side set sizes (and no second train scan) are
    needed. Shingles are distinct per doc on both sides (word_shingles),
    so the join emits each common shingle exactly once per pair.

    Reference analogue: none (the reference has no dedup surface); this
    extends the LLM-pipeline operator family alongside ngram_jaccard_pairs.
    """
    # NULL or empty text fabricates one '' shingle, and WHITESPACE-ONLY
    # text fabricates a space-joined-empties shingle like ' ' (word_grams
    # docstring); without this filter every such bench doc "contains"
    # every such train doc at containment 1.0 — scrape failures would read
    # as contamination. Dropping whitespace-only shingles (trim == '')
    # removes such docs from both sides (explode of the emptied array
    # emits nothing) and keeps bench_total consistent with the filtered
    # set. Real shingles always contain non-space characters, so trim
    # never touches them.
    # Hash-keyed postings (word_shingle_hashes): the whitespace-only
    # filter folds into the hash builder, the join key is 8 bytes instead
    # of a shingle string, and no shingle strings are ever materialized —
    # n_common / bench_total / containment are unchanged (hash equality
    # stands in for string equality at the repo-wide xxhash64 collision
    # tolerance; the DuckDB oracle replays raw-string containment and
    # must agree).
    clean = word_shingle_hashes(F.col(text_col), shingle_size)
    # widen both sides before the CPU-heavy shingle build: a 1-2 split
    # input serializes the explode (train) and the broadcast build (bench)
    # on 1-2 cores (guide §2.5; measured 2.8s single-pair bench-side stage
    # at sf1.0). No-op at real corpus scale.
    from .text import widen_narrow_input as _widen_input

    t_posts = _widen_input(train_df).select(
        F.col(id_col).alias("train_id"),
        F.explode(clean).alias("shingle"),
    )
    b_posts = _widen_input(bench_df).select(
        F.col(id_col).alias("bench_id"),
        clean.alias("sh"),
    ).select(
        "bench_id",
        F.size("sh").cast("long").alias("bench_total"),
        F.explode("sh").alias("shingle"),
    )
    return (
        t_posts.join(F.broadcast(b_posts), "shingle")
        .groupBy("train_id", "bench_id", "bench_total")
        .agg(F.count(F.lit(1)).alias("n_common"))
        # round BEFORE thresholding so an oracle replaying the same rounded
        # arithmetic can never disagree at the threshold boundary
        .withColumn(
            "containment", F.round(F.col("n_common") / F.col("bench_total"), 6)
        )
        .where(F.col("containment") >= threshold)
        .select("train_id", "bench_id", "n_common", "bench_total", "containment")
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``bits``-bit SimHash per document: majority vote of word-hash bits.

    For each bit position b, sum +1/−1 votes of hash(word) bit b over all
    words; the signature bit is 1 iff the sum is positive. All bit math is
    shiftright/&/sum column expressions — one explode + one aggregate.
    ``hash_fn='md5_60'`` (use with ``bits<=60``) makes the signatures
    reproducible by an external SQL oracle (see ``_base_hash``).
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
    ).withColumn("h", _base_hash(F.col("w"), hash_fn))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = words.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"v_{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidates(
    signatures: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: split the 64-bit signature into ``n_chunks`` 16-bit
    chunks; any pair within ``max_hamming < n_chunks`` must agree on at least
    one chunk, so the candidate join keys on (chunk_idx, chunk_value) and the
    exact hamming check runs only on candidates (bit_count(xor)).
    """
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    l, r = chunks.alias("l"), chunks.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def _embedding_lsh_candidates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int = 16,
    planes_per_table: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs from banded random-hyperplane LSH (OR of AND-tables).

    Banded OR-construction, exactly like the MinHash banding above: each of
    ``n_tables`` hash tables holds a ``planes_per_table``-bit sign signature;
    a pair is a candidate iff it collides in AT LEAST ONE table. Collision
    probability for cosine similarity s: 1 − (1 − p^r)^b with
    p = 1 − θ(s)/π, r = planes_per_table, b = n_tables — at the 0.95-cosine
    target the 16x16 default gives ≈0.96 recall (vs ≈0.18 for a single
    AND-only 16-plane signature) while near-orthogonal pairs collide at only
    b·0.5^r ≈ 2.4e-4, keeping candidate volume near the true-pair count.

    Signatures are computed in ONE Arrow-batched pandas UDF (a (batch x dim)
    @ (dim x b*r) matmul + bit packing) instead of b*r per-plane JVM
    aggregate-lambdas; the candidate join keys on (table, signature) — a
    self-equi-join on a high-cardinality key, shuffle-balanced.
    """
    from pyspark.sql.functions import pandas_udf

    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return df.sparkSession.createDataFrame(
            [], f"id_a string, id_b string"
        )
    dim = int(dim_row["d"])
    n_planes = n_tables * planes_per_table
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_planes))
    weights = (1 << np.arange(planes_per_table, dtype=np.int64))

    @pandas_udf("array<long>")
    def table_sigs(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (mat @ planes) > 0                          # (batch, n_planes)
        packed = (
            bits.reshape(len(mat), n_tables, planes_per_table) @ weights
        )                                                  # (batch, n_tables)
        return pd.Series(list(packed))

    tagged = df.select(
        F.col(id_col),
        F.posexplode(table_sigs(F.col(vec_col).cast("array<double>"))).alias(
            "table", "sig"
        ),
    )
    l, r = tagged.alias("l"), tagged.alias("r")
    return (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_tables: int = 16,
    planes_per_table: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded hyperplane LSH + exact verify.

    Candidates from ``_embedding_lsh_candidates`` (OR-construction — see its
    recall math), then exact cosine over the joined vectors keeps only pairs
    at or above ``threshold``.
    """
    cands = _embedding_lsh_candidates(
        df, id_col, vec_col, n_tables, planes_per_table, seed
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    vecs = df.select(F.col(id_col), F.col(vec_col), norm.alias("norm"))
    va = vecs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_v_a"),
        F.col("norm").alias("_n_a"),
    )
    vb = vecs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_v_b"),
        F.col("norm").alias("_n_b"),
    )
    joined = cands.join(va, "id_a").join(vb, "id_b")
    dot = F.aggregate(
        F.zip_with(F.col("_v_a"), F.col("_v_b"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = dot / (F.col("_n_a") * F.col("_n_b"))
    return joined.select(
        "id_a", "id_b", cos.cast("double").alias("cosine")
    ).where(F.col("cosine") >= threshold)
