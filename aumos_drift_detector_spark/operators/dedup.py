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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: a*h stays under 2^62, inside int64 (no overflow
# under ANSI arithmetic); 2^31 hash space is ample for minhash permutations
_MERSENNE_P = (1 << 31) - 1


def exact_duplicates(df: DataFrame, id_col: str, content_cols: Sequence[str]) -> DataFrame:
    """Exact-duplicate groups by content fingerprint (md5 over all content cols).

    Returns (fingerprint, n_copies, doc_ids array, keep_id) — one row per
    duplicate group; ``keep_id`` is the min id (the canonical survivor).
    """
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
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

    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM higher-order fns).

    Documents shorter than n words yield one whole-document shingle so they
    still participate in hashing.
    """
    words = F.split(text, r"\s+")
    k = F.size(words) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


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
) -> DataFrame:
    """(id, minhash array<long>) via one base hash + k affine permutations.

    Classic trick: instead of k independent hash passes over the shingles,
    hash each shingle once (xxhash64) and derive permutation i as
    ``(a_i * h + b_i) mod p`` (p = 2^61-1) — pure column arithmetic, one
    explode, one aggregate.
    """
    consts = _permutation_constants(num_hashes, seed)
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_size)).alias("shingle"),
    ).withColumn("h", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE_P)))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE_P))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(consts)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("minhash"),
    )


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
    """
    bands = signatures.select(
        F.col(id_col),
        F.col("minhash"),
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
    ).select(id_col, "minhash", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))

    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.minhash").alias("mh_a"),
            F.col("r.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
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
) -> DataFrame:
    """End-to-end near-dup pairs with est_jaccard >= threshold."""
    rows_per_band = num_hashes // num_bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size, seed)
    cands = minhash_lsh_candidates(sig, id_col, num_bands, rows_per_band)
    return cands.where(F.col("est_jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard over shingle sets for pairs sharing >= 1 shingle.

    Posting-list self-join: explode distinct shingles, join on shingle,
    count common shingles per pair, then |A ∪ B| = |A| + |B| − common.
    Quadratic in posting length for hot shingles — at scale, drop the
    top-frequency shingles first (stop-shingle filtering), which is the
    standard prefix-filter compromise; log what was dropped.
    """
    shing = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_size).alias("sh")
    )
    sizes = shing.select(id_col, F.size("sh").alias("n_sh"))
    posts = shing.select(id_col, F.explode("sh").alias("shingle"))
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


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document: majority vote of word-hash bits.

    For each bit position b, sum +1/−1 votes of xxhash64(word) bit b over all
    words; the signature bit is 1 iff the sum is positive. All bit math is
    shiftright/&/sum column expressions — one explode + one aggregate.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
    ).withColumn("h", F.xxhash64("w"))
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


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH prefilter.

    Signature = sign bits of <v, r_i> for ``n_planes`` seeded random planes
    (computed as column expressions over a broadcast literal matrix);
    candidates share the full signature; exact cosine verifies. Collision
    probability for cosine similarity s is (1 − θ(s)/π)^n_planes.
    """
    import numpy as np

    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return df.sparkSession.createDataFrame([], "id_a string, id_b string, cosine double")
    dim = dim_row["d"]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))

    # build signature with zip_with against literal arrays
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))

    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    tagged = df.select(
        F.col(id_col), F.col(vec_col), sig.alias("sig"), norm.alias("norm")
    )
    l, r = tagged.alias("l"), tagged.alias("r")
    pairs = l.join(
        r,
        (F.col("l.sig") == F.col("r.sig")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    dot = F.aggregate(
        F.zip_with(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = dot / (F.col("l.norm") * F.col("r.norm"))
    return pairs.select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        cos.cast("double").alias("cosine"),
    ).where(F.col("cosine") >= threshold)
