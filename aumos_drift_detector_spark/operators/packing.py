"""Sequence packing: assemble documents into fixed-budget training examples.

LLM pre-training consumes fixed-length contexts; feeding one short document
per context wastes most of the window, so pipelines PACK documents until
the token budget is full (next-fit / first-fit, e.g. the T5 and GPT-NeoX
data loaders). A global greedy pack is inherently sequential, so the
distributed form buckets documents deterministically and packs WITHIN each
bucket — embarrassingly parallel, with packing waste bounded inside each
bucket (the standard large-corpus practice).

Determinism contract (same as operators/sampling.py): the bucket and the
within-bucket order both derive from the portable md5(id|salt) draw, so
reruns, resumes, and other engines reproduce the exact same packs — the
driver contract replays this operator end-to-end in DuckDB with a
recursive-CTE state machine. The contract assumes UNIQUE ids: rows
sharing an id share every ordering key, so their relative pack position
is engine-arbitrary if their sizes differ.

Scale notes: one shuffle on the bucket key; each bucket's rows are packed
in one Arrow batch by a pandas kernel (genuinely sequential semantics —
the one place a UDF is the right tool). Pick ``n_buckets`` so a bucket's
(id, size, hash) rows fit an executor comfortably: rows are ~50 bytes, so
even 10^7-row buckets are sub-GB. Oversize documents (size > budget) get
a pack of their own rather than being dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def next_fit_pack(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    n_buckets: int = 16,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic bucketed next-fit packing.

    Output columns: ``doc_id`` (the id, original dtype), ``size`` (long),
    ``bucket`` (int), ``pack_id`` (string ``BBBB-PPPPPP``), ``pack_pos``
    (long position within the pack). Rows with NULL ``size_col`` are
    excluded (they cannot be budgeted; count them upstream).

    Next-fit keeps ONE open pack per bucket: a document that does not fit
    closes the pack and opens the next. It wastes slightly more than
    first-fit-decreasing but is single-pass, order-deterministic, and
    exactly replayable in SQL — the properties a verifiable pipeline wants.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not (1 <= n_buckets <= 16**8):
        raise ValueError("n_buckets must be in [1, 16^8]")
    h = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)))
    # 8 hex chars = 2^32 distinct values, so n_buckets far beyond 256 still
    # fills every bucket (2 chars would silently cap at 256 non-empty
    # buckets and skew sizes 4x at n_buckets=1024)
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(n_buckets)
    ).cast("int")
    base = df.where(F.col(size_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.col(size_col).cast("long").alias("size"),
        h.alias("_h"),
        bucket.alias("bucket"),
    )
    id_field = base.schema["doc_id"]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("size", T.LongType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("pack_id", T.StringType()),
            T.StructField("pack_pos", T.LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.assign(_ids=pdf["doc_id"].astype(str)).sort_values(
            ["_h", "_ids"], kind="mergesort"
        )
        b = int(pdf["bucket"].iloc[0])
        acc = 0
        idx = 0
        pos = -1
        pack_ids, positions = [], []
        for sz in pdf["size"].to_numpy():
            sz = int(sz)
            if acc > 0 and acc + sz > budget:
                idx += 1
                acc = 0
                pos = -1
            acc += sz
            pos += 1
            pack_ids.append(f"{b:04d}-{idx:06d}")
            positions.append(pos)
        return pdf.assign(pack_id=pack_ids, pack_pos=positions)[
            ["doc_id", "size", "bucket", "pack_id", "pack_pos"]
        ]

    return base.groupBy("bucket").applyInPandas(pack, out_schema)


def pack_utilization(packed: DataFrame, budget: int) -> DataFrame:
    """One-row audit of a packing: packs, docs, fill fraction, oversize."""
    return packed.agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("size") / (F.countDistinct("pack_id") * F.lit(budget)), 6
        ).alias("fill_fraction"),
        F.sum(F.when(F.col("size") > budget, 1).otherwise(0)).alias(
            "n_oversize_docs"
        ),
    )
