"""Streaming exact dedup: first-arrival-wins with watermark-bounded state.

A continuously-ingesting corpus pipeline needs the batch
``dedup.dedup_exact`` semantics on an unbounded stream. The direct
translation (``dropDuplicates`` on the content fingerprint) keeps EVERY
fingerprint in the state store forever — unbounded state, a guaranteed
executor OOM on a 100-TB/day feed. The scale-correct variant bounds
state with an event-time watermark: ``dropDuplicatesWithinWatermark``
suppresses duplicates arriving within the watermark horizon and lets the
state store evict fingerprints older than it. Cross-horizon duplicates
(a re-crawl weeks later) are deliberately out of scope for the stream —
that is the batch dedup's job on the accumulated table; the stream's job
is the high-frequency near-in-time duplicate (retries, mirror posts,
double-ingest), which the horizon covers.

Parity with batch: the fingerprint is the SAME md5(concat_ws(0x1f, ...))
the batch operator groups on, so a streamed corpus and a batch re-dedup
agree on what "identical content" means. Tie-break differs by
construction and is documented: batch keeps min(id), the stream keeps
the FIRST ARRIVAL (the stream cannot see the future minimum).

Reference analogue: none (the reference has no streaming or dedup
surface); this is the streaming twin of operators/dedup.py:dedup_exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP = "_content_fp"


def streaming_dedup_exact(
    stream_df: DataFrame,
    content_cols: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First row per exact content group within the watermark horizon.

    ``ts_col`` must be an event-time timestamp column; rows later than the
    watermark behind the max seen event time may be dropped (standard
    watermark semantics). State is bounded by
    (distinct fingerprints within horizon) x ~48 bytes.
    """
    from aumos_drift_detector_spark.operators.dedup import _content_fp

    fp = _content_fp(content_cols)
    return (
        stream_df.withColumn(_FP, fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([_FP])
        .drop(_FP)
    )
