"""Streaming concept-drift detection via ``applyInPandasWithState``.

The batch engine replays per-key streams inside one Arrow batch
(operators/concept.replay_detector); this module is the Structured Streaming
twin: each micro-batch updates the per-key detector whose FULL state
(including ADWIN's exponential histogram) persists in the state store between
batches via the detectors' ``dump()/load()`` dicts serialized as JSON.

The reference has no watermark/event-time semantics (SURVEY §2.7) — ordering
is call order. In streaming we preserve intra-key order by sorting each
micro-batch by the sequence column; cross-batch order is the responsibility
of the source (e.g. Kafka per-partition order with key=stream id).

Output mode: append; one row per drift/warning event (plus nothing on silent
batches). GroupStateTimeout is unused — detector state lives for the life of
the stream, matching the reference's process-lifetime detectors.
"""

from __future__ import annotations

import json
import math
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aumos_drift_detector_spark.operators.concept import DETECTORS, NORMAL

STATE_SCHEMA = "state_json STRING"

OUT_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("level", T.StringType()),
        T.StructField("window_size", T.LongType()),
        T.StructField("n_updates", T.LongType()),
    ]
)


def streaming_detector(
    stream_df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    detector: str = "adwin",
    events_only: bool = True,
    **params,
) -> DataFrame:
    """Attach a concept-drift detector to a streaming DataFrame.

    ``stream_df`` must be a streaming DataFrame with (key, order, value)
    columns. Returns a streaming DataFrame of drift events; feed it to
    ``.writeStream`` with a checkpoint dir — the detector state rides the
    query's state store, so restarts resume exactly.
    """
    if detector not in DETECTORS:
        raise ValueError(f"unknown detector {detector!r}; choose {sorted(DETECTORS)}")
    cls = DETECTORS[detector]

    def update_fn(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            det = cls.load(json.loads(state.get[0]))
        else:
            det = cls(**params)
        rows = []
        for pdf in batches:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            for seq, val in zip(pdf[order_col].to_numpy(), pdf[value_col].to_numpy()):
                if val is None or (isinstance(val, float) and math.isnan(val)):
                    continue
                det.update(float(val))
                level = det.detect()
                if not events_only or level != NORMAL:
                    st = det.get_state()
                    rows.append(
                        {
                            "stream_id": str(key[0]),
                            "seq": int(seq),
                            "level": level,
                            "window_size": int(
                                getattr(det, "width", 0) or st.get("n_samples", 0)
                            ),
                            # cumulative over the whole stream (detector state
                            # persists across micro-batches), matching the
                            # batch replay_detector semantics — NOT the
                            # batch-local counter
                            "n_updates": int(
                                st.get("total_updates") or st.get("n_samples") or 0
                            ),
                        }
                    )
        state.update((json.dumps(det.dump()),))
        yield pd.DataFrame(
            rows, columns=["stream_id", "seq", "level", "window_size", "n_updates"]
        )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(order_col).cast("long").alias(order_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
