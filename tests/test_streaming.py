"""Structured Streaming concept-drift tests: file source, availableNow
trigger, memory sink — deterministic, plus cross-batch state persistence
(the stream stops and resumes mid-sequence; results must equal one batch
replay because detector state rides the checkpoint/state store).
"""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aumos_drift_detector_spark.operators.concept import (
    DRIFT,
    AdwinDetector,
    DdmDetector,
    EddmDetector,
    replay_detector,
)
from aumos_drift_detector_spark.streaming.concept_stream import streaming_detector


class TestDetectorStateRoundtrip:
    def test_adwin_dump_load_continues_identically(self):
        vals = list(np.random.default_rng(0).normal(0.1, 0.02, 400)) + [0.9] * 200
        a = AdwinDetector()
        for v in vals[:300]:
            a.update(v)
        b = AdwinDetector.load(json.loads(json.dumps(a.dump())))
        events_a, events_b = [], []
        for i, v in enumerate(vals[300:]):
            a.update(v)
            b.update(v)
            if a.detect() == DRIFT:
                events_a.append(i)
            if b.detect() == DRIFT:
                events_b.append(i)
        assert events_a == events_b and events_a

    def test_ddm_eddm_roundtrip(self):
        for cls, stream in [
            (DdmDetector, [0.0] * 100 + [1.0] * 200),
            (EddmDetector, [1.0 if i % 20 == 0 else 0.0 for i in range(400)] + [1.0] * 200),
        ]:
            a = cls()
            for v in stream[:150]:
                a.update(v)
            b = cls.load(json.loads(json.dumps(a.dump())))
            for v in stream[150:]:
                a.update(v)
                b.update(v)
                assert a.detect() == b.detect()


@pytest.mark.parametrize("detector", ["adwin", "ddm"])
class TestStreamingDetector:
    def _write_chunks(self, spark, base_dir, chunks):
        import os

        os.makedirs(base_dir, exist_ok=True)
        for i, chunk in enumerate(chunks):
            pdf = pd.DataFrame(chunk, columns=["stream_id", "seq", "err"])
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(base_dir)

    def test_stream_matches_batch_replay(self, spark, tmp_path, detector):
        vals = [0.0] * 300 + [1.0] * 300
        rows = [("s", i, float(v)) for i, v in enumerate(vals)]
        src = str(tmp_path / "src")
        self._write_chunks(spark, src, [rows])

        stream = (
            spark.readStream.schema("stream_id string, seq long, err double")
            .parquet(src)
        )
        out = streaming_detector(stream, "stream_id", "seq", "err", detector)
        q = (
            out.writeStream.format("memory")
            .queryName(f"events_{detector}")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql(f"select * from events_{detector}")
            .where(F.col("level") == "drift")
            .toPandas()
        )
        batch = replay_detector(
            spark.createDataFrame(rows, ["stream_id", "seq", "err"]),
            ["stream_id"], "seq", "err", detector,
        ).toPandas()
        batch_drifts = sorted(batch[batch["level"] == "drift"]["seq"].tolist())
        assert sorted(got["seq"].tolist()) == batch_drifts
        assert batch_drifts  # the shift must actually be detected

    def test_state_survives_restart(self, spark, tmp_path, detector):
        """Feed the first half, stop, feed the second half, restart:
        drift events must equal the single uninterrupted replay."""
        vals = [0.0] * 300 + [1.0] * 300
        rows = [("s", i, float(v)) for i, v in enumerate(vals)]
        src = str(tmp_path / "src2")
        ckpt = str(tmp_path / "ckpt2")
        sink = str(tmp_path / "sink2")

        def run_once():
            stream = (
                spark.readStream.schema("stream_id string, seq long, err double")
                .parquet(src)
            )
            out = streaming_detector(stream, "stream_id", "seq", "err", detector)
            # file sink: the only built-in sink that supports checkpoint
            # recovery (memory sink refuses to resume)
            q = (
                out.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        self._write_chunks(spark, src, [rows[:300]])
        run_once()
        self._write_chunks(spark, src, [rows[300:]])
        run_once()
        got = (
            spark.read.parquet(sink)
            .where(F.col("level") == "drift")
            .toPandas()
        )
        batch = replay_detector(
            spark.createDataFrame(rows, ["stream_id", "seq", "err"]),
            ["stream_id"], "seq", "err", detector,
        ).toPandas()
        batch_drifts = sorted(batch[batch["level"] == "drift"]["seq"].tolist())
        assert sorted(got["seq"].tolist()) == batch_drifts


class TestStreamingWindowedDrift:
    def test_windowed_counts_and_drift_verdicts(self, spark, tmp_path):
        import numpy as np
        import pandas as pd
        from datetime import datetime, timedelta

        from aumos_drift_detector_spark.streaming.drift_stream import (
            drift_foreach_batch,
            streaming_binned_counts,
        )

        src = tmp_path / "src"
        src.mkdir()
        t0 = datetime(2026, 1, 1, 0, 0, 0)
        rng = np.random.default_rng(0)
        # window 1: values match the baseline distribution; window 2: shifted
        w1 = pd.DataFrame(
            {
                "ts": [t0 + timedelta(seconds=int(s)) for s in rng.integers(0, 59, 400)],
                "value": rng.uniform(0, 50, 400),
            }
        )
        w2 = pd.DataFrame(
            {
                "ts": [
                    t0 + timedelta(seconds=int(s) + 60)
                    for s in rng.integers(0, 59, 400)
                ],
                "value": rng.uniform(50, 100, 400),  # drifted
            }
        )
        spark.createDataFrame(pd.concat([w1, w2])).write.parquet(str(src / "f1"))

        stream = spark.readStream.schema("ts timestamp, value double").parquet(
            str(src / "*")
        )
        counts = streaming_binned_counts(
            stream, "ts", "value", domain=(0.0, 100.0), n_bins=20,
            window_duration="1 minute",
        )

        baseline = np.zeros(20, dtype=np.int64)
        baseline[:10] = 100  # uniform over [0, 50) like window 1
        got: list = []
        fn = drift_foreach_batch(
            baseline, "js", threshold=0.1, n_bins=20,
            sink=lambda pdf, bid: got.append(pdf),
        )
        q = (
            counts.writeStream.outputMode("update")
            .foreachBatch(fn)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        verdicts = pd.concat(got).sort_values("window_start").reset_index(drop=True)
        assert len(verdicts) == 2
        assert not verdicts.iloc[0]["is_drifted"]   # same distribution
        assert verdicts.iloc[1]["is_drifted"]       # shifted window
        assert verdicts.iloc[0]["n_window"] == 400
        assert verdicts.iloc[1]["n_window"] == 400
        assert (verdicts["test"] == "jensen_shannon").all()

    def test_window_spanning_micro_batches_merges_counts(self, spark, tmp_path):
        """Update mode emits only the touched (window, bin) rows per
        micro-batch; when one window spans several micro-batches the scorer
        must merge cumulative counts across batches, not rebuild the
        histogram from the final partial emission (round-2 advisory)."""
        import numpy as np
        import pandas as pd
        from datetime import datetime, timedelta

        from aumos_drift_detector_spark.streaming.drift_stream import (
            drift_foreach_batch,
            streaming_binned_counts,
        )

        src = tmp_path / "src_mb"
        src.mkdir()
        t0 = datetime(2026, 1, 1, 0, 0, 0)
        rng = np.random.default_rng(3)
        # ONE 1-minute window, written as two files -> two micro-batches
        # under maxFilesPerTrigger=1. First file covers bins [0,25), second
        # covers [25,50): each batch alone is a partial histogram.
        half1 = pd.DataFrame({
            "ts": [t0 + timedelta(seconds=int(s)) for s in rng.integers(0, 59, 200)],
            "value": rng.uniform(0, 25, 200),
        })
        half2 = pd.DataFrame({
            "ts": [t0 + timedelta(seconds=int(s)) for s in rng.integers(0, 59, 200)],
            "value": rng.uniform(25, 50, 200),
        })
        spark.createDataFrame(half1).coalesce(1).write.parquet(str(src / "f1"))
        spark.createDataFrame(half2).coalesce(1).write.parquet(str(src / "f2"))

        stream = (
            spark.readStream.schema("ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        counts = streaming_binned_counts(
            stream, "ts", "value", domain=(0.0, 100.0), n_bins=20,
            window_duration="1 minute",
        )
        baseline = np.zeros(20, dtype=np.int64)
        baseline[:10] = 100  # uniform over [0, 50): matches the FULL window
        got: list = []
        fn = drift_foreach_batch(
            baseline, "js", threshold=0.1, n_bins=20,
            sink=lambda pdf, bid: got.append(pdf),
        )
        q = (
            counts.writeStream.outputMode("update")
            .foreachBatch(fn)
            .option("checkpointLocation", str(tmp_path / "ckpt_mb"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        verdicts = pd.concat(got)
        assert len(got) >= 2, "expected the window to span >1 micro-batch"
        final = verdicts.iloc[-1]
        # merged histogram: all 400 rows across both halves, NOT drifted
        # (each half alone covers only half the baseline's support and
        # would spuriously drift)
        assert final["n_window"] == 400
        assert not final["is_drifted"]


class TestStreamingDedup:
    def test_first_arrival_wins_and_state_bounded(self, spark, tmp_path):
        from aumos_drift_detector_spark.streaming.dedup_stream import (
            streaming_dedup_exact,
        )

        # two micro-batches; 'dup text' appears in both (and twice in the
        # first) — only its first arrival may survive
        rows1 = [
            ("a1", "dup text", "2024-01-01 10:00:00"),
            ("a2", "dup text", "2024-01-01 10:00:05"),
            ("a3", "unique one", "2024-01-01 10:00:10"),
        ]
        rows2 = [
            ("b1", "dup text", "2024-01-01 10:01:00"),
            ("b2", "unique two", "2024-01-01 10:01:05"),
        ]
        src = str(tmp_path / "src")
        import os

        os.makedirs(src, exist_ok=True)
        schema = "doc_id string, text string, ts_s string"
        for chunk in (rows1, rows2):
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
        )
        out = streaming_dedup_exact(stream, ["text"], "ts", "10 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_stream_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from dedup_stream_out").toPandas()
        # one row per distinct content; the duplicate kept is a first
        # arrival (a1 or a2 within the same micro-batch are both "first";
        # Spark keeps exactly one of them, never b1)
        assert len(got) == 3
        texts = sorted(got["text"].tolist())
        assert texts == ["dup text", "unique one", "unique two"]
        assert got[got["text"] == "dup text"]["doc_id"].iloc[0] in {"a1", "a2"}
        # fingerprint helper column must not leak into the output
        assert "_content_fp" not in got.columns
