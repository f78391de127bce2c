"""Concept-drift detector tests — ports of the reference concept_drift suites
(/root/reference/tests/unit/concept_drift/test_adwin.py, test_ddm.py) against
the pure-Python detectors, plus Spark applyInPandas replay coverage.
"""

import numpy as np
import pandas as pd
import pytest

from aumos_drift_detector_spark.operators.concept import (
    DRIFT,
    NORMAL,
    WARNING,
    AdwinDetector,
    DdmDetector,
    EddmDetector,
    cusum_change_points,
    cusum_grouped,
    replay_detector,
)


class TestAdwin:
    def test_stable_stream_normal(self):
        # reference test_adwin.py:12-18
        det = AdwinDetector()
        for _ in range(500):
            det.update(0.1)
        assert det.detect() == NORMAL

    def test_abrupt_shift_detected(self):
        # reference test_adwin.py:19-33
        det = AdwinDetector()
        for _ in range(300):
            det.update(0.1)
        detected_at = None
        for i in range(500):
            det.update(0.9)
            if det.detect() == DRIFT:
                detected_at = i
                break
        assert detected_at is not None and detected_at < 500

    def test_window_shrinks_after_drift(self):
        # reference test_adwin.py:34-47
        det = AdwinDetector()
        for _ in range(300):
            det.update(0.1)
        width_before = det.width
        for _ in range(200):
            det.update(0.9)
            if det.detect() == DRIFT:
                break
        assert det.width < width_before + 200

    def test_delta_validation(self):
        # reference test_adwin.py:57-65
        with pytest.raises(ValueError):
            AdwinDetector(delta=0.0)
        with pytest.raises(ValueError):
            AdwinDetector(delta=1.5)

    def test_state_serialisation(self):
        # reference test_adwin.py:76-84
        det = AdwinDetector()
        for v in (0.1, 0.2, 0.3):
            det.update(v)
        state = det.get_state()
        for key in ("detector", "drift_detected", "window_size", "window_mean",
                    "total_updates", "delta"):
            assert key in state
        assert state["window_size"] == 3
        assert state["window_mean"] == pytest.approx(0.2)

    def test_memory_logarithmic(self):
        det = AdwinDetector()
        rng = np.random.default_rng(42)
        for _ in range(5000):
            det.update(float(rng.normal(0.5, 0.05)))
        n_buckets = sum(len(lv) for lv in det._levels)
        assert n_buckets < 80  # O(log n) exponential histogram


class TestDdm:
    def test_stable_normal(self):
        # reference test_ddm.py:16-21
        det = DdmDetector()
        for _ in range(200):
            det.update(0.0)
        assert det.detect() == NORMAL

    def test_drift_detected(self):
        # reference test_ddm.py:23-36
        det = DdmDetector()
        for _ in range(100):
            det.update(0.0)
        seen_drift = False
        for _ in range(300):
            det.update(1.0)
            if det.detect() == DRIFT:
                seen_drift = True
                break
        assert seen_drift

    def test_min_instances_delay(self):
        # reference test_ddm.py:50-57
        det = DdmDetector(min_num_instances=50)
        for _ in range(49):
            det.update(1.0)
        assert det.detect() == NORMAL

    def test_invalid_levels(self):
        with pytest.raises(ValueError):
            DdmDetector(warning_level=3.0, drift_level=2.0)


class TestEddm:
    def test_regular_errors_normal(self):
        # reference test_ddm.py:105-112
        det = EddmDetector()
        for i in range(500):
            det.update(1.0 if i % 10 == 0 else 0.0)
        assert det.detect() in (NORMAL, WARNING)

    def test_clustering_errors_drift(self):
        # reference test_ddm.py:113-127
        det = EddmDetector(min_num_errors=10)
        for i in range(200):
            det.update(1.0 if i % 20 == 0 else 0.0)
        seen = False
        for _ in range(500):
            det.update(1.0)
            if det.detect() == DRIFT:
                seen = True
                break
        assert seen

    def test_invalid_levels(self):
        with pytest.raises(ValueError):
            EddmDetector(warning_level=0.90, drift_level=0.95)


class TestCusum:
    def test_stable_rare_false_positives(self):
        # CUSUM with k=0.5/h=4 has a finite in-control ARL (~170 two-sided),
        # so pure noise CAN fire occasionally; assert the rate is at the
        # theoretical trickle, not a stream of hits
        rng = np.random.default_rng(1)
        scores = rng.normal(0.2, 0.01, 500).tolist()
        assert len(cusum_change_points(scores)) <= 3

    def test_level_shift_detected(self):
        # sustained shift: normalized deviation ~1 on both regimes -> the
        # reference algorithm fires periodically (every ~h/k steps) — assert
        # detection exists and covers the post-shift regime
        rng = np.random.default_rng(2)
        scores = rng.normal(0.2, 0.01, 200).tolist() + rng.normal(0.8, 0.01, 200).tolist()
        hits = cusum_change_points(scores)
        assert hits
        assert any(h >= 200 for h in hits)

    def test_short_series_empty(self):
        assert cusum_change_points([1.0, 2.0, 3.0, 4.0]) == []

    def test_grouped_spark(self, spark):
        rng = np.random.default_rng(3)
        shift = rng.normal(0.1, 0.01, 100).tolist() + rng.normal(0.9, 0.01, 100).tolist()
        flat = rng.normal(0.1, 0.01, 200).tolist()
        rows = [("shift", i, v) for i, v in enumerate(shift)] + [
            ("flat", i, v) for i, v in enumerate(flat)
        ]
        df = spark.createDataFrame(rows, ["monitor", "seq", "score"])
        out = cusum_grouped(df, ["monitor"], "seq", "score").toPandas()
        # distributed replay must equal the driver-side batch function per key
        got_shift = sorted(out[out["monitor"] == "shift"]["seq"].tolist())
        got_flat = sorted(out[out["monitor"] == "flat"]["seq"].tolist())
        assert got_shift == cusum_change_points(shift)
        assert got_flat == cusum_change_points(flat)


class TestSparkReplay:
    def _stream_df(self, spark, streams: dict[str, list[float]]):
        rows = []
        for sid, vals in streams.items():
            rows += [(sid, i, float(v)) for i, v in enumerate(vals)]
        return spark.createDataFrame(rows, ["stream_id", "seq", "error"])

    def test_adwin_replay_parallel_streams(self, spark):
        stable = [0.1] * 500
        shifting = [0.1] * 300 + [0.9] * 400
        df = self._stream_df(spark, {"stable": stable, "shift": shifting})
        out = replay_detector(
            df, ["stream_id"], "seq", "error", "adwin"
        ).toPandas()
        by_stream = dict(tuple(out.groupby("stream_id")))
        assert (by_stream["stable"]["level"] == NORMAL).all()  # terminal row only
        drift_rows = by_stream["shift"][by_stream["shift"]["level"] == DRIFT]
        assert len(drift_rows) >= 1
        assert drift_rows["seq"].min() < 800

    def test_replay_matches_inprocess_loop(self, spark):
        """Distributed replay must equal the sequential in-process loop exactly."""
        rng = np.random.default_rng(7)
        vals = list(rng.normal(0.1, 0.02, 300)) + list(rng.normal(0.7, 0.02, 300))
        det = AdwinDetector()
        expected = []
        for i, v in enumerate(vals):
            det.update(float(v))
            if det.detect() == DRIFT:
                expected.append(i)
        df = self._stream_df(spark, {"s": vals})
        out = replay_detector(df, ["stream_id"], "seq", "error", "adwin").toPandas()
        got = sorted(out[out["level"] == DRIFT]["seq"].tolist())
        assert got == expected

    def test_ddm_replay(self, spark):
        df = self._stream_df(spark, {"s": [0.0] * 100 + [1.0] * 300})
        out = replay_detector(df, ["stream_id"], "seq", "error", "ddm").toPandas()
        assert (out["level"] == DRIFT).any()

    def test_unknown_detector_raises(self, spark):
        df = self._stream_df(spark, {"s": [0.0]})
        with pytest.raises(ValueError, match="unknown detector"):
            replay_detector(df, ["stream_id"], "seq", "error", "bogus")

    def test_unsorted_input_is_sorted_by_seq(self, spark):
        vals = [0.1] * 300 + [0.9] * 300
        rows = [("s", i, v) for i, v in enumerate(vals)]
        rng = np.random.default_rng(0)
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, ["stream_id", "seq", "error"])
        out = replay_detector(df, ["stream_id"], "seq", "error", "adwin").toPandas()
        assert (out["level"] == DRIFT).any()


class TestAdwinOracleParity:
    """The driver-contract ADWIN oracle (__spark_entry__._adwin_sql) must
    match replay_detector on EVERY stream shape — including the terminal
    normal row a driftless or all-NULL stream emits (events_only=True),
    which sf0.01 never exercises because all its streams drift."""

    def test_driftless_and_allnull_streams_match_oracle(self, spark, tmp_path):
        import duckdb

        import __spark_entry__ as entrymod

        rng = np.random.default_rng(11)
        rows = []
        # 'hot': drifts (error rate 0.1 -> 0.9 at midpoint)
        for i in range(400):
            p = 0.1 if i < 200 else 0.9
            rows.append((i, "hot", 20.0 if rng.random() < p else 0.0))
        # 'calm': constant zero-error stream — ADWIN never cuts (any
        # nonzero spike rate can legitimately fire the simplified ADWIN)
        for i in range(400):
            rows.append((i, "calm", 0.0))
        # 'void': every value NULL — detector never updates
        for i in range(50):
            rows.append((i, "void", None))
        pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
        sf_dir = str(tmp_path / "sf")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(sf_dir + "/events.parquet")

        sdf = (
            entrymod._q_adwin_events(spark, sf_dir)
            .toPandas()
            .sort_values(["event_type", "seq"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
        )
        odf = (
            con.sql(entrymod._adwin_sql())
            .df()
            .sort_values(["event_type", "seq"])
            .reset_index(drop=True)
        )
        assert set(sdf["event_type"]) == {"hot", "calm", "void"}
        # terminal rows for the silent streams
        for g, n_upd in [("calm", 400), ("void", 0)]:
            srow = sdf[sdf["event_type"] == g]
            assert len(srow) == 1 and srow.iloc[0]["level"] == "normal", g
            assert srow.iloc[0]["n_updates"] == n_upd, g
        # drift events for the hot stream
        assert (sdf[sdf["event_type"] == "hot"]["level"] == "drift").all()
        assert len(sdf[sdf["event_type"] == "hot"]) >= 1

        assert len(sdf) == len(odf)
        for col in ["event_type", "seq", "level", "window_size", "n_updates"]:
            assert sdf[col].tolist() == odf[col].tolist(), col
        sv, ov = sdf["value"].to_numpy(), odf["value"].to_numpy()
        both_nan = np.isnan(sv) & np.isnan(ov)
        assert np.all(both_nan | (sv == ov))
