"""Stateful streaming sessionization: the applyInPandasWithState operator
must agree with the batch lag/cumsum oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.queries import _t
from img2dataset_spark.streaming.sessions import (
    sessionize_batch,
    streaming_sessionize,
)

SF = "/root/testdata/sf0.001"


def _canon(rows):
    return sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], round(r["total_value"], 6))
        for r in rows
    )


class TestBatchSessionize:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (1, 1, "2024-01-01 00:00:00", 1.0),
            (1, 2, "2024-01-01 00:10:00", 2.0),   # same session (10m gap)
            (1, 3, "2024-01-01 01:30:00", 3.0),   # new session (80m gap)
            (2, 4, "2024-01-01 00:05:00", 4.0),   # other user
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        got = _canon(sessionize_batch(df, gap_minutes=30).collect())
        assert got == [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2, 3.0),
            (1, "2024-01-01 01:30:00", "2024-01-01 01:30:00", 1, 3.0),
            (2, "2024-01-01 00:05:00", "2024-01-01 00:05:00", 1, 4.0),
        ]


class TestStreamingSessionize:
    @pytest.mark.parametrize("gap_minutes", [30])
    def test_streaming_matches_batch(self, spark, tmp_path, gap_minutes):
        events = _t(spark, SF, "events").select("user_id", "event_id", "ts", "value")
        batch = sessionize_batch(events, gap_minutes)

        src = str(tmp_path / "src")
        events.write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        sessions = streaming_sessionize(stream, gap_minutes, watermark="0 seconds")
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sessions")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.table("t_sessions").collect()
        want = batch.collect()

        # In a finite stream the watermark stops at the global max event
        # time, so a user's LAST session is emitted only if its event-time
        # timeout (end + gap) still fell below that final watermark;
        # earlier sessions are always closed by their successor.
        wm = events.agg(F.max("ts")).collect()[0][0]
        gap = gap_minutes * 60
        want_by_user: dict = {}
        for r in want:
            want_by_user.setdefault(r["user_id"], []).append(r)
        expected = []
        for _, rs in want_by_user.items():
            rs.sort(key=lambda r: r["session_start"])
            expected.extend(rs[:-1])
            last = rs[-1]
            if last["session_end"].timestamp() + gap < wm.timestamp():
                expected.append(last)
        assert _canon(got) == _canon(expected)
        assert len(got) > 0

    def test_duplicate_timestamps_match_batch(self, spark, tmp_path):
        """Equal-ts events must sessionize identically in batch and
        stream: the micro-batch sort uses the same (ts, event_id)
        tie-break as the batch twin's orderBy."""
        rows = [
            # user 1: three events at the SAME instant, then a far event
            (1, 3, "2024-01-01 00:00:00", 1.0),
            (1, 1, "2024-01-01 00:00:00", 2.0),
            (1, 2, "2024-01-01 00:00:00", 4.0),
            (1, 4, "2024-01-01 02:00:00", 8.0),
            # user 2: duplicate ts pair straddling nothing (one session)
            (2, 5, "2024-01-01 00:30:00", 1.5),
            (2, 6, "2024-01-01 00:30:00", 2.5),
            # sentinel far in the future so the watermark passes
            # everyone's end + gap and all sessions flush
            (9, 99, "2024-03-01 00:00:00", 0.0),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, event_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))

        src = str(tmp_path / "src")
        events.write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            streaming_sessionize(stream, 30, watermark="0 seconds")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sessions_dup")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = _canon(spark.table("t_sessions_dup").collect())
        want = _canon(
            sessionize_batch(events, 30).filter("user_id != 9").collect()
        )
        assert got == want
