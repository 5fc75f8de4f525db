"""Custom stateful operator: streaming sessionizer vs its batch twin."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from etl_guiacores_spark.streaming.stateful import sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ev(user, minute, value=1.0):
    return (user, datetime(2024, 1, 1, minute // 60, minute % 60), value)


def test_sessionizer_closes_on_gap_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: user 1 builds a session (2 events), user 2 one event
    spark.createDataFrame([ev(1, 0), ev(1, 10, 2.0), ev(2, 5)], SCHEMA) \
        .write.mode("append").parquet(src)

    q = (
        sessionize_stream(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) n from sessions_out").collect()[0]["n"] == 0

        # batch 2: user 1 returns after a 50-min gap -> first session closes
        spark.createDataFrame([ev(1, 60, 5.0)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("select * from sessions_out").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["user_id"] == 1
        assert r["n_events"] == 2
        assert r["total_value"] == 3.0
        # exact integer-us bounds: 00:00 .. 00:10
        assert r["session_start_us"] == 1704067200000000
        assert r["session_end_us"] == 1704067200000000 + 600 * 1_000_000

        # batch 3: same-session continuation then another gap closes it.
        # The event at 03:20 advances the watermark to 01:20 (2h delay),
        # which passes user 2's timeout horizon (00:05 + 30min) — the
        # event-time timeout flushes their final session and evicts the
        # state (quiet users must not hold store entries forever).
        spark.createDataFrame([ev(1, 80, 1.0), ev(1, 200)], SCHEMA) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {r["session_start_us"]: r for r in spark.sql("select * from sessions_out").collect()}
        assert len(rows) == 3
        second = rows[1704067200000000 + 3600 * 1_000_000]
        assert second["n_events"] == 2  # events at :60 and :80
        assert second["total_value"] == 6.0
        flushed = rows[1704067200000000 + 300 * 1_000_000]  # user 2 @ 00:05
        assert flushed["user_id"] == 2
        assert flushed["n_events"] == 1
        assert flushed["session_end_us"] == flushed["session_start_us"]
    finally:
        q.stop()


def test_late_event_never_moves_session_bounds_backward(spark, tmp_path):
    """A late-but-within-watermark event delivered in a LATER batch
    must extend the open session's bounds monotonically (start=min,
    end=max), not drag last_us backward — regressing it corrupts
    session_end AND the event-time timeout, flushing early and
    splitting one real session in two."""
    src = str(tmp_path / "src")
    spark.createDataFrame([ev(1, 60), ev(1, 70, 2.0)], SCHEMA) \
        .write.mode("append").parquet(src)

    q = (
        sessionize_stream(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("memory")
        .queryName("late_sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event 20 min before the session's last event
        # (watermark delay is 2h, so it is accepted and joins the
        # session — 20 min < the 30 min gap)
        spark.createDataFrame([ev(1, 50, 4.0)], SCHEMA) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        # batch 3: a gap closes the session
        spark.createDataFrame([ev(1, 200)], SCHEMA) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql(
            "select * from late_sessions_out order by session_start_us"
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        base = 1704067200000000
        assert r["n_events"] == 3
        assert r["total_value"] == 7.0
        assert r["session_start_us"] == base + 50 * 60 * 1_000_000
        assert r["session_end_us"] == base + 70 * 60 * 1_000_000
    finally:
        q.stop()
