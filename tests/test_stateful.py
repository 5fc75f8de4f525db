"""Custom stateful operator: streaming sessionizer vs its batch twin.

Emission contract under test: a session row appears only once the
WATERMARK passes its gap horizon (end + gap) — never merely because a
later event opened a new session in the same batch. Until the horizon
clears, a late-but-admissible event may extend the session or bridge
it with a neighbor, and append mode cannot retract rows.
"""

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

BASE_US = 1704067200000000  # 2024-01-01 00:00:00 UTC


def ev(user, minute, value=1.0):
    return (user, datetime(2024, 1, 1, minute // 60, minute % 60), value)


def _start(spark, src, ckpt, name):
    return (
        sessionize_stream(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_sessionizer_emits_only_past_the_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: user 1 builds a session (2 events), user 2 one event
    spark.createDataFrame([ev(1, 0), ev(1, 10, 2.0), ev(2, 5)], SCHEMA) \
        .write.mode("append").parquet(src)
    q = _start(spark, src, str(tmp_path / "ckpt"), "sessions_out")
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) n from sessions_out").collect()[0]["n"] == 0

        # batch 2: user 1 returns after a 50-min gap. The first session
        # is CLOSED by the gap but its horizon (00:40) is ahead of the
        # watermark (still at the epoch floor) — nothing may be emitted
        # yet: a late event could still extend or bridge it.
        spark.createDataFrame([ev(1, 60, 5.0)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert spark.sql("select count(*) n from sessions_out").collect()[0]["n"] == 0

        # batch 3: the event at 03:20 advances the watermark to 01:20
        # (2h delay) — past session 1's horizon (00:40) and user 2's
        # (00:35), so exactly those two flush; [60,80] (horizon 01:50)
        # and the fresh [200,200] are held.
        spark.createDataFrame([ev(1, 80, 1.0), ev(1, 200)], SCHEMA) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {(r["user_id"], r["session_start_us"]): r
                for r in spark.sql("select * from sessions_out").collect()}
        assert set(rows) == {(1, BASE_US), (2, BASE_US + 300 * 1_000_000)}
        first = rows[(1, BASE_US)]
        assert first["n_events"] == 2
        assert first["total_value"] == 3.0
        assert first["session_end_us"] == BASE_US + 600 * 1_000_000
        flushed = rows[(2, BASE_US + 300 * 1_000_000)]
        assert flushed["n_events"] == 1
        assert flushed["session_end_us"] == flushed["session_start_us"]

        # batch 4: watermark jumps to 06:20, clearing both held
        # sessions ([60,80] horizon 01:50, [200,200] horizon 03:50)
        spark.createDataFrame([ev(1, 500)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {(r["user_id"], r["session_start_us"]): r
                for r in spark.sql("select * from sessions_out").collect()}
        assert len(rows) == 4
        second = rows[(1, BASE_US + 3600 * 1_000_000)]
        assert second["n_events"] == 2  # events at :60 and :80
        assert second["total_value"] == 6.0
        assert second["session_end_us"] == BASE_US + 80 * 60 * 1_000_000
        third = rows[(1, BASE_US + 200 * 60 * 1_000_000)]
        assert third["n_events"] == 1
    finally:
        q.stop()


def test_late_event_never_moves_session_bounds_backward(spark, tmp_path):
    """A late-but-within-watermark event delivered in a LATER batch
    extends the held session to the earlier start — one session with
    monotone bounds, not a split or a corrupted end."""
    src = str(tmp_path / "src")
    spark.createDataFrame([ev(1, 60), ev(1, 70, 2.0)], SCHEMA) \
        .write.mode("append").parquet(src)
    q = _start(spark, src, str(tmp_path / "ckpt"), "late_sessions_out")
    try:
        q.processAllAvailable()
        # batch 2: a LATE event 20 min before the session's last event
        # (watermark delay is 2h, so it is accepted; 10 min from the
        # session start — inside the 30 min gap)
        spark.createDataFrame([ev(1, 50, 4.0)], SCHEMA) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        # batches 3-4: a gap splits, then the watermark (04:40) clears
        # both the merged session and the singleton at 200
        spark.createDataFrame([ev(1, 200)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame([ev(1, 400)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql(
            "select * from late_sessions_out order by session_start_us"
        ).collect()
        assert len(rows) == 2
        merged = rows[0]
        assert merged["n_events"] == 3
        assert merged["total_value"] == 7.0
        assert merged["session_start_us"] == BASE_US + 50 * 60 * 1_000_000
        assert merged["session_end_us"] == BASE_US + 70 * 60 * 1_000_000
        assert rows[1]["n_events"] == 1
    finally:
        q.stop()


def test_late_event_bridges_two_held_sessions(spark, tmp_path):
    """The case early emission gets irrevocably wrong: two sessions
    split by an in-batch gap, then a late event lands between them and
    fuses all three into ONE session. Holding gap-closed sessions until
    the watermark passes their horizon makes the bridge possible."""
    src = str(tmp_path / "src")
    # 60-min gap between the two events -> two intervals
    spark.createDataFrame([ev(1, 60), ev(1, 120, 2.0)], SCHEMA) \
        .write.mode("append").parquet(src)
    q = _start(spark, src, str(tmp_path / "ckpt"), "bridge_sessions_out")
    try:
        q.processAllAvailable()
        # late bridging event exactly 30 min from both neighbors
        spark.createDataFrame([ev(1, 90, 4.0)], SCHEMA) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        assert spark.sql(
            "select count(*) n from bridge_sessions_out"
        ).collect()[0]["n"] == 0
        # watermark to 08:00 — far past the merged horizon (02:30)
        spark.createDataFrame([ev(1, 600)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("select * from bridge_sessions_out").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_events"] == 3
        assert r["total_value"] == 7.0
        assert r["session_start_us"] == BASE_US + 60 * 60 * 1_000_000
        assert r["session_end_us"] == BASE_US + 120 * 60 * 1_000_000
    finally:
        q.stop()


def test_randomized_stream_matches_batch_gap_scan(spark, tmp_path):
    """Seeded fuzz: events delivered shuffled across several batches
    (every delivery inside the watermark) must yield EXACTLY the
    sessions a batch gap-scan over the full sorted data computes —
    the reconciliation contract with q32's batch twin, now including
    cross-batch late arrivals and bridges."""
    import random

    rng = random.Random(42)
    events = []
    for uid in (1, 2, 3):
        t = 0
        for _ in range(20):
            t += rng.choice([2, 5, 10, 25, 40, 70])  # minutes; gaps > 30 split
            if t >= 110:  # keep the span < the 2h watermark delay
                break
            events.append((uid, t, float(rng.randint(1, 9))))

    # reference: per-user gap scan over the fully sorted events
    expected = {}
    for uid in (1, 2, 3):
        times = sorted((t, v) for u, t, v in events if u == uid)
        sessions, cur = [], None
        for t, v in times:
            if cur and t - cur["end"] <= 30:
                cur["end"], cur["n"], cur["tot"] = t, cur["n"] + 1, cur["tot"] + v
            else:
                cur = {"start": t, "end": t, "n": 1, "tot": v}
                sessions.append(cur)
        expected[uid] = {
            (s["start"], s["end"], s["n"], round(s["tot"], 2)) for s in sessions
        }

    rng.shuffle(events)
    batches = [events[i::3] for i in range(3)]
    src = str(tmp_path / "src")
    q = None
    try:
        for i, batch in enumerate(batches):
            df = spark.createDataFrame([ev(u, t, v) for u, t, v in batch], SCHEMA)
            df.write.mode("append").parquet(src)
            if q is None:
                q = _start(spark, src, str(tmp_path / "ckpt"), "fuzz_sessions_out")
            q.processAllAvailable()
        # sentinel user pushes the watermark far past every horizon
        spark.createDataFrame([ev(999, 1380)], SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {}
        for r in spark.sql("select * from fuzz_sessions_out").collect():
            if r["user_id"] == 999:
                continue
            got.setdefault(r["user_id"], set()).add((
                (r["session_start_us"] - BASE_US) // 60_000_000,
                (r["session_end_us"] - BASE_US) // 60_000_000,
                r["n_events"],
                round(r["total_value"], 2),
            ))
        assert got == expected
    finally:
        if q is not None:
            q.stop()
