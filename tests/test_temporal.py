"""As-of join and range join operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from etl_guiacores_spark.operators.temporal import (
    as_of_join,
    event_micros,
    range_join_pairs,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def t(minute):
    return datetime(2024, 1, 1, minute // 60, minute % 60)


class TestAsOfJoin:
    def test_latest_at_or_before(self, spark):
        left = spark.createDataFrame(
            [("u", t(10), 100, 0.0), ("u", t(30), 101, 0.0), ("u", t(5), 102, 0.0)],
            SCHEMA,
        ).select("k", "ts", "event_id")
        right = spark.createDataFrame(
            [("u", t(10), 1, 1.5), ("u", t(20), 2, 2.5), ("w", t(0), 3, 9.9)], SCHEMA
        ).select("k", "ts", "event_id", "v")
        got = {
            r["event_id"]: (r["asof_event_id"], r["asof_v"])
            for r in as_of_join(
                left, right, on="k", right_cols=["event_id", "v"], tie_breaker="event_id"
            ).collect()
        }
        assert got[100] == (1, 1.5)  # inclusive: right at exactly t(10)
        assert got[101] == (2, 2.5)  # latest before t(30)
        assert got[102] == (None, None)  # nothing at-or-before t(5)

    def test_tie_breaker_latest_wins(self, spark):
        left = spark.createDataFrame([("u", t(10), 100, 0.0)], SCHEMA).select(
            "k", "ts", "event_id"
        )
        right = spark.createDataFrame(
            [("u", t(10), 1, 1.0), ("u", t(10), 2, 2.0)], SCHEMA
        ).select("k", "ts", "event_id", "v")
        got = as_of_join(
            left, right, on="k", right_cols=["event_id", "v"], tie_breaker="event_id"
        ).collect()[0]
        assert got["asof_event_id"] == 2 and got["asof_v"] == 2.0


class TestEventMicros:
    def test_ntz_injective_under_any_session_tz(self, spark):
        # DST spring-forward: under America/New_York, cast('timestamp')
        # maps NTZ 02:00 and 03:00 on 2025-03-09 to the SAME instant
        # (07:00Z) — event_micros must keep them 1h apart regardless
        # of the session timezone
        old = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            # SQL casts: string -> NTZ is a pure wall-clock parse
            # (createDataFrame's Python ingestion already collapses
            # the gap before the engine ever sees the value)
            df = spark.sql(
                "SELECT CAST('2025-03-09 02:30:00' AS TIMESTAMP_NTZ) AS ts "
                "UNION ALL SELECT CAST('2025-03-09 03:30:00' AS TIMESTAMP_NTZ)"
            )
            vals = sorted(r[0] for r in df.select(event_micros(df, "ts")).collect())
            assert vals[1] - vals[0] == 3600 * 1_000_000
            # and the values are wall-clock-as-UTC, session tz ignored
            assert vals[0] == 1_741_487_400_000_000
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)

    def test_instant_input_is_unix_micros(self, spark):
        df = spark.createDataFrame([("u", t(1), 1, 0.0)], SCHEMA)
        got = df.select(event_micros(df, "ts")).collect()[0][0]
        # 2024-01-01T00:01:00Z under the UTC test session
        assert got == 1_704_067_260_000_000


class TestRangeJoin:
    def test_band_pairs(self, spark):
        df = spark.createDataFrame(
            [
                ("u", t(0), 1, 0.0),
                ("u", t(1), 2, 0.0),   # 60s from event 1 -> inside band
                ("u", t(3), 3, 0.0),   # 120s from event 2 -> outside
                ("w", t(0), 4, 0.0),   # other key
                ("w", t(1), 5, 0.0),
            ],
            SCHEMA,
        )
        pairs = {
            (r["k"], r["id_a"], r["id_b"])
            for r in range_join_pairs(df, "k", "ts", 60, "event_id").collect()
        }
        assert pairs == {("u", 1, 2), ("w", 4, 5)}
