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


class TestAsOfJoinPropertySweep:
    """Round-4 advice: sweep as_of_join over random instants including
    DST spring-forward/fall-back wall times, on TIMESTAMP, NTZ, and
    mixed sides, under a NON-UTC session timezone, against a
    python-truth as-of."""

    KEYS = ("u", "v", "w")

    def _wall_times(self, rng):
        # a mix of ordinary instants and wall times straddling the
        # 2025 America/New_York transitions (spring 2025-03-09 02:00
        # nonexistent hour; fall 2025-11-02 01:00 ambiguous hour)
        base_days = [(2025, 3, 9), (2025, 11, 2), (2025, 6, 15)]
        out = []
        for _ in range(60):
            y, mo, d = base_days[rng.randrange(3)]
            h, mi, s = rng.randrange(6), rng.randrange(60), rng.randrange(60)
            out.append(f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}")
        return out

    def _df(self, spark, rows, typ, with_val):
        vals = ", ".join(
            f"('{k}', '{ts}', {rid})" for k, ts, rid in rows
        )
        sel = "k, CAST(ts AS {t}) AS ts, rid".format(t=typ)
        if with_val:
            sel += ", rid * 10 AS v"
        return spark.sql(
            f"SELECT {sel} FROM (VALUES {vals}) AS t(k, ts, rid)"
        )

    def _truth(self, left_rows, right_rows, l_micros, r_micros):
        # python as-of: per left row, the right row with the max
        # (micros, rid) among same-key rows at-or-before
        best = {}
        for lk, lts, lrid in left_rows:
            lm = l_micros(lts)
            cands = [
                (r_micros(rts), rrid)
                for rk, rts, rrid in right_rows
                if rk == lk and r_micros(rts) <= lm
            ]
            best[lrid] = max(cands)[1] * 10 if cands else None
        return best

    def _run(self, spark, l_typ, r_typ, l_micros, r_micros, seed):
        import random

        from etl_guiacores_spark.operators.temporal import as_of_join

        rng = random.Random(seed)
        lts, rts = self._wall_times(rng), self._wall_times(rng)
        left_rows = [
            (rng.choice(self.KEYS), ts, 100 + i) for i, ts in enumerate(lts)
        ]
        right_rows = [
            (rng.choice(self.KEYS), ts, i) for i, ts in enumerate(rts)
        ]
        old = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            left = self._df(spark, left_rows, l_typ, with_val=False)
            right = self._df(spark, right_rows, r_typ, with_val=True)
            got = {
                r["rid"]: r["asof_v"]
                for r in as_of_join(
                    left, right, on="k", right_cols=["v"], tie_breaker="rid"
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)
        expect = self._truth(left_rows, right_rows, l_micros, r_micros)
        assert got == expect, f"{l_typ} vs {r_typ} seed={seed}"

    @staticmethod
    def _instant_micros(ts):
        # session-zone parse of a wall-clock literal, exactly as
        # Spark's CAST(string AS TIMESTAMP) under America/New_York:
        # nonexistent spring-forward times shift by the gap, ambiguous
        # fall-back times take the earlier offset (fold=0)
        from datetime import datetime
        from zoneinfo import ZoneInfo

        dt = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=ZoneInfo("America/New_York")
        )
        return int(dt.timestamp() * 1_000_000)

    @staticmethod
    def _wall_micros(ts):
        # NTZ semantics: pure wall-clock micros, no zone consulted
        from datetime import datetime, timezone

        dt = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=timezone.utc
        )
        return int(dt.timestamp() * 1_000_000)

    def test_both_sides_timestamp(self, spark):
        for seed in (7, 8, 9):
            self._run(
                spark, "TIMESTAMP", "TIMESTAMP",
                self._instant_micros, self._instant_micros, seed,
            )

    def test_both_sides_ntz(self, spark):
        for seed in (17, 18, 19):
            self._run(
                spark, "TIMESTAMP_NTZ", "TIMESTAMP_NTZ",
                self._wall_micros, self._wall_micros, seed,
            )

    def test_mixed_instant_left_ntz_right(self, spark):
        # mixed sides: each side maps through ITS OWN injective
        # mapping (the documented contract) — the NTZ side's wall
        # clock is UTC-recorded, the TIMESTAMP side a true instant
        for seed in (27, 28):
            self._run(
                spark, "TIMESTAMP", "TIMESTAMP_NTZ",
                self._instant_micros, self._wall_micros, seed,
            )
