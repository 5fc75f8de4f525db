"""Last-touch attribution + TWAP (funnel/rollup_time round-7 ops)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.funnel import last_touch_attribution
from etl_guiacores_spark.operators.rollup_time import time_weighted_avg

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def ts(minute):
    return datetime(2024, 3, 1) + timedelta(minutes=minute)


class TestLastTouch:
    def test_credit_window_and_orphans(self, spark):
        h25 = 25 * 60
        rows = [
            # user 1: view -> click -> purchase: credit to the CLICK
            (1, ts(0), 1, "view", 0.0),
            (2, ts(10), 1, "click", 0.0),
            (3, ts(20), 1, "purchase", 9.0),
            # user 2: touch 25h before purchase -> outside 24h window
            (4, ts(0), 2, "view", 0.0),
            (5, ts(h25), 2, "purchase", 9.0),
            # user 3: purchase with no touch at all
            (6, ts(5), 3, "purchase", 9.0),
            # user 4: later touch AFTER the purchase must not claim it
            (7, ts(30), 4, "purchase", 9.0),
            (8, ts(40), 4, "click", 0.0),
        ]
        out = {
            r["conversion_id"]: r.asDict()
            for r in last_touch_attribution(
                spark.createDataFrame(rows, SCHEMA),
                "purchase", ["view", "click"],
                window_micros=24 * 3600 * 1_000_000,
            ).collect()
        }
        assert out[3]["touch_id"] == 2 and out[3]["touch_type"] == "click"
        assert out[3]["gap_micros"] == 10 * 60 * 1_000_000
        assert out[5]["touch_id"] is None      # out of window
        assert out[6]["touch_id"] is None      # no touch
        assert out[7]["touch_id"] is None      # only a LATER touch
        assert set(out) == {3, 5, 6, 7}        # one row per conversion

    def test_no_window_means_unbounded_lookback(self, spark):
        rows = [(1, ts(0), 1, "view", 0.0),
                (2, ts(50 * 60), 1, "purchase", 9.0)]
        out = last_touch_attribution(
            spark.createDataFrame(rows, SCHEMA), "purchase", ["view"]
        ).collect()
        assert out[0]["touch_id"] == 1


class TestTwap:
    def test_step_weights_and_bucket_clamp(self, spark):
        rows = [
            # key a, hour 0: v=10 holds :00-:30, v=30 holds :30-:60
            # -> twap 20; plain AVG would also be 20 here, so add a
            # burst: v=30 resampled at :45 (AVG becomes 23.33, TWAP
            # stays 20 because the :30 sample's hold just splits)
            (1, ts(0), 1, "a", 10.0),
            (2, ts(30), 1, "a", 30.0),
            (3, ts(45), 1, "a", 30.0),
            # key b: single event at :15 holds to the bucket end
            (4, ts(15), 1, "b", 7.0),
        ]
        ev = spark.createDataFrame(rows, SCHEMA).select(
            "event_type", "event_id", "ts",
            F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_micro"),
        )
        got = {
            r["event_type"]: r.asDict()
            for r in time_weighted_avg(ev, ["event_type"]).collect()
        }
        assert got["a"]["n_obs"] == 3
        assert got["a"]["span_micros"] == 3600 * 1_000_000
        assert got["a"]["twap_micro"] == 20_000_000
        assert got["b"]["span_micros"] == 45 * 60 * 1_000_000
        assert got["b"]["twap_micro"] == 7_000_000

    def test_pre_epoch_bucket_clamp(self, spark):
        # Pre-epoch (negative-micros) timestamps: Spark's % keeps the
        # dividend's sign, so the old `(__m - __m % dur) + dur` bucket
        # end overshot by one bucket for 1969 data and __dt exceeded
        # the bucket boundary. pmod-based floor bucketing must agree
        # with the F.window-derived bucket_start.
        rows = [
            # 1969-12-31 23:15 — single event holds to the hour end
            (1, datetime(1969, 12, 31, 23, 15), 1, "a", 7.0),
            # 1969-12-31 22:30 and 22:45 in one bucket
            (2, datetime(1969, 12, 31, 22, 30), 1, "b", 10.0),
            (3, datetime(1969, 12, 31, 22, 45), 1, "b", 30.0),
        ]
        ev = spark.createDataFrame(rows, SCHEMA).select(
            "event_type", "event_id", "ts",
            F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_micro"),
        )
        got = {
            r["event_type"]: r.asDict()
            for r in time_weighted_avg(ev, ["event_type"]).collect()
        }
        # key a: holds 23:15 -> 24:00 = 45 min, never past the epoch
        assert got["a"]["span_micros"] == 45 * 60 * 1_000_000
        assert got["a"]["twap_micro"] == 7_000_000
        assert got["a"]["bucket_start"] == datetime(1969, 12, 31, 23, 0)
        # key b: v=10 holds 15 min, v=30 holds 15 min -> twap 20
        assert got["b"]["span_micros"] == 30 * 60 * 1_000_000
        assert got["b"]["twap_micro"] == 20_000_000
        assert got["b"]["bucket_start"] == datetime(1969, 12, 31, 22, 0)

    def test_unsupported_bucket_raises(self, spark):
        import pytest

        ev = spark.createDataFrame([], SCHEMA).select(
            "event_type", "event_id", "ts",
            F.lit(0).cast("long").alias("v_micro"),
        )
        with pytest.raises(ValueError):
            time_weighted_avg(ev, ["event_type"], bucket="7 minutes")


# --- position-based (U-shaped) attribution -----------------------------------

def _ev(spark, rows):
    # (user, event_id, ts_micros, type) with ts as timestamp
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "user_id long, event_id long, tus long, event_type string")
    return df.withColumn("ts", F.timestamp_micros("tus")).drop("tus")


def _credits(spark, rows, window=86_400_000_000):
    from etl_guiacores_spark.operators.funnel import position_attribution

    out = position_attribution(
        _ev(spark, rows), "purchase", ["view", "click"],
        window_micros=window,
    )
    return {r["touch_id"]: r for r in out.collect()}


def test_u_shape_credit_conserves_ppm(spark):
    M = 60_000_000
    rows = [(1, i, i * M, "view") for i in range(1, 6)]   # 5 touches
    rows.append((1, 99, 6 * M, "purchase"))
    got = _credits(spark, rows)
    assert len(got) == 5
    assert got[1]["credit_ppm"] == 400_000                 # first
    assert got[2]["credit_ppm"] == 66_666                  # 200000 div 3
    assert got[3]["credit_ppm"] == 66_666
    assert got[4]["credit_ppm"] == 66_666
    assert got[5]["credit_ppm"] == 400_000 + (200_000 - 3 * 66_666)  # last + remainder
    assert sum(r["credit_ppm"] for r in got.values()) == 1_000_000


def test_single_and_double_touch_splits(spark):
    M = 60_000_000
    rows = [
        (1, 1, 1 * M, "click"), (1, 9, 2 * M, "purchase"),       # n=1
        (2, 2, 1 * M, "view"), (2, 3, 2 * M, "click"),
        (2, 8, 3 * M, "purchase"),                               # n=2
    ]
    got = _credits(spark, rows)
    assert got[1]["credit_ppm"] == 1_000_000
    assert got[2]["credit_ppm"] == 500_000 and got[3]["credit_ppm"] == 500_000


def test_touch_credits_only_next_conversion_within_window(spark):
    M = 60_000_000
    rows = [
        (1, 1, 1 * M, "view"),
        (1, 5, 2 * M, "purchase"),   # touch 1 -> this conversion
        (1, 2, 3 * M, "view"),
        (1, 6, 4 * M, "purchase"),   # touch 2 -> this one
        (1, 3, 5 * M, "view"),       # after last conversion: no credit
    ]
    got = _credits(spark, rows)
    assert got[1]["conversion_id"] == 5
    assert got[2]["conversion_id"] == 6
    assert 3 not in got


def test_out_of_window_touch_gets_nothing(spark):
    rows = [
        (1, 1, 0, "view"),                            # 2 days before
        (1, 2, 2 * 86_400_000_000, "purchase"),
    ]
    got = _credits(spark, rows)
    assert got == {}


def test_position_attribution_reserved_column_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.funnel import position_attribution

    df = _ev(spark, [(1, 1, 0, "view")]).withColumn("pos", F.lit(1))
    with pytest.raises(ValueError):
        position_attribution(df, "purchase", ["view"], 1)
