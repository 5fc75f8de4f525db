"""Tiered time rollup: pyramid tiers must equal direct aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.rollup_time import time_rollup
from etl_guiacores_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_every_tier_matches_direct_aggregation(spark):
    e = load_table(spark, "events", SF_DIR)
    tiers = time_rollup(e)
    for res in ("minute", "hour", "day"):
        direct = {
            (r["event_type"], r["bucket"]): (r["n"], round(r["s"], 6))
            for r in e.groupBy(
                "event_type", F.date_trunc(res, "ts").alias("bucket")
            ).agg(F.count("*").alias("n"), F.sum("value").alias("s")).collect()
        }
        tiered = {
            (r["event_type"], r["bucket"]): (r["n_events"], round(r["sum_value"], 6))
            for r in tiers[res].collect()
        }
        assert tiered == direct, f"tier {res} diverges from direct aggregation"


def test_day_tier_much_smaller_than_raw(spark):
    e = load_table(spark, "events", SF_DIR)
    tiers = time_rollup(e)
    assert tiers["day"].count() < e.count() / 5


class TestResampleGapfill:
    def test_gaps_filled_and_ffill(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from etl_guiacores_spark.operators.rollup_time import resample_gapfill

        t = dt.datetime
        tier = spark.createDataFrame(
            [
                ("a", t(2024, 1, 1, 0), 5, 10),
                ("a", t(2024, 1, 1, 3), 2, 30),   # hours 1,2 missing
                ("b", t(2024, 1, 1, 1), 1, 7),
            ],
            "k string, bucket timestamp, n_events long, metric long",
        )
        out = resample_gapfill(
            tier, keys=["k"], step="1 hour",
            zero_cols=("n_events",), ffill_cols=("metric",),
        )
        rows = {(r["k"], r["bucket"].hour): r for r in out.collect()}
        assert len(rows) == 5  # a: 0-3 (4 buckets), b: 1 (1 bucket)
        assert rows[("a", 1)]["n_events"] == 0
        assert rows[("a", 1)]["metric"] == 10       # carried forward
        assert rows[("a", 2)]["metric"] == 10
        assert rows[("a", 3)]["metric"] == 30       # real observation wins
        assert rows[("a", 3)]["n_events"] == 2
        assert rows[("b", 1)]["n_events"] == 1

    def test_single_bucket_key_is_passthrough(self, spark):
        import datetime as dt

        from etl_guiacores_spark.operators.rollup_time import resample_gapfill

        tier = spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1), 3, 9)],
            "k string, bucket timestamp, n_events long, metric long",
        )
        out = resample_gapfill(tier, keys=["k"], ffill_cols=("metric",)).collect()
        assert len(out) == 1 and out[0]["n_events"] == 3 and out[0]["metric"] == 9


class TestEwmaSmooth:
    def _python_truth(self, series, alpha_ppm):
        def trunc_div(n, d):  # Spark `div` / DuckDB `//`: toward zero
            q = abs(n) // d
            return q if n >= 0 else -q

        out, s = [], None
        for v in series:
            s = v if s is None else trunc_div(
                alpha_ppm * v + (1_000_000 - alpha_ppm) * s, 1_000_000
            )
            out.append(s)
        return out

    def test_matches_python_recurrence(self, spark):
        from datetime import datetime, timedelta

        from etl_guiacores_spark.operators.rollup_time import ewma_smooth

        t0 = datetime(2024, 1, 1)
        rows = [
            (k, i, t0 + timedelta(minutes=i), (i * 37 + k * 11) % 500 - 100)
            for k in range(3)
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "k long, eid long, ts timestamp, v long"
        )
        got = ewma_smooth(df, "k", "ts", "v", alpha_ppm=300_000,
                          tiebreak_col="eid")
        by_key: dict[int, list] = {}
        for r in sorted(got.collect(), key=lambda r: (r["k"], r["ts"])):
            by_key.setdefault(r["k"], []).append(r["ewma_micro"])
        for k in range(3):
            series = [(i * 37 + k * 11) % 500 - 100 for i in range(40)]
            assert by_key[k] == self._python_truth(series, 300_000)

    def test_partitioning_invariant_and_tiebreak(self, spark):
        from datetime import datetime

        from etl_guiacores_spark.operators.rollup_time import ewma_smooth

        # all rows share one timestamp: order is the tiebreak alone
        t = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, i, t, i * 10) for i in range(20)],
            "k long, eid long, ts timestamp, v long",
        )
        a = sorted(map(tuple, ewma_smooth(df, "k", "ts", "v",
                                          tiebreak_col="eid").collect()))
        b = sorted(map(tuple, ewma_smooth(df.repartition(7), "k", "ts", "v",
                                          tiebreak_col="eid").collect()))
        assert a == b
        first = [r for r in a if r[2] == 0][0]  # (k, ts, eid, v, s)
        assert first[4] == 0  # s_1 = v_1

    def test_alpha_one_is_identity_and_validation(self, spark):
        from datetime import datetime, timedelta

        import pytest

        from etl_guiacores_spark.operators.rollup_time import ewma_smooth

        t0 = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, i, t0 + timedelta(seconds=i), 7 * i) for i in range(10)],
            "k long, eid long, ts timestamp, v long",
        )
        rows = ewma_smooth(df, "k", "ts", "v", alpha_ppm=1_000_000,
                           tiebreak_col="eid").collect()
        assert all(r["ewma_micro"] == r["v_micro"] for r in rows)
        with pytest.raises(ValueError):
            ewma_smooth(df, "k", "ts", "v", alpha_ppm=0)


class TestEwmaGlobal:
    """ewma_smooth_global: carry-select scan == sequential fold,
    exactly, with no single-reducer stage."""

    def _ref(self, rows, alpha=200_000):
        state, out = None, {}
        a, b = alpha, 1_000_000 - alpha
        for ts, v in sorted(rows):
            if state is None:
                state = v
            else:
                x = a * v + b * state
                state = abs(x) // 1_000_000 * (1 if x >= 0 else -1)  # trunc
            out[ts] = state
        return out

    def test_random_series_all_chunkings(self, spark):
        import random

        from etl_guiacores_spark.operators.rollup_time import ewma_smooth_global

        rng = random.Random(11)
        for case in range(4):
            n = rng.choice([1, 2, 7, 400])
            alpha = rng.choice([50_000, 200_000, 900_000, 1_000_000])
            rows = [
                (i, rng.randint(-2_000_000, 2_000_000)) for i in range(n)
            ]
            df = spark.createDataFrame(rows, "ts long, v long")
            want = self._ref(rows, alpha)
            verified = 0
            for chunks in (1, 5, 16):
                try:
                    got = {
                        r["ts"]: r["ewma_micro"]
                        for r in ewma_smooth_global(
                            df, "ts", "v", alpha_ppm=alpha,
                            num_chunks=chunks, max_candidates=60_000,
                        ).collect()
                    }
                except ValueError as e:
                    # short segments + small alpha legitimately exceed
                    # the speculative-seed gate — loud, not wrong
                    assert "max_candidates" in str(e)
                    continue
                assert got == want, (case, n, alpha, chunks)
                verified += 1
            assert verified >= 1, (case, n, alpha)

    def test_two_million_row_single_series_matches_keyed_fold(self, spark):
        """The verdict criterion: a 1-key 2M-row series — the keyed
        fold serializes it on one reducer, the global operator must
        produce identical output from 32 parallel segments, and its
        returned plan must contain no single-partition stage."""
        from pyspark.sql import functions as F

        from etl_guiacores_spark.operators.rollup_time import (
            ewma_smooth,
            ewma_smooth_global,
        )

        n = 2_000_000
        base = spark.range(n).select(
            F.col("id").alias("ts"),
            (F.xxhash64("id") % 1_000_001).alias("v"),
        )
        keyed = ewma_smooth(
            base.withColumn("k", F.lit(1)), "k", "ts", "v"
        ).select("ts", "ewma_micro")
        glob = ewma_smooth_global(base, "ts", "v", num_chunks=32)

        plan = glob._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        assert "Window" not in plan

        diffs = (
            keyed.alias("a")
            .join(glob.alias("b"), "ts")
            .filter(F.col("a.ewma_micro") != F.col("b.ewma_micro"))
            .count()
        )
        assert diffs == 0
        assert glob.count() == n

    def test_interval_gate_fails_loudly_for_tiny_alpha(self, spark):
        import pytest

        from etl_guiacores_spark.operators.rollup_time import ewma_smooth_global

        rows = [(i, (i * 7919) % 2_000_000 - 1_000_000) for i in range(2000)]
        df = spark.createDataFrame(rows, "ts long, v long")
        with pytest.raises(ValueError, match="max_candidates"):
            ewma_smooth_global(df, "ts", "v", alpha_ppm=2, num_chunks=16)

    def test_tiebreak_and_empty(self, spark):
        from etl_guiacores_spark.operators.rollup_time import (
            ewma_smooth,
            ewma_smooth_global,
        )
        from pyspark.sql import functions as F

        rows = [(5, i, (i * 37) % 1000 - 500) for i in range(200)]
        df = spark.createDataFrame(rows, "ts long, event_id long, v long")
        keyed = ewma_smooth(
            df.withColumn("k", F.lit(0)), "k", "ts", "v", tiebreak_col="event_id"
        )
        glob = ewma_smooth_global(
            df, "ts", "v", tiebreak_col="event_id", num_chunks=8
        )
        want = sorted(
            (r["event_id"], r["ewma_micro"]) for r in keyed.collect()
        )
        got = sorted((r["event_id"], r["ewma_micro"]) for r in glob.collect())
        assert got == want

        empty = ewma_smooth_global(df.limit(0), "ts", "v", tiebreak_col="event_id")
        assert empty.columns == ["ts", "event_id", "v_micro", "ewma_micro"]
        assert empty.count() == 0


class TestOhlcResample:
    def test_bars(self, spark):
        from datetime import datetime

        from etl_guiacores_spark.operators.rollup_time import ohlc_resample

        ts = lambda m: datetime(2024, 1, 1, 10, m)
        rows = [
            (1, ts(5), "x", 10.0),
            (2, ts(1), "x", 7.0),   # earliest -> open
            (3, ts(50), "x", 3.0),  # latest -> close, low
            (4, ts(20), "x", 99.0),  # high
            (5, ts(5), "y", 42.0),
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "event_type", "value"]
        )
        got = {
            r["event_type"]: (
                r["open"], r["high"], r["low"], r["close"], r["n_events"]
            )
            for r in ohlc_resample(df).collect()
        }
        assert got["x"] == (7.0, 99.0, 3.0, 3.0, 4)
        assert got["y"] == (42.0, 42.0, 42.0, 42.0, 1)

    def test_same_ts_tiebreak_on_event_id(self, spark):
        from datetime import datetime

        from etl_guiacores_spark.operators.rollup_time import ohlc_resample

        t0 = datetime(2024, 1, 1, 10, 0)
        df = spark.createDataFrame(
            [(2, t0, "x", 5.0), (1, t0, "x", 8.0)],
            ["event_id", "ts", "event_type", "value"],
        )
        r = ohlc_resample(df).collect()[0]
        assert (r["open"], r["close"]) == (8.0, 5.0)


# --- Holt double-exponential smoothing ---------------------------------------

def _trunc_div(x, y):
    q = abs(x) // abs(y)
    return q if (x >= 0) == (y >= 0) else -q


def _holt_ref(vals, a=200_000, be=100_000):
    b, h = 1_000_000 - a, 1_000_000 - be
    out, l, t = [], None, None
    for v in vals:
        if l is None:
            l, t = v, 0
        else:
            lp = _trunc_div(a * v + b * (l + t), 1_000_000)
            t = _trunc_div(be * (lp - l) + h * t, 1_000_000)
            l = lp
        out.append((l, t))
    return out


def test_holt_matches_sequential_reference_across_blocks(spark):
    import random

    from etl_guiacores_spark.operators.rollup_time import holt_smooth

    random.seed(11)
    # 700 rows > 2 x _EWMA_BLOCK: exercises block-seed chaining; mixed
    # signs exercise truncation-toward-zero on negative trends.
    vals = [random.randint(-500, 2000) for _ in range(700)]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, ts long, v long"
    )
    got = {
        r["ts"]: (r["level_micro"], r["trend_micro"])
        for r in holt_smooth(df, "k", "ts", "v").collect()
    }
    want = _holt_ref(vals)
    assert [got[i] for i in range(len(vals))] == want


def test_holt_tracks_linear_ramp_better_than_ewma(spark):
    from etl_guiacores_spark.operators.rollup_time import (
        ewma_smooth,
        holt_smooth,
    )

    # a pure ramp: EWMA lags by a constant offset, Holt converges on it
    vals = [1000 * i for i in range(300)]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, ts long, v long"
    )
    h_last = (
        holt_smooth(df, "k", "ts", "v").filter("ts = 299").collect()[0]
    )
    e_last = (
        ewma_smooth(df, "k", "ts", "v").filter("ts = 299").collect()[0]
    )
    true_val = vals[299]
    assert abs(h_last["level_micro"] - true_val) < abs(
        e_last["ewma_micro"] - true_val
    )
    assert h_last["trend_micro"] > 0


def test_holt_multiple_keys_and_param_validation(spark):
    import pytest

    from etl_guiacores_spark.operators.rollup_time import holt_smooth

    df = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 20), (2, 0, 5)], "k long, ts long, v long"
    )
    got = {(r["k"], r["ts"]): r["level_micro"]
           for r in holt_smooth(df, "k", "ts", "v").collect()}
    assert got[(1, 0)] == 10 and got[(2, 0)] == 5  # seeds per key
    with pytest.raises(ValueError):
        holt_smooth(df, "k", "ts", "v", alpha_ppm=0)
    with pytest.raises(ValueError):
        holt_smooth(df, "k", "ts", "v", beta_ppm=2_000_000)
