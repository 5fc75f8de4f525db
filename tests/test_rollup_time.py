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
