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
