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
