"""Water-filling budget allocation (operators/mixing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.mixing import waterfill_allocation


def _alloc(spark, rows, budget):
    df = spark.createDataFrame(
        rows, "src string, avail long, weight long"
    ).withColumn("budget", F.lit(budget))
    out = waterfill_allocation(df, "avail", "weight", "budget", "src")
    return {r["src"]: r for r in out.collect()}


def test_no_caps_proportional_split(spark):
    got = _alloc(spark, [("a", 1000, 1), ("b", 1000, 1)], 1000)
    assert got["a"]["alloc"] == 500 and got["b"]["alloc"] == 500
    assert not got["a"]["capped"] and not got["b"]["capped"]


def test_small_source_caps_and_budget_respreads(spark):
    # equal weights, budget 1000: naive split is 500/500 but a has
    # only 100 -> a caps at 100 and b absorbs 900.
    got = _alloc(spark, [("a", 100, 1), ("b", 10_000, 1)], 1000)
    assert got["a"]["capped"] and got["a"]["alloc"] == 100
    assert not got["b"]["capped"] and got["b"]["alloc"] == 900


def test_cascade_of_caps(spark):
    # budget 900, three equal-weight sources 100/200/10_000:
    # round 1 level 300 caps a and b; c absorbs 600.
    got = _alloc(
        spark, [("a", 100, 1), ("b", 200, 1), ("c", 10_000, 1)], 900
    )
    assert got["a"]["alloc"] == 100 and got["a"]["capped"]
    assert got["b"]["alloc"] == 200 and got["b"]["capped"]
    assert got["c"]["alloc"] == 600 and not got["c"]["capped"]


def test_budget_exceeds_capacity_caps_everything(spark):
    got = _alloc(spark, [("a", 10, 1), ("b", 20, 3)], 1000)
    assert all(r["capped"] for r in got.values())
    assert got["a"]["alloc"] == 10 and got["b"]["alloc"] == 20


def test_weights_bias_the_split(spark):
    got = _alloc(spark, [("a", 10_000, 3), ("b", 10_000, 1)], 1000)
    assert got["a"]["alloc"] == 750 and got["b"]["alloc"] == 250


def test_invariants_alloc_within_caps_and_budget(spark):
    rows = [("s%d" % i, (i * 37) % 500 + 1, i % 4 + 1) for i in range(20)]
    got = _alloc(spark, rows, 3000)
    assert all(r["alloc"] <= r["avail"] for r in got.values())
    total = sum(r["alloc"] for r in got.values())
    n_open = sum(1 for r in got.values() if not r["capped"])
    assert total <= 3000 and 3000 - total < max(n_open, 1)
