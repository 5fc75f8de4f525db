"""Hash sampling: determinism, rate accuracy, nested-rate subsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.sampling import hash_sample


def test_deterministic_and_rate_accurate(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    s1 = sorted(r["k"] for r in hash_sample(df, "k", 0.25).collect())
    s2 = sorted(r["k"] for r in hash_sample(df, "k", 0.25).collect())
    assert s1 == s2  # re-run identical
    assert 0.22 < len(s1) / 10_000 < 0.28  # close to the rate
    # repartitioning must not change the keep-set
    s3 = sorted(
        r["k"] for r in hash_sample(df.repartition(13), "k", 0.25).collect()
    )
    assert s1 == s3


def test_nested_rates_are_subsets(spark):
    """Threshold monotonicity: a 10% sample is contained in a 50%
    sample — down-sampling an existing mixture is a filter."""
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    small = {r["k"] for r in hash_sample(df, "k", 0.1).collect()}
    big = {r["k"] for r in hash_sample(df, "k", 0.5).collect()}
    assert small <= big


def test_seed_decorrelates(spark):
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, "k", 0.5, seed="a").collect()}
    b = {r["k"] for r in hash_sample(df, "k", 0.5, seed="b").collect()}
    overlap = len(a & b) / max(1, len(a))
    assert 0.3 < overlap < 0.7  # independent-ish, not identical


def test_per_group_rate_column(spark):
    df = spark.range(0, 4_000).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("even")
    )
    rate = F.when(F.col("even"), F.lit(1.0)).otherwise(F.lit(0.0))
    got = hash_sample(df, "k", rate)
    rows = got.collect()
    assert len(rows) == 2_000 and all(r["even"] for r in rows)
