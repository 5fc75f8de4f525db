"""Salting operators: result parity with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.skew import salted_distinct_count, salted_join


def test_salted_join_matches_plain_join(spark):
    # hot key: 'h' carries 500 of 520 rows
    big = spark.createDataFrame(
        [("h", i) for i in range(500)] + [(f"k{i}", i) for i in range(20)], ["key", "v"]
    )
    small = spark.createDataFrame([("h", "hot"), ("k3", "cold")], ["key", "name"])
    plain = {(r["key"], r["v"], r["name"]) for r in big.join(small, "key").collect()}
    salted = {(r["key"], r["v"], r["name"]) for r in salted_join(big, small, "key").collect()}
    assert salted == plain
    assert len(salted) == 501


def test_salted_distinct_count_exact(spark):
    rows = [("g1", f"u{i % 7}") for i in range(100)] + [("g2", f"u{i}") for i in range(13)]
    df = spark.createDataFrame(rows, ["g", "u"])
    got = {r["g"]: r["distinct_count"] for r in salted_distinct_count(df, "g", "u").collect()}
    expected = {
        r["g"]: r["c"]
        for r in df.groupBy("g").agg(F.count_distinct("u").alias("c")).collect()
    }
    assert got == expected == {"g1": 7, "g2": 13}


def test_salted_join_rejects_small_side_preserving_joins(spark):
    """right/full-outer would emit unmatched small-side REPLICAS as
    duplicate rows — the operator must refuse, not corrupt."""
    import pytest

    from etl_guiacores_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "y")], "k long, w string")
    with pytest.raises(ValueError, match="full"):
        salted_join(big, small, "k", how="full_outer")
    assert salted_join(big, small, "k", how="left").count() == 1


def test_salt_expression_survives_int_min_hash(spark):
    """abs(hash) % n throws ARITHMETIC_OVERFLOW under ANSI when hash
    lands on Int.MIN_VALUE (1-in-2^32 per row — certain at corpus
    scale); the pmod form must map it into [0, salt). Exercised by
    substituting the hash output with the literal boundary value."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(-2147483648,), (-1,), (0,), (2147483647,)], "h int")
    out = df.select(F.pmod(F.col("h"), F.lit(16)).alias("s")).collect()
    assert all(0 <= r["s"] < 16 for r in out)


def test_salted_distinct_count_matches_exact(spark):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.skew import salted_distinct_count

    df = spark.createDataFrame(
        [("g1", f"v{i % 7}") for i in range(100)] + [("g2", "only")],
        "k string, x string",
    )
    got = {r["k"]: r["distinct_count"]
           for r in salted_distinct_count(df, "k", "x").collect()}
    assert got == {"g1": 7, "g2": 1}
