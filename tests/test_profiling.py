"""Column profiling: counts, cardinality, mergeable checksum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_guiacores_spark.operators.profiling import (
    MERSENNE_61,
    column_profile,
)


def _df(spark):
    rows = [(1, "a"), (2, "b"), (3, None), (4, "a")]
    return spark.createDataFrame(rows, "id long, tag string")


def _render(df):
    return {
        "id": F.col("id").cast("string"),
        "tag": F.col("tag"),
    }


def test_counts_nulls_distincts(spark):
    df = _df(spark)
    got = {r["col_name"]: r for r in column_profile(df, _render(df)).collect()}
    assert got["id"]["n_rows"] == 4
    assert got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 4
    assert got["tag"]["n_null"] == 1
    assert got["tag"]["n_distinct"] == 2  # NULL not a distinct value


def test_checksum_order_insensitive(spark):
    df = _df(spark)
    shuffled = df.orderBy(F.col("tag").desc_nulls_first()).repartition(7)
    a = {r["col_name"]: r["checksum"]
         for r in column_profile(df, _render(df)).collect()}
    b = {r["col_name"]: r["checksum"]
         for r in column_profile(shuffled, _render(shuffled)).collect()}
    assert a == b


def test_checksum_detects_single_value_change(spark):
    df = _df(spark)
    mutated = df.withColumn(
        "tag", F.when(F.col("id") == 2, F.lit("B")).otherwise(F.col("tag"))
    )
    a = {r["col_name"]: r["checksum"]
         for r in column_profile(df, _render(df)).collect()}
    b = {r["col_name"]: r["checksum"]
         for r in column_profile(mutated, _render(mutated)).collect()}
    assert a["tag"] != b["tag"]
    assert a["id"] == b["id"]  # untouched column unchanged


def test_checksum_is_mergeable_modular_sum(spark):
    # checksum(union) == (checksum(a) + checksum(b)) mod M — the
    # property that lets an incremental loader update a stored
    # profile without rescanning history.
    df = _df(spark)
    lo = df.filter("id <= 2")
    hi = df.filter("id > 2")
    full = {r["col_name"]: r["checksum"]
            for r in column_profile(df, _render(df)).collect()}
    a = {r["col_name"]: r["checksum"]
         for r in column_profile(lo, _render(lo)).collect()}
    b = {r["col_name"]: r["checksum"]
         for r in column_profile(hi, _render(hi)).collect()}
    for c in full:
        assert full[c] == (a[c] + b[c]) % MERSENNE_61


def test_empty_rendering_raises(spark):
    with pytest.raises(ValueError):
        column_profile(_df(spark), {})
