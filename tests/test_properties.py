"""Property-based tests for the pure column functions (SURVEY §5.4).

Strategy: generate inputs with hypothesis, evaluate the Column
expressions over one batched DataFrame per property (a Spark action
per example would be prohibitively slow), and assert the invariant
row-wise.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_guiacores_spark.functions import (
    clean_phone_list,
    clean_text,
    normalize_phone,
    split_address,
)

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=60
)


def run_batch(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["y"] for r in df.select(fn(F.col("x")).alias("y")).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_clean_text_idempotent_and_collapsed(spark, values):
    once = run_batch(spark, clean_text, values)
    twice = run_batch(spark, clean_text, [v if v is not None else "" for v in once])
    assert once == twice
    for out in once:
        if out is not None:
            # engine whitespace = Java \s (ASCII); Python's str.strip()
            # is broader (e.g. \x1f), so assert against the engine spec
            assert "  " not in out
            assert not out.startswith(" ") and not out.endswith(" ")


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="0123456789-() +", max_size=20), min_size=1, max_size=20))
def test_normalize_phone_shape(spark, values):
    got = run_batch(spark, normalize_phone, values)
    for raw, out in zip(values, got):
        digits = re.sub(r"\D", "", raw)
        if len(digits) < 10:
            assert out is None
        elif len(digits) == 10:
            assert re.fullmatch(r"\d{3}-\d{4}-\d{3}", out)
        elif len(digits) == 11:
            assert re.fullmatch(r"\d{2}-\d{3}-\d{3}-\d{3}", out)
        else:
            assert out == digits


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="0123456789- ,", max_size=30), min_size=1, max_size=20))
def test_clean_phone_list_idempotent(spark, values):
    once = run_batch(spark, clean_phone_list, values)
    twice = run_batch(spark, clean_phone_list, [v if v is not None else "" for v in once])
    assert once == twice
    for out in once:
        if out is not None:
            parts = out.split(", ")
            assert len(parts) == len(set(parts))  # deduped
            assert all("-" not in p and " " not in p for p in parts)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc 1", min_size=1, max_size=15).filter(
                lambda s: " - " not in s and s.strip()
            ),
            st.text(alphabet="xyz 2", min_size=1, max_size=15).filter(
                lambda s: " - " not in s and s.strip()
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_split_address_round_trip(spark, pairs):
    # direccion + ' - ' + localidad must split back into its parts
    values = [f"{d} - {l}" for d, l in pairs]
    df = spark.createDataFrame([(v,) for v in values], "x string")
    direccion, localidad = split_address(F.col("x"))
    got = df.select(direccion.alias("d"), localidad.alias("l")).collect()
    for (d, l), row in zip(pairs, got):
        assert row["d"] == d
        assert row["l"] == l


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10_000), st.integers(1, 50)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 8),
)
def test_prefix_sum_conservation_and_partition_invariance(spark, rows, parts):
    """global_prefix_sum: the max inclusive total equals the plain SUM,
    offsets are a permutation-free function of (order, value) — the
    same result at any partition count."""
    from etl_guiacores_spark.operators.ordering import global_prefix_sum

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["run"]
        for r in global_prefix_sum(
            df, "k", "v", out_col="run", num_partitions=parts
        ).collect()
    }
    run = 0
    for k, v in sorted(rows):
        run += v
        assert got[k] == run


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 100_000), st.integers(1, 100)),
        min_size=5,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),
)
def test_weighted_sample_partition_invariant(spark, rows, parts):
    """A-Res selection is a pure function of (key, seed, weight):
    repartitioning the input must not change the selected set."""
    from etl_guiacores_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(rows, "k long, w long")
    k = max(1, len(rows) // 2)
    a = {r["k"] for r in weighted_sample_topk(df, "k", "w", k).collect()}
    b = {
        r["k"]
        for r in weighted_sample_topk(df.repartition(parts), "k", "w", k).collect()
    }
    assert a == b and len(a) == min(k, len(rows))


def test_prefix_sum_null_values_and_temp_collisions(spark):
    """exclusive=True start offsets treat NULL values as 0 (the window
    sums already skip them); reserved temp columns are rejected rather
    than silently clobbered."""
    import pytest

    from etl_guiacores_spark.operators.ordering import dense_ids, global_prefix_sum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "k long, v long"
    )
    out = {r["k"]: r["start"] for r in global_prefix_sum(
        df, "k", "v", out_col="start", exclusive=True
    ).collect()}
    # NULL contributes nothing: row 2 starts where row 1 ended, row 3
    # sees only the 10 from row 1
    assert out == {1: 0, 2: 10, 3: 10}

    with pytest.raises(ValueError, match="__lsum"):
        global_prefix_sum(df.withColumn("__lsum", df.v), "k", "v")
    with pytest.raises(ValueError, match="__one"):
        dense_ids(df.withColumn("__one", df.v), "k")
