"""Interval merge + coverage (operators/intervals.py)."""

from __future__ import annotations

from etl_guiacores_spark.operators.intervals import (
    interval_coverage,
    merge_intervals,
)


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k long, s long, e long")


def test_overlap_and_touch_merge_into_one_island(spark):
    # [0,10] overlaps [5,20]; [20,30] touches (start == running max end).
    df = _iv(spark, [(1, 0, 10), (1, 5, 20), (1, 20, 30)])
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["island_start"], r["island_end"], r["n_merged"]) == (0, 30, 3)


def test_gap_starts_new_island(spark):
    df = _iv(spark, [(1, 0, 10), (1, 11, 15), (1, 100, 110)])
    out = sorted(
        merge_intervals(df, ["k"], "s", "e").collect(),
        key=lambda r: r["island_start"],
    )
    assert [(r["island_start"], r["island_end"]) for r in out] == [
        (0, 10), (11, 15), (100, 110),
    ]


def test_contained_interval_never_extends(spark):
    # [2,4] is inside [0,10]; a later [5,7] is also inside.
    df = _iv(spark, [(1, 0, 10), (1, 2, 4), (1, 5, 7)])
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    assert (out[0]["island_start"], out[0]["island_end"]) == (0, 10)


def test_coverage_counts_overlap_once(spark):
    df = _iv(
        spark,
        [
            (1, 0, 10), (1, 5, 20),     # island [0,20]  len 20
            (1, 100, 110),              # island [100,110] len 10
            (2, 0, 1),                  # other key untouched
        ],
    )
    got = {
        r["k"]: (r["n_intervals"], r["n_islands"], r["covered"], r["max_island"])
        for r in interval_coverage(df, ["k"], "s", "e").collect()
    }
    assert got[1] == (3, 2, 30, 20)  # naive SUM(dur) would say 35
    assert got[2] == (1, 1, 1, 1)


def test_duplicate_intervals_fold_into_island(spark):
    df = _iv(spark, [(1, 0, 10), (1, 0, 10), (1, 0, 10)])
    got = interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert (got["n_intervals"], got["n_islands"], got["covered"]) == (3, 1, 10)


def test_reserved_column_collision_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 0, 1, 9)], "k long, s long, e long, island long"
    )
    with pytest.raises(ValueError):
        merge_intervals(df, ["k"], "s", "e")
