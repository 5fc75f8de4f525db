"""Spearman + Gini exact rank statistics (operators/rankstats)."""

from __future__ import annotations

import pytest

from etl_guiacores_spark.operators.rankstats import gini_index, spearman_corr


def _rows(spark, triples):
    return spark.createDataFrame(triples, "g string, x long, i long")


class TestSpearman:
    def test_perfect_monotone_and_reverse(self, spark):
        up = [("u", v * 10, v) for v in range(1, 6)]
        down = [("d", -v * 10, v) for v in range(1, 6)]
        df = spark.createDataFrame(
            [(g, x, i, i) for g, x, i in up + down],
            "g string, x long, y long, i long",
        )
        got = {
            r["g"]: r["rho_ppm"]
            for r in spearman_corr(df, "g", "x", "y", "i").collect()
        }
        assert got["u"] == 1_000_000
        assert got["d"] == -1_000_000

    def test_textbook_value_and_singleton(self, spark):
        # ranks x: 1..5, ranks y permuted (3,1,2,5,4): sum d2 = 4+1+1+1+1 = 8
        # rho = 1 - 48/120 = 0.6 exactly
        pairs = [(1, 3), (2, 1), (3, 2), (4, 5), (5, 4)]
        df = spark.createDataFrame(
            [("t", x, y, x) for x, y in pairs] + [("s", 7, 7, 1)],
            "g string, x long, y long, i long",
        )
        got = {
            r["g"]: (r["n_rows"], r["sum_d2"], r["rho_ppm"])
            for r in spearman_corr(df, "g", "x", "y", "i").collect()
        }
        assert got["t"] == (5, 8, 600_000)
        assert got["s"] == (1, 0, None)  # rho undefined at n < 2


class TestGini:
    def test_uniform_concentrated_degenerate(self, spark):
        rows = [("eq", 5, i) for i in range(1, 5)]          # all equal -> 0
        rows += [("hot", 0, 1), ("hot", 0, 2), ("hot", 0, 3), ("hot", 10, 4)]
        rows += [("zero", 0, 1), ("zero", 0, 2)]            # sum 0 -> NULL
        got = {
            r["g"]: (r["n_rows"], r["total"], r["gini_ppm"])
            for r in gini_index(_rows(spark, rows), "g", "x", "i").collect()
        }
        assert got["eq"] == (4, 20, 0)
        # G = (2*40 - 5*10) / (4*10) = 0.75
        assert got["hot"] == (4, 10, 750_000)
        assert got["zero"] == (2, 0, None)

    def test_negative_raises_in_plan(self, spark):
        df = _rows(spark, [("n", -1, 1), ("n", 3, 2)])
        with pytest.raises(Exception, match="negative"):
            gini_index(df, "g", "x", "i").collect()


# --- quantile normalization --------------------------------------------------

def _qn(spark, rows):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.rankstats import quantile_normalize

    df = spark.createDataFrame(rows, "id long, grp string, v long")
    return quantile_normalize(
        df, ["grp"], "v", F.col("v") * 1000 + F.col("id"),
        out_col="norm",
    )


def test_qn_single_group_is_identity(spark):
    rows = [(i, "a", v) for i, v in enumerate([5, 1, 9, 3, 7])]
    out = {r["id"]: r["norm"] for r in _qn(spark, rows).collect()}
    want = {i: v for i, v in enumerate([5, 1, 9, 3, 7])}
    assert out == want


def test_qn_endpoints_map_to_global_extremes(spark):
    # group a: 1..3 (low), group b: 100..102 (high); each group's min
    # maps to the global min and max to the global max.
    rows = [(1, "a", 1), (2, "a", 2), (3, "a", 3),
            (4, "b", 100), (5, "b", 101), (6, "b", 102)]
    out = {r["id"]: r["norm"] for r in _qn(spark, rows).collect()}
    assert out[1] == 1 and out[4] == 1        # both group minima -> global min
    assert out[3] == 102 and out[6] == 102    # both group maxima -> global max


def test_qn_singleton_group_maps_to_lower_median(spark):
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "s", 999)]
    out = {r["id"]: r["norm"] for r in _qn(spark, rows).collect()}
    # N=4 -> lower median is global rank 2 (value 20)
    assert out[4] == 20


def test_qn_reserved_column_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.rankstats import quantile_normalize

    df = spark.createDataFrame([(1, "a", 1, 0)],
                               "id long, grp string, v long, __qn_key long")
    with pytest.raises(ValueError):
        quantile_normalize(df, ["grp"], "v", F.col("v"))
