"""Median/MAD outlier gate: python-truth parity, interpolation
exactness on even groups, MAD degeneracy, validation."""

from __future__ import annotations

import pytest

from etl_guiacores_spark.operators.robust import robust_outliers


def _truth(values, k_milli=3000):
    def med2(xs):  # 2x the interpolated median of ints — exact int
        s = sorted(xs)
        n = len(s)
        return s[n // 2] * 2 if n % 2 else s[n // 2 - 1] + s[n // 2]

    m2 = med2(values)
    dev2 = [abs(2 * v - m2) for v in values]
    m4 = med2(dev2)
    out = []
    for v, d in zip(values, dev2):
        z = (20000 * d * 1000) // (14826 * m4) if m4 > 0 else None
        out.append((v, m2, m4, z, int(20_000_000 * d > k_milli * 14826 * m4)))
    return out


def _run(spark, values, k_milli=3000):
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(values)], "i long, g string, v long"
    )
    rows = robust_outliers(df, "g", "v", k_milli=k_milli).collect()
    by_i = {r["i"]: r for r in rows}
    return [
        (
            by_i[i]["v"],
            by_i[i]["median2"],
            by_i[i]["mad4"],
            by_i[i]["z_milli"],
            by_i[i]["is_outlier"],
        )
        for i in range(len(values))
    ]


def test_matches_python_truth_odd_and_even(spark):
    odd = [10, 12, 11, 9, 1000, 13, 8]  # one wild point
    even = [-50, 3, 7, 7, 9, 400]  # negative + even-n interpolation
    assert _run(spark, odd) == _truth(odd)
    assert _run(spark, even) == _truth(even)


def test_wild_point_flagged_bulk_not(spark):
    values = [100 + (i % 7) for i in range(50)] + [10_000]
    got = _run(spark, values)
    assert got[-1][4] == 1  # the planted outlier
    assert sum(r[4] for r in got[:-1]) == 0  # the bulk passes


def test_mad_degenerate_group(spark):
    # >= 50% identical values => mad4 = 0: z NULL, any deviation gates
    values = [5, 5, 5, 5, 6, 7]
    got = _run(spark, values)
    assert all(r[2] == 0 for r in got)
    assert all(r[3] is None for r in got)
    assert [r[4] for r in got] == [0, 0, 0, 0, 1, 1]


def test_k_widens_gate(spark):
    values = [0, 1, 2, 3, 4, 5, 6, 7, 8, 30]
    strict = _run(spark, values, k_milli=1000)
    loose = _run(spark, values, k_milli=10_000)
    assert sum(r[4] for r in strict) >= sum(r[4] for r in loose)
    with pytest.raises(ValueError):
        _run(spark, values, k_milli=0)


def test_groups_independent(spark):
    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(4)]
        + [(10 + i, "b", v) for i, v in enumerate([1, 2, 3, 4, 1000])],
        "i long, g string, v long",
    )
    rows = robust_outliers(df, "g", "v").collect()
    med_by_g = {(r["g"]): r["median2"] for r in rows}
    assert med_by_g["a"] == 20 and med_by_g["b"] == 6


class TestApproxMode:
    """exact=False: mergeable-sketch percentiles with a rank-tolerance
    contract instead of exactness."""

    def test_rank_tolerance_and_gate_agreement(self, spark):
        from pyspark.sql import functions as F

        from etl_guiacores_spark.operators.robust import robust_outliers

        n = 200_000
        df = spark.range(n).select(
            F.lit("g").alias("grp"),
            # uniform 1-spaced values: rank error translates 1:1 into
            # value error, making the tolerance assertable exactly
            F.col("id").cast("long").alias("v"),
        )
        acc = 10_000
        ex = robust_outliers(df, "grp", "v", exact=True)
        ap = robust_outliers(df, "grp", "v", exact=False, accuracy=acc)

        ex_row = ex.select("median2", "mad4").first()
        ap_row = ap.select("median2", "mad4").first()
        # rank window n/accuracy -> value window (values are 1-spaced;
        # carriers are 2x/4x scaled; +2 slack for the sketch returning
        # an actual sample vs the exact interpolated half)
        tol2 = 2 * (n // acc) + 2
        assert abs(ap_row["median2"] - ex_row["median2"]) <= tol2
        assert abs(ap_row["mad4"] - ex_row["mad4"]) <= 2 * tol2

        # the gate may flip only inside the tolerance band around the
        # threshold; on this data that band is tiny relative to n
        joined = (
            ex.select(F.col("v"), F.col("is_outlier").alias("e"))
            .join(ap.select("v", F.col("is_outlier").alias("a")), "v")
        )
        disagree = joined.filter(F.col("e") != F.col("a")).count()
        assert disagree <= 4 * (n // acc) + 4

    def test_approx_median_is_a_data_value(self, spark):
        from pyspark.sql import functions as F

        from etl_guiacores_spark.operators.robust import robust_outliers

        df = spark.createDataFrame(
            [("g", int(v)) for v in [10, 20, 30, 40, 41]], "grp string, v long"
        )
        row = robust_outliers(df, "grp", "v", exact=False).first()
        assert row["median2"] % 2 == 0
        assert row["median2"] // 2 in {10, 20, 30, 40, 41}


def test_winsorize_matches_python_quantiles(spark):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.robust import winsorize

    vals = [3, -50, 7, 1000, 12, 9, -3, 40, 8, 11, 6, 2]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "grp string, i long, v long"
    )
    rows = {r["i"]: r for r in winsorize(df, "grp", "v").collect()}

    def q16(sorted_vals, t):
        pos = t * (len(sorted_vals) - 1) / 16
        lo, frac = int(pos), pos - int(pos)
        hi = min(lo + 1, len(sorted_vals) - 1)
        return 16 * sorted_vals[lo] + int(
            round(16 * frac * (sorted_vals[hi] - sorted_vals[lo])
        ))

    sv = sorted(vals)
    lo16, hi16 = q16(sv, 1), q16(sv, 15)
    for i, v in enumerate(vals):
        r = rows[i]
        assert (r["lo16"], r["hi16"]) == (lo16, hi16)
        assert r["clamped16"] == min(max(16 * v, lo16), hi16)
        assert r["clipped"] == int(16 * v != r["clamped16"])

    import pytest

    with pytest.raises(ValueError):
        winsorize(df, "grp", "v", tail_sixteenths=8)


def test_quantile_report_exact_sixteenths(spark):
    from etl_guiacores_spark.operators.robust import quantile_report

    df = spark.createDataFrame(
        [("a", v) for v in (10, 20, 30, 40, 50)] + [("b", 7)],
        "g string, v long",
    )
    got = {r["g"]: r.asDict() for r in quantile_report(df, "g", "v").collect()}
    # n=5: rank q*(n-1); p50 -> 30*16, p75 -> 40*16, p15/16 -> rank
    # 3.75 -> 47.5 interpolated, exact as 16x = 760
    assert got["a"]["n_rows"] == 5
    assert (got["a"]["min_micro"], got["a"]["max_micro"]) == (10, 50)
    assert got["a"]["p8_16"] == 480
    assert got["a"]["p12_16"] == 640
    assert got["a"]["p15_16"] == 760
    # singleton group: every percentile is the value itself
    assert got["b"]["p8_16"] == got["b"]["p15_16"] == 7 * 16

    import pytest

    with pytest.raises(ValueError):
        quantile_report(df, "g", "v", sixteenths=(0,))
