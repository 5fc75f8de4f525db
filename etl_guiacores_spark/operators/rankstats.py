"""Rank-based statistics, integer-exact: Spearman correlation and the
Gini concentration index.

Both are ORDER statistics like the q124/q128/q144 family, but over
RANKS rather than interpolated quantiles — which is exactly what makes
them cross-engine exact: ranks over a TOTAL order are integers, and
both formulas are rational in integer sums, so the usual float-
correlation drift (pearson over doubles is sum-order-dependent) never
enters. The price, as everywhere in this engine, is pinning a total
order: ties are broken by an explicit tiebreak column, making the
statistic "Spearman/Gini over the (value, tiebreak) order" —
deterministic across runs, partitionings, and engines. (Classic
tie-handling assigns AVERAGE ranks; with heavy ties the two
definitions diverge — callers with tie-dominated data should bucket
first. The deterministic variant is the honest distributed contract.)

Scale shape: per-group rank windows (parallel across groups; within a
group a sort — the bounded-group caveat of the percentile family),
then one aggregate. Cross products (n^3 for Spearman's denominator,
rank*value for Gini) run in DECIMAL(38,0)/HUGEINT — n(n^2-1) wraps
BIGINT already at n ~ 2.1M rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation in exact ppm:

        rho = 1 - 6 * sum(d^2) / (n * (n^2 - 1)),  d = rank_x - rank_y

    with both ranks taken over the (value, tiebreak) total order.
    Cross-multiplied to integers: ``rho_ppm = (PPM*n*(n^2-1) -
    6*PPM*sum d^2) div (n*(n^2-1))``, interiors DECIMAL(38,0); NULL
    when n < 2 (rho undefined). The classic non-parametric
    trend/agreement measure — run it as Spearman(value, ts) per key
    and it is a Mann-Kendall-style monotone drift detector.

    Returns (group_col, n_rows, sum_d2, rho_ppm).
    """
    wx = Window.partitionBy(group_col).orderBy(x_col, tiebreak_col)
    wy = Window.partitionBy(group_col).orderBy(y_col, tiebreak_col)
    ranked = df.select(
        group_col,
        F.row_number().over(wx).cast("long").alias("__rx"),
        F.row_number().over(wy).cast("long").alias("__ry"),
    )
    d2 = (F.col("__rx") - F.col("__ry")) * (F.col("__rx") - F.col("__ry"))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(d2).cast("long").alias("sum_d2"),
        )
        .withColumn(
            "rho_ppm",
            F.expr(
                f"CAST((CAST({PPM} AS DECIMAL(38,0)) * n_rows "
                f"* (n_rows * n_rows - 1) - 6 * CAST({PPM} AS DECIMAL(38,0)) "
                f"* sum_d2) div NULLIF(CAST(n_rows AS DECIMAL(38,0)) "
                f"* (n_rows * n_rows - 1), 0) AS BIGINT)"
            ),
        )
    )


def gini_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Gini concentration index in exact ppm over
    non-negative integer values (token counts, byte sizes, spend):

        G = (2 * sum(i * x_(i)) - (n + 1) * sum(x)) / (n * sum(x))

    where x_(i) is the i-th smallest value ((value, tiebreak) total
    order, ranks 1..n). G ~ 0: uniform; G -> 1: one row holds
    everything. The standard inequality audit for corpus balance —
    "is 90% of this source's token mass in 1% of its documents?" —
    and the first number to check before stratified sampling or
    packing. Cross-multiplied to integers (DECIMAL(38,0) interiors;
    ``sum(i*x)`` wraps BIGINT at ~1e9 docs of ~1e4 tokens), NULL when
    sum(x) = 0. Negative inputs raise (Gini is defined on
    non-negative support).

    Returns (group_col, n_rows, total, gini_ppm).
    """
    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    # domain check IN-PLAN (assert_true rides the same scan — an eager
    # driver-side pre-scan would read the corpus twice just to
    # validate a sign)
    checked = F.when(
        F.assert_true(
            F.col(value_col) >= 0,
            F.lit(f"gini_index: negative values in {value_col}"),
        ).isNull(),
        F.col(value_col),
    )
    ranked = df.select(
        group_col,
        checked.cast("long").alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("__x").cast("long").alias("total"),
            F.expr(
                "CAST(sum(CAST(__i AS DECIMAL(38,0)) * __x) "
                "AS DECIMAL(38,0))"
            ).alias("__ix"),
        )
        .withColumn(
            "gini_ppm",
            F.expr(
                f"CAST((2 * __ix - (n_rows + 1) "
                f"* CAST(total AS DECIMAL(38,0))) * {PPM} "
                f"div NULLIF(CAST(n_rows AS DECIMAL(38,0)) * total, 0) "
                f"AS BIGINT)"
            ),
        )
        .drop("__ix")
    )
