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


def quantile_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    order_key,
    out_col: str = "normalized",
    num_partitions: int | None = None,
) -> DataFrame:
    """Cross-group quantile normalization: re-express every row's
    value as the GLOBAL value at the same quantile position, so a
    90th-percentile row in any group maps to the global 90th
    percentile. This is the score-calibration step a multi-source
    corpus needs before mixing per-source quality scores — raw
    scores are not comparable across domains (a mid-tier news doc
    and a mid-tier forum doc score differently on the same model),
    but their within-source ranks are.

    ``order_key`` is a Column expression that must be UNIQUE and
    order-isomorphic to ``value_col`` (value with a tiebreak packed
    in, e.g. ``value * 10^10 + id``) — the same pin-a-total-order
    contract as the rest of this module; ties are resolved by the
    tiebreak, making the mapping deterministic across engines.

    Mapping (integer-exact): a row at within-group rank r of m maps
    to global rank ``1 + (r-1)(N-1) // (m-1)`` (endpoints to
    endpoints, interior truncated), singleton groups to the lower
    median ``(N+1) // 2``. The (r-1)(N-1) product runs in
    DECIMAL(38,0) — it wraps BIGINT at ~3B rows.

    Scale shape: one range-exchange for the global ranking
    (operators/ordering.dense_ids — local ranks + broadcast
    partition offsets, no single-reducer stage), one hash exchange
    for the per-group rank window, one equi-join on the looked-up
    global rank. No collects, no UDFs. Per-GROUP skew is a sort
    within partitions, not a shuffle blowup.

    Returns the input columns plus ``out_col`` (the global value at
    the mapped rank).
    """
    from etl_guiacores_spark.operators.ordering import dense_ids

    reserved = {
        "__qn_key", "__grank", "__rs", "__ms", "__num", "__idx", "__n",
        out_col,
    } & set(df.columns)
    if reserved:
        raise ValueError(
            f"quantile_normalize: input columns {sorted(reserved)} "
            "collide with the operator's working/output names — rename "
            "them first"
        )
    base = df.withColumn("__qn_key", order_key)
    ranked = dense_ids(
        base, "__qn_key", id_name="__grank", num_partitions=num_partitions
    )
    total = ranked.agg(F.max("__grank").alias("__n"))
    wg = Window.partitionBy(*group_cols).orderBy("__qn_key")
    wg_all = Window.partitionBy(*group_cols)
    local = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("__rs", F.row_number().over(wg).cast("long"))
        .withColumn("__ms", F.count("*").over(wg_all).cast("long"))
    )
    local = local.withColumn(
        "__num",
        (F.col("__rs") - 1).cast("decimal(38,0)")
        * (F.col("__n") - 1).cast("decimal(38,0)"),
    )
    idx = F.when(
        F.col("__ms") > 1,
        F.expr("CAST(1 + __num div (__ms - 1) AS BIGINT)"),
    ).otherwise(F.expr("(__n + 1) div 2"))
    lookup = ranked.select(
        F.col("__grank").alias("__idx"), F.col(value_col).alias(out_col)
    )
    out_cols = [c for c in df.columns if c != "__qn_key"]
    return (
        local.withColumn("__idx", idx)
        .join(lookup, "__idx")
        .select(*out_cols, out_col)
    )
