"""Event-sequence analytics: ordered funnels, cohort retention, and
CUSUM drift — the product/telemetry queries every event warehouse runs
daily, expressed as chained co-partitioned aggregates (funnel), one
double-bucketed count (cohort), and a closed-form prefix-scan window
(CUSUM). No recursion, no per-row Python, nothing corpus-global.

The CUSUM trick: the clamped recurrence S_t = max(0, S_{t-1} + d_t)
looks inherently sequential, but it has the exact closed form

    S_t = P_t - min(0, min_{j<=t} P_j),   P = prefix sums of d

so a running-sum window plus a running-min window compute it exactly —
integer arithmetic end to end, per-key parallel, no recurrence left in
the plan. (Same family as the EWMA affine-fold elimination, but here
the recurrence disappears entirely instead of folding in-plan.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    window_micros: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel: for each user, the earliest timestamp of
    step k that occurs STRICTLY AFTER their earliest qualifying step
    k-1 (the standard earliest-completion greedy — with no window it
    provably maximizes the number of users counted at every step).
    ``window_micros`` additionally requires the whole chain to finish
    within that span of the step-1 time; the chain is anchored at each
    user's EARLIEST step-1 event (the usual product-analytics
    semantics), so a user who could only complete the funnel starting
    from a later step-1 occurrence is deliberately not counted — the
    unwindowed optimality claim does not extend to this case.

    Shape: k-1 co-partitioned equi-joins on the user key, each fed by
    the events relation FILTERED to that step's type before the join
    (join inputs are step-sized, not corpus-sized) and followed by a
    map-side-combinable min aggregate — never an event self-join,
    never a per-user sort, no collect_list of a user's history. All
    joins and aggregates share the user-key partitioning, so the
    exchanges reuse. Output is one row per step: (step_idx,
    step_name, n_users, conversion_ppm) with conversion measured
    against step 1 in exact integer ppm.
    """
    from etl_guiacores_spark.operators.temporal import event_micros

    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    micros = event_micros(events, time_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(micros).alias("__t1"))
        .withColumn("__t_prev", F.col("__t1"))
    )
    reached = [cur]
    for name in list(steps)[1:]:
        nxt = (
            events.filter(F.col(type_col) == name)
            .join(cur.select(user_col, "__t1", "__t_prev"), user_col)
            .filter(micros > F.col("__t_prev"))
        )
        if window_micros is not None:
            nxt = nxt.filter(micros <= F.col("__t1") + window_micros)
        cur = nxt.groupBy(user_col, "__t1").agg(
            F.min(micros).alias("__t_prev")
        )
        reached.append(cur)
    counts = None
    for i, (name, df) in enumerate(zip(steps, reached), start=1):
        c = df.agg(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(name).alias("step_name"),
            F.count("*").cast("long").alias("n_users"),
        )
        counts = c if counts is None else counts.unionAll(c)
    base = reached[0].agg(F.count("*").cast("long").alias("__n1"))
    return (
        counts.crossJoin(F.broadcast(base))
        .withColumn(
            "conversion_ppm",
            F.when(
                F.col("__n1") > 0,
                F.expr("CAST(n_users * 1000000 div __n1 AS BIGINT)"),
            ),
        )
        .select("step_idx", "step_name", "n_users", "conversion_ppm")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted as retained in each later week they were active. Two
    map-side-combinable aggregates — (user -> first week), then one
    co-partitioned join and a distinct (cohort, offset, user) count.
    The retention matrix itself is bounded (weeks x weeks).

    Returns (cohort_week 'yyyy-MM-dd', week_offset, n_active,
    cohort_size, retention_ppm) — exact integer ppm.
    """
    wk = F.date_trunc("week", F.col(time_col))
    first = (
        events.groupBy(user_col)
        .agg(F.min(wk).alias("__cw"))
    )
    sizes = first.groupBy("__cw").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    active = (
        events.select(user_col, wk.alias("__aw"))
        .distinct()
        .join(first, user_col)
        .withColumn(
            "week_offset",
            F.expr(
                "CAST(datediff(CAST(__aw AS DATE), CAST(__cw AS DATE)) "
                "div 7 AS BIGINT)"
            ),
        )
        .groupBy("__cw", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return (
        active.join(sizes, "__cw")
        .select(
            F.date_format("__cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.expr(
                "CAST(n_active * 1000000 div cohort_size AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


def cusum_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    value_micro: Column | str,
    target_micro: int,
    slack_micro: int,
    threshold_micro: int,
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One-sided CUSUM drift statistic per key in exact integer
    micro-units: S_t = max(0, S_{t-1} + (x_t - target - slack)),
    flagged where S_t > threshold — the classic upward change-point
    monitor (Page 1954) for metric drift.

    The clamped recurrence is eliminated via its closed form
    S_t = P_t - min(0, min_{j<=t} P_j) over prefix sums P of the
    deviations: one running-sum window + one running-min window,
    both key-partitioned and ordered by the (time, tiebreak) total
    order — exact integers, per-key parallel, zero sequential state.

    Returns the input keys + (ts..., cusum_micro, drift_flag).
    """
    dev = (
        (F.col(value_micro) if isinstance(value_micro, str) else value_micro)
        - F.lit(target_micro)
        - F.lit(slack_micro)
    ).cast("long")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        df.withColumn("__p", F.sum(dev).over(w))
        .withColumn("__pmin", F.least(F.lit(0), F.min("__p").over(w)))
        .withColumn(
            "cusum_micro", (F.col("__p") - F.col("__pmin")).cast("long")
        )
        .withColumn("drift_flag", F.col("cusum_micro") > threshold_micro)
    )
    return out.drop("__p", "__pmin")


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    window_micros: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: for every ``conversion_type`` event,
    the LATEST preceding event of a ``touch_types`` kind by the same
    user — the standard credit-assignment query behind every
    conversion report. ``window_micros`` limits how far back a touch
    may be (touches older than the lookback get no credit:
    attributed columns NULL).

    Shape: NO join. Touches and conversions ride ONE key-partitioned
    window — each row carries ``last(touch struct, ignorenulls)`` over
    the (time, tiebreak)-ordered stream per user, so attribution is a
    single shuffle on the user key, then a filter to conversions.
    The merge-streams trick (the as-of-join q47 lesson: an as-of is a
    window over the union, not a range join) — at 100 TB this is one
    exchange of (key, ts, type, id) rows, no build side, no skew-prone
    range condition. "Preceding" is STRICT in the total order: a touch
    at the exact (ts, tiebreak) of the conversion cannot claim it
    (tiebreak ids are unique by contract, so same-ts touch/conversion
    pairs order by id).

    Returns one row per conversion: (user_col, conversion id/ts,
    attributed touch id/type/ts or NULLs, gap_micros or NULL).
    """
    from etl_guiacores_spark.operators.temporal import event_micros

    is_touch = F.col(type_col).isin(list(touch_types))
    ordk = [F.col(time_col), F.col(tiebreak_col)]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*ordk)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # event_micros, not unix_micros: injective for TIMESTAMP_NTZ too
    # (a cast through the session zone collapses DST spring-forward
    # wall times — the as-of/q47 lesson)
    touch_struct = F.when(
        is_touch,
        F.struct(
            F.col(time_col).alias("t"),
            event_micros(events, time_col).alias("m"),
            F.col(tiebreak_col).alias("i"),
            F.col(type_col).alias("k"),
        ),
    )
    base = (
        events.filter(is_touch | (F.col(type_col) == conversion_type))
        .withColumn("__m", event_micros(events, time_col))
        .withColumn(
            "__last_touch", F.last(touch_struct, ignorenulls=True).over(w)
        )
    )
    conv = base.filter(F.col(type_col) == conversion_type)
    gap = (F.col("__m") - F.col("__last_touch.m")).cast("long")
    in_window = (
        F.lit(True)
        if window_micros is None
        else gap <= F.lit(int(window_micros))
    )
    keep = F.col("__last_touch").isNotNull() & in_window
    return conv.select(
        user_col,
        F.col(tiebreak_col).alias("conversion_id"),
        F.col(time_col).alias("conversion_ts"),
        F.when(keep, F.col("__last_touch.i")).alias("touch_id"),
        F.when(keep, F.col("__last_touch.k")).alias("touch_type"),
        F.when(keep, F.col("__last_touch.t")).alias("touch_ts"),
        F.when(keep, gap).alias("gap_micros"),
    )


def position_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    window_micros: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every
    conversion's credit is split across ALL its preceding touches
    inside the lookback — 40% to the first touch, 40% to the last,
    20% spread over the middles — instead of last-touch's
    winner-takes-all. The multi-touch report marketers reconcile
    against last-touch (q147) to see how much credit the funnel's
    top is owed.

    Join-free, the merge-streams shape again but FORWARD: each touch
    row picks up its NEXT conversion via ``first(conversion struct,
    ignorenulls)`` over the strictly-FOLLOWING frame of the same
    user-partitioned (time, tiebreak)-ordered window — so a touch
    credits the conversion that follows it, and a touch after the
    user's last conversion credits nothing. One exchange on the user
    key, then one bounded re-window per (user, conversion) group for
    positions. A touch at the exact (ts, tiebreak) of a conversion
    is NOT attributed (strict order), matching q147's strictness.

    Credit is integer ppm and SUMS TO EXACTLY 1e6 per conversion:
    n=1 -> 1e6; n=2 -> 500000/500000; n>=3 -> first 400000, middles
    ``200000 div (n-2)`` each, last 400000 PLUS the truncation
    remainder ``200000 - (n-2)*mid`` (deterministic, documented —
    conservation is what lets downstream reports reconcile totals).

    Returns one row per attributed touch: (user, conversion_id,
    touch_id, touch_type, pos, n_touches, credit_ppm).
    """
    from etl_guiacores_spark.operators.temporal import event_micros

    reserved = {"__m", "__next", "pos", "n_touches"} & set(events.columns)
    if reserved:
        raise ValueError(
            f"position_attribution: input columns {sorted(reserved)} "
            "collide with the operator's working/output names — rename "
            "them first"
        )
    is_touch = F.col(type_col).isin(list(touch_types))
    is_conv = F.col(type_col) == conversion_type
    w_fwd = (
        Window.partitionBy(user_col)
        .orderBy(time_col, tiebreak_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    conv_struct = F.when(
        is_conv,
        F.struct(
            event_micros(events, time_col).alias("m"),
            F.col(tiebreak_col).alias("i"),
        ),
    )
    touched = (
        events.filter(is_touch | is_conv)
        .withColumn("__m", event_micros(events, time_col))
        .withColumn("__next", F.first(conv_struct, ignorenulls=True).over(w_fwd))
        .filter(
            is_touch
            & F.col("__next").isNotNull()
            & (
                (F.col("__next.m") - F.col("__m"))
                <= F.lit(int(window_micros))
            )
        )
    )
    w_conv = Window.partitionBy(user_col, "__next.i").orderBy(
        time_col, tiebreak_col
    )
    w_conv_all = Window.partitionBy(user_col, "__next.i")
    sized = touched.withColumn(
        "pos", F.row_number().over(w_conv).cast("long")
    ).withColumn("n_touches", F.count("*").over(w_conv_all).cast("long"))
    n, pos = F.col("n_touches"), F.col("pos")
    mid = F.expr("200000 div (n_touches - 2)")
    credit = (
        F.when(n == 1, F.lit(1_000_000))
        .when(n == 2, F.lit(500_000))
        .when(pos == 1, F.lit(400_000))
        .when(
            pos == n,
            F.lit(400_000)
            + (F.lit(200_000) - mid * (n - 2)),
        )
        .otherwise(mid)
    )
    return sized.select(
        F.col(user_col),
        F.col("__next.i").alias("conversion_id"),
        F.col(tiebreak_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
        "pos",
        "n_touches",
        credit.cast("long").alias("credit_ppm"),
    )
