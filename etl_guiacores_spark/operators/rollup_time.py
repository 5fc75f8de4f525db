"""Hypertable-style tiered time rollups (continuous aggregates).

Timeseries stores (hypertables) maintain multi-resolution aggregates
where each coarser tier derives from the next finer tier, not from
raw data. The scale property: raw events are aggregated ONCE (at the
finest resolution); every coarser tier re-aggregates the tier below —
hours touch minute rows (60x smaller), days touch hour rows, so the
full pyramid costs barely more than the finest tier alone.

Works because the maintained measures are decomposable aggregates:
count and sum re-aggregate exactly; min/max likewise; avg is derived
as sum/count at read time (never averaged across tiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: resolution -> truncation unit understood by date_trunc
RESOLUTIONS = {"minute": "minute", "hour": "hour", "day": "day"}
_ORDER = ["minute", "hour", "day"]


def _aggregate(
    df: DataFrame,
    bucket_src: str,
    resolution: str,
    keys: list[str],
    from_tier: bool,
) -> DataFrame:
    """Aggregate (raw, or a finer tier when ``from_tier``) into one
    resolution tier. The branch is an EXPLICIT flag — sniffing for a
    column named n_events would silently mis-aggregate a raw events
    table that happens to carry its own n_events metric column."""
    bucket = F.date_trunc(RESOLUTIONS[resolution], F.col(bucket_src)).alias("bucket")
    if from_tier:  # finer tier: re-aggregate partials
        measures = [
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]
    else:  # raw events
        measures = [
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ]
    return df.groupBy(*keys, bucket).agg(*measures)


def time_rollup(
    events: DataFrame,
    keys: list[str] | None = None,
    resolutions: list[str] | None = None,
    time_col: str = "ts",
) -> dict[str, DataFrame]:
    """Build the rollup pyramid: {resolution: aggregate DataFrame}.

    Tiers are chained — each coarser tier aggregates the one below.
    Callers persist each tier (these are the continuous-aggregate
    tables); avg at any tier = sum_value / n_events.
    """
    keys = keys or ["event_type"]
    resolutions = resolutions or _ORDER
    assert resolutions == sorted(resolutions, key=_ORDER.index), "finest first"

    tiers: dict[str, DataFrame] = {}
    current, src_col = events, time_col
    for i, res in enumerate(resolutions):
        current = _aggregate(current, src_col, res, keys, from_tier=i > 0)
        src_col = "bucket"
        tiers[res] = current
    return tiers


def resample_gapfill(
    tier: DataFrame,
    keys: list[str],
    step: str = "1 hour",
    bucket_col: str = "bucket",
    zero_cols: tuple[str, ...] = ("n_events",),
    ffill_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Densify a rollup tier: emit EVERY ``step`` bucket between each
    key's first and last observed bucket, zero-filling count measures
    and forward-filling (last observation carried forward) the
    ``ffill_cols`` — the gap-filling query every time-series store
    bolts onto its continuous aggregates (a dashboard cannot plot a
    gap it never received a row for).

    Scale shape: the spine is ``sequence(min, max, step)`` per key —
    generated WHERE the key lives (one groupBy for the bounds, the
    explode is map-side), never a global calendar cross join; output
    is keys x buckets-in-range, which is the dashboard's own size.
    Forward fill is a key-partitioned running ``last(ignorenulls)``
    window — parallel across keys, no global sort.
    """
    bounds = tier.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {step})")
        ).alias(bucket_col),
    )
    dense = spine.join(tier, [*keys, bucket_col], "left")
    out_cols = []
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in dense.columns:
        if c in keys or c == bucket_col:
            out_cols.append(F.col(c))
        elif c in zero_cols:
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif c in ffill_cols:
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        else:
            out_cols.append(F.col(c))
    return dense.select(*out_cols)


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_micro_col: str,
    alpha_ppm: int = 200_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over event time,
    in exact integer micro-units — the smoothing leg the gap-fill
    (resample_gapfill) and rollup operators don't cover.

    EWMA is inherently sequential (each state depends on the previous
    one: ``s_t = alpha*v_t + (1-alpha)*s_{t-1}``), which windows can't
    express without a per-row shrinking frame. Instead of a Python
    UDF, each key's ordered series folds INSIDE the plan with the
    ``aggregate`` higher-order function over its collected
    (ts, tiebreak, v) structs — JVM-evaluated, zero Python, one
    shuffle on the key. The recurrence is integer fixed point
    (``s_t = (alpha_ppm*v + (1e6-alpha_ppm)*s_prev) div 1e6`` with
    ``s_1 = v_1``), so results are bit-identical across engines,
    retries, and partitionings — a float EWMA drifts with evaluation
    order. Sort order inside a key is (ts, tiebreak): pass a unique
    ``tiebreak_col`` when timestamps can collide, or the fold order —
    and thus the smoothed value — is not total.

    Scale shape: per-key memory is the key's series (the same bound
    as sessionization and grouped top-k via aggregation); right for
    per-entity event streams (hundreds-to-millions of rows per key),
    wrong for one global series — pre-aggregate with time_rollup
    first, or chunk the series and carry the boundary state between
    chunks. Keys parallelize perfectly; AQE splits nothing here since
    the fold is one row per key until the final explode.

    Integer division TRUNCATES toward zero (Spark ``div`` and DuckDB
    ``//`` agree; Python ``//`` floors — negative states differ by at
    most one micro-unit from a floored recurrence, test-pinned).

    Returns one row per input row: (key, ts, [tiebreak], v_micro,
    ewma_micro).
    """
    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    a, b = alpha_ppm, 1_000_000 - alpha_ppm
    fields = [F.col(ts_col).alias("ts")]
    if tiebreak_col is not None:
        fields.append(F.col(tiebreak_col).alias("tb"))
    fields.append(F.col(value_micro_col).cast("long").alias("v"))
    grouped = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(F.struct(*fields))).alias("__arr")
    )
    sarr = F.expr(
        f"aggregate(transform(__arr, x -> x.v), CAST(array() AS ARRAY<BIGINT>), "
        f"(acc, v) -> array_append(acc, CASE WHEN size(acc) = 0 THEN v "
        f"ELSE ({a} * v + {b} * element_at(acc, -1)) div 1000000 END))"
    )
    exploded = grouped.select(
        key_col, F.explode(F.arrays_zip("__arr", sarr.alias("__s"))).alias("__z")
    )
    out = [
        F.col(key_col),
        F.col("__z.__arr.ts").alias(ts_col),
    ]
    if tiebreak_col is not None:
        out.append(F.col("__z.__arr.tb").alias(tiebreak_col))
    out.append(F.col("__z.__arr.v").alias("v_micro"))
    out.append(F.col("__z.__s").alias("ewma_micro"))
    return exploded.select(*out)
