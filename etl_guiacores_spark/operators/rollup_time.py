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
