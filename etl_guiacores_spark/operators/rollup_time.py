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

from pyspark.sql import DataFrame
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
