"""Interval algebra: merge overlapping spans, per-key coverage.

Time intervals show up all over a training-data pipeline — user
activity spans, crawler lease windows, span-level dedupe output,
audio/video segment annotations — and the two primitive questions are
always the same: which intervals coalesce into one contiguous island,
and how much of the timeline does a key actually cover (as opposed to
the naive SUM of durations, which double-counts overlap). The
reference touches the idea only implicitly (its scrape sessions are
bounded by start/stop timestamps); this module is the general
operator, and the same island machinery already proved itself at the
substring level in ``operators/dedupe.repeated_spans`` (the LAG
interval-merge there is the 1-D special case over character
offsets).

Algorithm — the classical sweep, expressed as two windows so Catalyst
keeps it in one shuffle:

1. Per key, order intervals by (start, end) and take the running
   MAX(end) over all PRECEDING rows. An interval starts a new island
   iff its start exceeds that running max (touching intervals merge:
   coverage is about contiguity, and [a,b)+[b,c) covers [a,c)).
2. The island id is the running SUM of new-island flags — a second
   frame over the same (key, start, end) ordering, so both windows
   share one sort and one hash-partition exchange on the key.
3. GROUP BY (key, island) gives each island's extent; a final
   GROUP BY (key) folds islands into coverage totals.

Scale shape: ONE exchange on the key columns (both window specs and
both aggregations share it — the per-key interval list never moves
twice), map-side-combinable final rollup, no joins, no UDFs. Skewed
keys (one user with millions of intervals) are a sort within one
partition, not a shuffle blowup; AQE's skew handling does not apply
to windows, so the documented mitigation at extreme skew is
pre-bucketing by (key, coarse time bucket) and merging bucket
boundaries with one extra pass — the same pattern as
rollup_time.ewma_smooth's blocked scan.

Determinism: ordering is total ((start, end) within key; equal rows
are interchangeable under MAX/SUM), arithmetic is integer (epoch
microseconds), so output hashes bit-identically across engines,
partitionings, and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching ``[start, end]`` intervals per
    key into maximal islands.

    Returns one row per island: (keys..., island_start, island_end,
    n_merged) with island_start/island_end in the input columns'
    types (intended: integer epoch micros) and ``n_merged`` the
    number of source intervals folded into the island.
    """
    reserved = {"__s", "__e", "__new", "island"} & set(df.columns)
    if reserved - {start_col, end_col}:
        raise ValueError(
            f"merge_intervals: input columns {sorted(reserved)} collide "
            "with the operator's working names — rename them first"
        )
    start, end = F.col(start_col), F.col(end_col)
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy("__s", "__e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.select(
        *keys,
        start.alias("__s"),
        end.alias("__e"),
        F.when(start > F.max(end).over(w_prev), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__new"),
    )
    islands = flagged.withColumn("island", F.sum("__new").over(w_run))
    return islands.groupBy(*keys, "island").agg(
        F.min("__s").alias("island_start"),
        F.max("__e").alias("island_end"),
        F.count("*").cast("long").alias("n_merged"),
    )


def interval_coverage(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key coverage report over the merged islands.

    Returns (keys..., n_intervals, n_islands, covered, max_island)
    where ``covered`` is the union length SUM(island_end -
    island_start) — overlap counted once — and ``max_island`` the
    longest contiguous extent. All integer arithmetic when the
    inputs are integer (epoch micros).
    """
    islands = merge_intervals(df, keys, start_col, end_col)
    length = F.col("island_end") - F.col("island_start")
    return islands.groupBy(*keys).agg(
        F.sum("n_merged").cast("long").alias("n_intervals"),
        F.count("*").cast("long").alias("n_islands"),
        F.sum(length).cast("long").alias("covered"),
        F.max(length).cast("long").alias("max_island"),
    )
