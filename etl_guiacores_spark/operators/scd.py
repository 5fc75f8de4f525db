"""Slowly-changing-dimension (type 2) history construction.

The reference's merge-upsert (operators/joins.merge_upsert, reference:
src/extractors/manual_scraper.py:270-290) keeps only the LATEST state
per business. A warehouse that must answer "what did this record look
like on date X" keeps type-2 history instead: one row per version with
a validity interval. This operator builds that history from a change
stream in one pass:

- deduplicate consecutive identical states (optional ``state_cols``:
  a new event that changes nothing does not open a new version),
- per key, ``valid_from`` = the change timestamp and ``valid_to`` =
  the NEXT change's timestamp (LEAD over a key-partitioned window;
  NULL = still current),
- ``is_current`` flags the open interval, ``version_n`` numbers
  versions within a key.

Scale shape: every window is PARTITIONED BY the key — parallel and
AQE-splittable, never a global sort. One shuffle on the key; the
output is the same row count as the (deduplicated) input. This is the
standard Kimball SCD2 loader expressed as a single declarative plan
instead of the row-at-a-time MERGE loop warehouses traditionally run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Build type-2 validity intervals from a change stream.

    ``changes`` holds one row per observed state (key, timestamp,
    state columns). Ordering within a key is the deterministic
    (timestamp, state...) tuple, so same-instant writes produce
    deterministic zero-length intervals rather than an engine-dependent
    order. Consecutive rows whose state columns are all unchanged
    (null-safely) collapse into the earlier version — a change event
    that changes nothing does not open a new version.

    Returns the input columns plus ``valid_from``/``valid_to``
    timestamps (``valid_to`` NULL on the current version),
    ``is_current``, and 1-based ``version_n``.
    """
    state_cols = list(state_cols) if state_cols is not None else [
        c for c in changes.columns if c not in (key_col, ts_col)
    ]
    order = [F.col(ts_col), *[F.col(c) for c in state_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)

    df = changes
    if state_cols:
        # a version boundary is a row whose state differs (null-safely)
        # from the previous row's state
        changed = F.lit(False)
        for c in state_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        df = (
            df.withColumn("__prev_ts", F.lag(ts_col).over(w))
            .withColumn("__changed", F.col("__prev_ts").isNull() | changed)
            .filter(F.col("__changed"))
            .drop("__prev_ts", "__changed")
        )

    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version_n", F.row_number().over(w2).cast("bigint"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Change-data-capture between two snapshots of the same entity
    set: one row per key present in either side, classified
    ``added`` / ``removed`` / ``changed`` (/ ``unchanged``).

    The complement of the versioned sinks (io.write_version /
    write_snapshot): those persist full snapshots cheaply, this turns
    two of them back into a delta — the input a downstream MERGE, an
    incremental re-index, or an audit report wants. Comparison is
    per-column null-safe equality (``<=>``), NOT a row hash: no
    collision risk, no canonical-serialization pitfalls across
    engines, and the plan prunes to exactly key + compared columns.

    Scale shape: one full outer join co-partitioned on the key — the
    only shuffle, elided entirely when both snapshots are bucketed by
    the key (operators/bucketing). Keys must be unique per snapshot
    (a dimension/entity invariant; enforce upstream with
    dedupe_keyed_first). Keys MAY be NULL: the join is null-safe
    (``<=>`` per key column, NULLs shuffle-partition like any value),
    so a NULL-keyed entity present in both snapshots classifies as
    changed/unchanged rather than phantom removed+added, and side
    presence comes from literal marker columns, not key null-ness —
    the same NULL-key discipline as the q88 blocklist anti-join.
    """
    keys = list(key_cols)
    cols = [c for c in compare_cols if c not in keys]
    o = old.select(*keys, *cols, F.lit(True).alias("__in_old")).alias("o")
    n = new.select(*keys, *cols, F.lit(True).alias("__in_new")).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    old_present = F.col("o.__in_old").isNotNull()
    new_present = F.col("n.__in_new").isNotNull()
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(~new_present, F.lit("removed"))
        .when(~old_present, F.lit("added"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
    )
    if include_unchanged:
        return out
    return out.filter(F.col("change_type") != "unchanged")
