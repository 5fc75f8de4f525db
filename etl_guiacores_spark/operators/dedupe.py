"""Deduplication operators (SURVEY §2.4, D1-D5).

The reference dedupes with an O(n²) ``if item not in list`` walk
(reference: src/common/data_cleaner.py:29-32) and dict
insert-if-absent during the crawl
(reference: src/extractors/sequential_collector.py:591-594). Here
every variant is a shuffle-based distributed operator:

- exact dedupe       -> hash-aggregate ``dropDuplicates``
- keyed keep-ANY     -> ``dropDuplicates(keys)`` (one shuffle, no sort)
- keyed keep-FIRST   -> ranking window over an explicit order column —
  "first" is undefined under distributed execution without one
  (SURVEY §7 hard part (b))
- dup report         -> single window pass splitting unique/duplicate

Scale note: all of these shuffle on the dedupe key; at 100 TB the key
should be high-cardinality (business id is) and AQE skew-join /
salting handles hot keys. None of them collect to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_exact(df: DataFrame) -> DataFrame:
    """D1 — full-record distinct."""
    return df.dropDuplicates()


def dedupe_keyed(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D4 — keep an arbitrary row per key (cheapest: no ordering)."""
    return df.dropDuplicates(list(keys))


def dedupe_keyed_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """D2 — keep the FIRST row per key under an explicit order.

    reference: src/extractors/sequential_collector.py:591-594 keeps
    first-discovered; distributed keep-first needs the discovery-order
    column made explicit.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def split_duplicates(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """D3 — ``(unique, duplicates)`` split with one window pass.

    reference: src/common/utils.py:48-62 returns both lists so callers
    can report dup counts.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.filter(F.col("__rn") == 1).drop("__rn"),
        ranked.filter(F.col("__rn") > 1).drop("__rn"),
    )
