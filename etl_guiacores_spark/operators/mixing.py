"""Mixture water-filling: allocate a token budget across sources with
capacity caps.

Every LLM training run starts from a target mixture ("40% web, 30%
code, ...") and a corpus whose sources DON'T have that much data: the
naive ``budget * share`` allocation over-asks small sources. The
standard fix is water-filling — cap each source at what it has,
re-spread the freed budget across the others proportionally, repeat
until nothing new caps. q82 (temperature mixture) and q94 (rebalance
keep-rates) compute target SHARES; this operator turns shares plus
capacities into an exact feasible ALLOCATION.

The fixpoint runs in ONE relational pass, no loop: sort sources by
their cap ratio avail/weight ascending — the order in which sources
hit their caps as the water level rises — and a source caps iff its
ratio is at most the water level implied by everything after it:

    a_i * suffix_w_i  <=  (B - prefix_a_{i-1}) * w_i

(cross-multiplied — no division, DECIMAL(38,0) products). Capping is
prefix-monotone in ratio order, so a cumulative-AND window (MIN over
the boolean prefix) pins the capped set deterministically even at
ratio-key ties; uncapped sources then split the remaining budget
proportionally with truncating division.

Determinism/exactness: the ratio sort key is the fixed-point
``avail * 10^12 div weight`` with the source id as tiebreak — two
ratios closer than 1e-12 tie on the key and resolve by id, which
both engines replay identically. Truncating splits undershoot the
budget by < |uncapped| units; the report makes the residual visible
instead of silently redistributing it.

Scale shape: everything here runs on the BOUNDED per-source relation
(|sources|, not rows) — the corpus-sized work is the one
groupBy(source) the caller already pays to build it. Windows over a
bounded table, no joins except the caller's optional scalar budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BIG = "decimal(38,0)"


def waterfill_allocation(
    sources: DataFrame,
    avail_col: str,
    weight_col: str,
    budget_col: str,
    id_col: str,
) -> DataFrame:
    """Water-fill ``budget_col`` units across sources.

    ``sources`` must be a bounded per-source relation carrying
    ``id_col`` (unique), ``avail_col`` (capacity, >= 0),
    ``weight_col`` (target-share weight, > 0) and ``budget_col``
    (the same total budget value on every row — keep it a column so
    the caller can derive it in-plan from the data).

    Returns (id_col, avail, weight, capped, alloc) with
    ``sum(alloc) <= budget`` (undershoot < |uncapped| from
    truncation) and ``alloc <= avail`` everywhere.
    """
    base = sources.select(
        F.col(id_col).alias("__id"),
        F.col(avail_col).cast("long").alias("avail"),
        F.col(weight_col).cast("long").alias("weight"),
        F.col(budget_col).cast("long").alias("__b"),
        F.expr(
            f"CAST({avail_col} AS DECIMAL(38,0)) * 1000000000000 "
            f"div {weight_col}"
        ).alias("__ratio"),
    )
    w_ord = Window.orderBy("__ratio", "__id")
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        base.withColumn(
            "__prefix_a",
            F.coalesce(F.sum("avail").over(w_pre), F.lit(0)).cast("long"),
        )
        .withColumn("__total_w", F.sum("weight").over(w_all).cast("long"))
        .withColumn(
            "__prefix_w",
            F.coalesce(F.sum("weight").over(w_pre), F.lit(0)).cast("long"),
        )
        .withColumn(
            "__cond",
            (
                F.col("avail").cast(_BIG)
                * (F.col("__total_w") - F.col("__prefix_w")).cast(_BIG)
                <= (F.col("__b") - F.col("__prefix_a")).cast(_BIG)
                * F.col("weight").cast(_BIG)
            ).cast("int"),
        )
        .withColumn("capped", (F.min("__cond").over(w_run) == 1))
    )
    totals = staged.groupBy().agg(
        F.sum(F.when(F.col("capped"), F.col("avail")).otherwise(0))
        .cast("long")
        .alias("__capped_a"),
        F.sum(F.when(~F.col("capped"), F.col("weight")).otherwise(0))
        .cast("long")
        .alias("__open_w"),
    )
    return (
        staged.crossJoin(F.broadcast(totals))
        .withColumn(
            "alloc",
            F.when(F.col("capped"), F.col("avail")).otherwise(
                F.expr(
                    "CAST(CAST((__b - __capped_a) AS DECIMAL(38,0)) "
                    "* weight div NULLIF(__open_w, 0) AS BIGINT)"
                )
            ),
        )
        .select(
            F.col("__id").alias(id_col), "avail", "weight", "capped", "alloc"
        )
    )
