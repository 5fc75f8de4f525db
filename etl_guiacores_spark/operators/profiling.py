"""Column profiling: null rates, cardinalities, content checksums.

Every stage boundary in a large pipeline needs a cheap answer to "is
this table still the table I think it is" — after a rewrite, a
compaction, an engine upgrade, a backfill. Row counts are too weak
(a backfill that swaps values keeps the count), and full diffs are
too expensive at 100 TB. The standard middle ground is a per-column
profile: null count, exact distinct count, and an ORDER-INSENSITIVE
content checksum that any two engines can recompute independently —
the same role the reference's consolidation step plays when it
re-counts CSV rows after a merge (src/etl/loaders.py), generalized
from counts to content.

Checksum design: each rendered value hashes through md5, the first
15 hex digits (60 bits) become an integer, and the per-column SUM of
those integers modulo the Mersenne prime 2^61-1 is the checksum.
Summation is commutative and associative, so the checksum is
independent of row order and partitioning, map-side combinable, and
MERGEABLE: the checksum of a union is the modular sum of the parts'
checksums (the property that lets 1000 executors profile 100 TB with
one tiny final reduce, and lets an incremental loader update a
stored profile without rescanning history). DECIMAL(38,0) interiors
hold the running sum exactly to ~8e19 rows before the final mod.

Rendering contract: values are profiled through caller-supplied
STRING renderings (integers as decimal strings, doubles through a
fixed-point floor, timestamps through a fixed format) so the md5
input — and therefore the checksum — is engine-independent. Raw
double/timestamp binary formatting is never hashed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_61 = (1 << 61) - 1


def _h60(rendered: Column) -> Column:
    """md5-derived 60-bit integer of a rendered value, 0 for NULL."""
    h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return F.coalesce(h, F.lit(0).cast("decimal(38,0)"))


def column_profile(df: DataFrame, rendered: dict[str, Column]) -> DataFrame:
    """Profile each column of ``df`` named in ``rendered``.

    ``rendered`` maps column name -> a STRING-typed rendering
    expression for that column (NULL stays NULL). One stack pass
    turns the table into (col_name, val) pairs; one aggregation
    computes, per column: row count, null count, exact distinct
    count of the rendering, and the modular md5-sum checksum.

    Returns (col_name, n_rows, n_null, n_distinct, checksum) — all
    BIGINT, one row per profiled column, sorted downstream by the
    caller. The only shuffle keys on (col_name, val) for the
    distinct phase; the checksum and counts combine map-side.
    """
    if not rendered:
        raise ValueError("column_profile requires at least one column")
    pairs = df.select(
        *[
            F.struct(
                F.lit(name).alias("col_name"), expr.alias("val")
            ).alias(f"__p{i}")
            for i, (name, expr) in enumerate(rendered.items())
        ]
    )
    stacked = pairs.select(
        F.explode(F.array(*[F.col(c) for c in pairs.columns])).alias("p")
    ).select("p.col_name", "p.val")
    return (
        stacked.groupBy("col_name")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("val").isNull(), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_null"),
            F.countDistinct("val").cast("long").alias("n_distinct"),
            (
                F.sum(_h60(F.col("val"))) % F.lit(MERSENNE_61).cast(
                    "decimal(38,0)"
                )
            )
            .cast("long")
            .alias("checksum"),
        )
    )
