"""Robust (median/MAD) per-group outlier detection, integer-exact.

Mean/stddev outlier gates break on the very rows they should catch
(one extreme value drags the mean toward itself); the robust version
uses the median and the Median Absolute Deviation:

    outlier(x) <=> |x - median| > k * 1.4826 * MAD

(1.4826 makes MAD a consistent sigma estimator under normality). This
is the quality gate for numeric telemetry the text operators'
Gopher-rule gate is for prose — and the exactness problem is the same
as q58/q104/q112: medians interpolate, so a naive float pipeline
splits engines. The discipline here:

- inputs are integer micro-units (the caller scales, e.g.
  ``FLOOR(value * 1e6)``);
- an exact interpolated median of integers lands on halves, so the
  median is carried as ``median2 = 2 * percentile(v, 0.5)`` — an
  exact BIGINT (the .5 midpoint of two BIGINTs is exactly
  representable in the double both engines interpolate in);
- deviations at scale 2 (``dev2 = |2v - median2|``, integer) and
  their median at scale 4 (``mad4 = 2 * percentile(dev2, 0.5)``);
- the gate cross-multiplied into DECIMAL(38,0):
  ``20_000_000 * dev2 > k_milli * 14826 * mad4``
  (k = ``k_milli``/1000, 1.4826 = 14826/10000). The cross products
  are NOT computed in BIGINT — at the default k the RHS overflows
  64 bits already at ``mad4 > ~2.1e11`` micro-units of spread (well
  inside plausible telemetry ranges), wrapping silently in non-ANSI
  mode; DECIMAL(38,0) carries the products exactly to ~1e38, i.e.
  value spreads to ~5e30 micro-units — beyond any BIGINT input. The
  oracle mirrors this with DuckDB HUGEINT (128-bit), same values;
- the robust z-score in thousandths (``z_milli``) with truncating
  division, its ``20000 * dev2 * 1000`` numerator likewise in
  DECIMAL(38,0) (BIGINT would wrap near ``dev2 ~ 4.6e11``), the
  quotient cast back to BIGINT — exact while the RATIO
  ``dev2/mad4 < ~6.8e12`` (z_milli itself must fit 64 bits) — NULL
  when ``mad4 = 0`` (a >=50%-constant group: every deviating row gates as
  an outlier, the standard MAD degeneracy — callers wanting a softer
  gate should pre-filter such groups).

Scale shape: exact ``percentile`` needs each group's values on one
reducer (same bound as sessionization / grouped top-k) — right for
bounded per-entity groups; for huge groups swap in
``approx_percentile`` (t-digest, mergeable map-side) and accept the
documented tolerance, as operators/sketches does for cardinality. Two
group-keyed shuffles (median, then MAD); the two tiny per-group stat
tables join back on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_micro_col: str,
    k_milli: int = 3000,
) -> DataFrame:
    """Input columns + (median2, mad4, z_milli, is_outlier) per row.

    ``k_milli``: the gate multiplier in thousandths (3000 = the
    classic 3-sigma-equivalent).
    """
    if k_milli <= 0:
        raise ValueError("k_milli must be positive")
    med = df.groupBy(group_col).agg(
        F.expr(f"CAST(2 * percentile({value_micro_col}, 0.5D) AS BIGINT)").alias(
            "median2"
        )
    )
    dev = df.join(med, group_col).withColumn(
        "__dev2",
        F.abs(2 * F.col(value_micro_col) - F.col("median2")).cast("long"),
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("CAST(2 * percentile(__dev2, 0.5D) AS BIGINT)").alias("mad4")
    )
    gated = (
        dev.join(mad, group_col)
        .withColumn(
            "z_milli",
            F.when(
                F.col("mad4") > 0,
                F.expr(
                    "CAST(CAST(20000 AS DECIMAL(38,0)) * __dev2 * 1000 "
                    "div (14826 * mad4) AS BIGINT)"
                ),
            ),
        )
        .withColumn(
            "is_outlier",
            (
                F.lit(20_000_000).cast("decimal(38,0)") * F.col("__dev2")
                > F.lit(k_milli).cast("decimal(38,0)")
                * F.lit(14826)
                * F.col("mad4")
            ).cast("int"),
        )
    )
    return gated.drop("__dev2")
