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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_micro_col: str,
    k_milli: int = 3000,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Input columns + (median2, mad4, z_milli, is_outlier) per row.

    ``k_milli``: the gate multiplier in thousandths (3000 = the
    classic 3-sigma-equivalent).

    ``exact=False`` is the huge-group escape hatch the module doc
    promises: exact ``percentile`` needs each group's values on one
    reducer, so a group too big for one executor swaps in
    ``approx_percentile`` (Greenwald-Khanna style sketch — fixed-size,
    MERGEABLE map-side partials, so no group ever assembles on one
    task). The contract loosens from exact to ranked: the returned
    median is an ACTUAL data value whose rank is within
    ``n / accuracy`` of the true median (same for the MAD leg), so
    ``median2``/``mad4`` land within that rank window and the gate can
    flip only for rows whose deviation sits inside the corresponding
    tolerance band around ``k * 1.4826 * MAD`` — the sketches.py
    tolerance discipline, pytest-pinned. Note the scaled carriers
    stay: ``median2 = 2 * approx_median`` (an even number now — the
    sketch never interpolates), keeping one downstream gate for both
    modes.
    """
    if k_milli <= 0:
        raise ValueError("k_milli must be positive")
    if accuracy <= 0:
        raise ValueError("accuracy must be positive")
    pctl = "percentile" if exact else f"approx_percentile"
    acc = "" if exact else f", {accuracy}"
    med = df.groupBy(group_col).agg(
        F.expr(
            f"CAST(2 * {pctl}({value_micro_col}, 0.5D{acc}) AS BIGINT)"
        ).alias("median2")
    )
    dev = df.join(med, group_col).withColumn(
        "__dev2",
        F.abs(2 * F.col(value_micro_col) - F.col("median2")).cast("long"),
    )
    mad = dev.groupBy(group_col).agg(
        F.expr(f"CAST(2 * {pctl}(__dev2, 0.5D{acc}) AS BIGINT)").alias("mad4")
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


def winsorize(
    df: DataFrame,
    group_col: str,
    value_micro_col: str,
    tail_sixteenths: int = 1,
) -> DataFrame:
    """Per-group winsorization: clamp values at the (t/16, 1-t/16)
    interpolated quantiles — the softer sibling of the
    :func:`robust_outliers` DROP gate (training pipelines usually
    prefer clipping a metric to discarding the row).

    Exactness: arbitrary quantiles interpolate at fractional rank
    ``q*(n-1)``, and most q (0.05, 0.01...) are NOT binary-exact, so
    the two engines' doubles can round differently (the q112 lesson).
    Quantiles are therefore restricted to SIXTEENTHS: q = t/16 is an
    exact double, the rank fraction is a multiple of 1/16, and the
    interpolated value times 16 is an exact BIGINT both engines agree
    on — the q124 half-carrier discipline generalized from halves to
    sixteenths. Outputs are 16x-scaled (``lo16``/``hi16``/
    ``clamped16``) plus a ``clipped`` flag.

    Scale shape: identical to the MAD gate — one exact percentile per
    bounded group (swap approx_percentile for huge groups), one
    group-keyed join back.
    """
    if not 1 <= tail_sixteenths <= 7:
        raise ValueError("tail_sixteenths must be in [1, 7]")
    qlo = tail_sixteenths / 16.0
    qhi = 1.0 - qlo
    bounds = df.groupBy(group_col).agg(
        F.expr(
            f"CAST(16 * percentile({value_micro_col}, {qlo!r}D) AS BIGINT)"
        ).alias("lo16"),
        F.expr(
            f"CAST(16 * percentile({value_micro_col}, {qhi!r}D) AS BIGINT)"
        ).alias("hi16"),
    )
    v16 = F.col(value_micro_col).cast("long") * 16
    return (
        df.join(bounds, group_col)
        .withColumn(
            "clamped16", F.least(F.greatest(v16, F.col("lo16")), F.col("hi16"))
        )
        .withColumn("clipped", (v16 != F.col("clamped16")).cast("int"))
    )


def quantile_report(
    df: DataFrame,
    group_col: str,
    value_micro_col: str,
    sixteenths: tuple[int, ...] = (8, 12, 15),
) -> DataFrame:
    """Per-group order-statistics report — the latency/SLO summary
    (p50/p75/p93.75-style) every telemetry rollup publishes, under
    the engine's exactness discipline: quantile fractions restricted
    to SIXTEENTHS (binary-exact doubles, so interpolation at rank
    q*(n-1) lands on multiples of 1/16 and the value times 16 is an
    exact BIGINT both engines agree on — :func:`winsorize`'s
    discipline, reported instead of clamped). Min/max/count ride the
    same single aggregate.

    One partial-aggregable groupBy for count/min/max; the exact
    percentiles need each group's values on one reducer (bounded-group
    shape — swap the t-digest sketch for huge groups, documented
    tolerance).

    Returns (group_col, n_rows, min_micro, max_micro,
    p<t>_16 for each t) — p-columns 16x-scaled.
    """
    for t in sixteenths:
        if not 1 <= t <= 15:
            raise ValueError("sixteenths must be in [1, 15]")
    aggs = [
        F.count("*").cast("long").alias("n_rows"),
        F.min(value_micro_col).cast("long").alias("min_micro"),
        F.max(value_micro_col).cast("long").alias("max_micro"),
    ] + [
        F.expr(
            f"CAST(16 * percentile({value_micro_col}, {t / 16.0!r}D) "
            f"AS BIGINT)"
        ).alias(f"p{t}_16")
        for t in sixteenths
    ]
    return df.groupBy(group_col).agg(*aggs)


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group LOWER weighted median: the smallest value v such that

        2 * sum(weight | value <= v)  >=  sum(weight)

    — exact, no interpolation, deterministic without a tiebreak (the
    cut is on VALUES, so tied rows pool their weight). With unit
    weights this is the classic lower median; with token-count
    weights over documents it answers "the document size below which
    half the corpus TOKEN MASS lives" — the right centering statistic
    for packing and shard sizing, where long docs matter by their
    mass, not their count.

    Scale shape: one map-side-combinable groupBy to (group, value)
    weight sums, one cumulative window over that bounded
    distinct-value relation (parallel across groups — the q150/q151
    count-collapse discipline), one min-aggregate. Weights must be
    non-negative integers; sums in plain BIGINT (weight totals, not
    n^2 products).

    Returns (group_cols..., total_weight, wmedian).
    """
    g = list(group_cols)
    by_val = df.groupBy(*g, value_col).agg(
        F.sum(weight_col).cast("long").alias("__w")
    )
    w_cum = (
        Window.partitionBy(*g)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*g)
    stepped = by_val.select(
        *g,
        F.col(value_col),
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_all).alias("__tot"),
    )
    return (
        stepped.filter(2 * F.col("__cum") >= F.col("__tot"))
        .groupBy(*g)
        .agg(
            F.max("__tot").cast("long").alias("total_weight"),
            F.min(value_col).alias("wmedian"),
        )
    )
