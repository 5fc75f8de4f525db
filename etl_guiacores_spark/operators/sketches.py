"""Sketch-based approximate aggregates for cardinality and quantiles.

At 100 TB, exact count-distinct on a high-cardinality column shuffles
every distinct value; exact percentiles shuffle every row into a
sort. Sketches bound both: HyperLogLog++ state is a few KB per group
regardless of cardinality, and the quantile summary
(Greenwald-Khanna) is bounded by 1/accuracy — both merge
associatively, so partial aggregation works and a pre-aggregated
sketch tier can serve any grouping rollup.

These wrap Spark's built-ins behind an explicit, tested error
contract; they are NOT oracle-checked (approximation is
engine-specific by design) — the tests assert the error bound against
the exact answer instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.02
) -> DataFrame:
    """count(DISTINCT col) per key group with HLL++ (relative standard
    deviation <= rsd, default 2%)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Grouped approximate percentiles; rank error <= 1/accuracy."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("quantiles")
    )


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Heavy hitters with frequency >= support (Karp et al. single-pass
    streaming algorithm; may over-report, never under-reports). One
    row: array of candidate heavy hitters."""
    return df.freqItems([col], support=support)


def count_min_frequencies(
    df: DataFrame, col: str, probes: list, eps: float = 0.001, confidence: float = 0.99
) -> dict:
    """Approximate per-value frequencies from a Count-Min sketch.

    The sketch is a fixed-size mergeable aggregate (rows x width
    counters) — at 100 TB the frequency table for a hot column costs
    KBs instead of a distinct-count shuffle. Returns {probe: est};
    estimates overcount by at most eps*N with the given confidence.
    """
    from pyspark.sql import functions as F

    sketch_bytes = df.select(
        F.count_min_sketch(F.col(col), F.lit(eps), F.lit(confidence), F.lit(42)).alias("s")
    ).collect()[0]["s"]
    # decode via the JVM helper to stay faithful to Spark's layout
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    return {p: sketch.estimateCount(p) for p in probes}
