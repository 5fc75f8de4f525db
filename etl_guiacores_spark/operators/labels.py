"""Label aggregation for human/model-annotated training data.

Preference and classification datasets arrive as MULTIPLE judgments
per example (several annotators, several reward-model samples); the
training table wants one consolidated label plus a confidence signal.
The canonical consolidation is majority vote with a deterministic
tie-break and an agreement ratio — the inter-annotator-agreement
denominator every data card reports.

Scale shape: one groupBy per (example, label) to count votes (map-side
combinable), one groupBy per example folding the per-label counts with
``min_by`` over a total order — no window, no per-example sort, two
key-partitioned shuffles of count rows (never raw judgments past the
first combine). Exact integer ppm for the agreement ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def majority_label(
    df: DataFrame,
    example_col: str,
    label_col: str,
) -> DataFrame:
    """One row per example: (example, label, votes_top, votes_total,
    n_labels, agreement_ppm).

    The winner is the label with the most votes; ties break to the
    LEXICOGRAPHICALLY SMALLEST label, making the vote a total order —
    deterministic across runs, partitionings, and engines (a bare
    ``max_by`` on count would be tie-nondeterministic).
    ``agreement_ppm = votes_top * 1e6 div votes_total`` (truncating,
    the engine-wide convention).
    """
    counts = df.groupBy(example_col, label_col).agg(
        F.count("*").cast("long").alias("__votes")
    )
    return (
        counts.groupBy(example_col)
        .agg(
            F.expr(
                f"min_by({label_col}, struct(-__votes, {label_col}))"
            ).alias(label_col),
            F.max("__votes").alias("votes_top"),
            F.sum("__votes").alias("votes_total"),
            F.count("*").cast("long").alias("n_labels"),
        )
        .withColumn(
            "agreement_ppm",
            F.expr("CAST(votes_top * 1000000 div votes_total AS BIGINT)"),
        )
    )
