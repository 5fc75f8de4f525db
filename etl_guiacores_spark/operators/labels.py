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


def cohen_kappa(
    df: DataFrame,
    group_cols: list[str],
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa between two label columns, per group, in exact
    integer ppm — chance-corrected agreement, the standard step up
    from raw accuracy for annotator-vs-annotator or
    classifier-vs-gold evaluation (two raters who both answer 'en'
    95% of the time agree 90% by luck alone; kappa subtracts that).

        kappa = (p_o - p_e) / (1 - p_e)
        p_o   = agreements / N
        p_e   = sum_c row_c * col_c / N^2

    Cross-multiplied to integers (the q58/q124 discipline):
    ``kappa_ppm = PPM * (N*agree - marg) div (N*N - marg)`` with
    ``marg = sum_c row_c * col_c``, every product in DECIMAL(38,0)
    (``N*agree`` wraps BIGINT past N ~ 3e9 rows — real corpus scale);
    NULL when ``N*N == marg`` (p_e = 1: both raters constant, kappa
    undefined). Truncating division toward zero on BOTH engines:
    negative kappa (worse-than-chance) truncates toward zero, pinned
    in tests.

    Scale shape: one groupBy over the data to the confusion table
    (map-side combinable; bounded by |groups| x |classes|^2), then
    marginal products and totals entirely on that bounded table —
    the raw rows shuffle once, as counts.

    Returns (group_cols..., n_items, n_agree, kappa_ppm).
    """
    g = list(group_cols)
    conf = df.groupBy(
        *g, F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).agg(F.count("*").cast("long").alias("__n"))
    # conf feeds THREE consumers (tot, rowt, colt) under different
    # downstream grouping keys, so without a stage boundary the raw
    # scan + label expressions replay once per consumer. conf itself
    # is bounded by |groups| x |classes|^2 — materializing it is a
    # tiny one-job barrier that makes everything downstream read the
    # bounded table (the staged-artifact discipline of the LSH family)
    conf = conf.localCheckpoint(eager=True)
    tot = conf.groupBy(*g).agg(
        F.sum("__n").cast("long").alias("n_items"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    rowt = conf.groupBy(*g, "__a").agg(F.sum("__n").alias("__ra"))
    colt = conf.groupBy(*g, "__b").agg(F.sum("__n").alias("__cb"))
    # class-matched marginal products: inner join on (group, class)
    marg = (
        rowt.withColumnRenamed("__a", "__c")
        .join(colt.withColumnRenamed("__b", "__c"), [*g, "__c"])
        .groupBy(*g)
        .agg(
            F.expr(
                "CAST(sum(CAST(__ra AS DECIMAL(38,0)) * __cb) "
                "AS DECIMAL(38,0))"
            ).alias("__marg")
        )
    )
    return (
        # LEFT join + 0: a group whose raters share NO class has an
        # empty marginal-product set — marg is 0 (p_e = 0, kappa =
        # p_o), not a dropped row (caught by the hypothesis sweep)
        tot.join(marg, g, "left")
        .withColumn(
            "__marg",
            F.coalesce(F.col("__marg"), F.lit(0).cast("decimal(38,0)")),
        )
        .withColumn(
            "kappa_ppm",
            F.expr(
                "CAST((CAST(n_items AS DECIMAL(38,0)) * n_agree - __marg) "
                "* 1000000 div NULLIF(CAST(n_items AS DECIMAL(38,0)) "
                "* n_items - __marg, 0) AS BIGINT)"
            ),
        )
        .drop("__marg")
    )
