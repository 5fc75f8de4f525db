"""Hashed n-gram importance weighting for targeted data selection.

DSIR-shaped operator (Data Selection via Importance Resampling, Xie et
al. 2023): score every corpus document by how much its hashed token
features look like a TARGET distribution (a trusted high-quality
subset) relative to the corpus-wide distribution. High scores mark
documents worth up-sampling when building a training mixture aimed at
the target domain.

Published DSIR uses log-ratio sums of hashed-feature probabilities
(bag of hashed n-grams, add-one smoothing). ``log``/``pow`` are NOT
IEEE-correctly-rounded, so an oracle-parity path built on them can
split engines in the last ulp (the q56/q58 lesson). This operator
keeps the same monotone structure — per-feature target/corpus ratio,
summed over a document's tokens — but computes each bucket ratio as
add-one-smoothed integer parts-per-million with floor division:

    ratio_ppm(b) = (target_count(b) + 1) * 1_000_000 // (corpus_count(b) + 1)

All arithmetic is BIGINT, deterministic, and identical across Spark
and DuckDB. Production can swap in float log-ratios without touching
the plan shape (the ratio table is the only thing that changes).

Scale shape (100 TB): the bucket statistics table is bounded by
``num_buckets`` (default 4096 rows) regardless of corpus size — it is
computed with two map-side-combined aggregations over (bucket) keys
and then BROADCAST back onto the exploded token stream, so the
per-document scoring join never shuffles the corpus. Token traffic is
(doc_id, bucket) integer pairs; text never rides a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_guiacores_spark.operators.textstats import tokens

#: ppm scale for the integer ratio — fits ratio_ppm * tokens-per-doc
#: comfortably in BIGINT (1e6 * 2^31 tokens << 2^63)
PPM = 1_000_000


def feature_bucket(tok: Column, num_buckets: int = 4096, seed: str = "dsir") -> Column:
    """Engine-portable hashed feature id: first 8 md5 hex digits of
    ``seed:token`` as a u32, modulo ``num_buckets``. Same hash family
    as sampling/winnowing; swap for xxhash64 at production scale."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), tok)), 1, 8), 16, 10)
    return (h.cast("long") % F.lit(num_buckets)).cast("long")


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Per-document importance score against a target subset.

    ``is_target`` is a boolean Column over ``docs`` marking the target
    distribution (e.g. ``F.col("lang") == "en"`` or a quality-score
    threshold). Returns one row per document WITH TOKENS — a blank or
    NULL text produces no output row (explode of an empty array), the
    same convention as the SQL twin; left-join the result if empty
    documents must survive scoring — with token count and
    ``importance_ppm`` = sum over the document's tokens (with
    multiplicity) of the add-one-smoothed target/corpus bucket ratio
    in parts-per-million. Documents from the target's own distribution
    score near ``PPM * P(target)``-ish; off-target documents lower.

    Plan: TWO passes over the tokenized corpus — an estimator-fit pass
    (bucket stats, aggregated with map-side combine into a bounded
    ``num_buckets``-row table) and a scoring pass that joins the
    broadcast ratio table back and sums per document. This is DSIR's
    own production shape (fit the importance estimator, then score);
    Spark does not reuse the shared explode subtree across the two
    aggregations, and persisting an exploded 100 TB token stream to
    avoid the second scan would cost more than the scan. No shuffle
    carries text, and the only corpus-sized shuffles key on bucket
    (bounded fan-in) and ``id_col``.
    """
    toks = docs.select(
        F.col(id_col),
        # NULL predicate (e.g. lang IS NULL) counts as non-target, the
        # same mapping a SQL `CASE WHEN is_t THEN 1 ELSE 0` applies —
        # without this, an all-NULL bucket would sum to NULL and its
        # tokens would silently drop out of the importance sum
        F.coalesce(is_target, F.lit(False)).alias("__is_target"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).select(
        id_col,
        "__is_target",
        feature_bucket(F.col("__tok"), num_buckets, seed).alias("__bucket"),
    )

    stats = toks.groupBy("__bucket").agg(
        F.count("*").alias("__cc"),
        F.sum(F.col("__is_target").cast("bigint")).alias("__ct"),
    )
    ratios = stats.select(
        "__bucket",
        # add-one smoothing on both sides; integer floor division
        F.expr(f"CAST((__ct + 1) * {PPM} div (__cc + 1) AS BIGINT)").alias(
            "__ratio_ppm"
        ),
    )

    return (
        toks.join(F.broadcast(ratios), "__bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("__ratio_ppm").cast("bigint").alias("importance_ppm"),
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR end-to-end (Xie et al. 2023): fit the hashed-n-gram
    importance estimator, score every document, then IMPORTANCE
    RESAMPLE — draw ``k`` documents without replacement with
    probability proportional to their importance weight (the paper's
    actual selection step, via the deterministic A-Res race in
    operators/sampling.weighted_sample_topk).

    Returns the selected (id_col, n_tok, importance_ppm) rows. The
    composition inherits both parents' scale shapes: bounded broadcast
    bucket stats for scoring, distributed top-k for the draw — no new
    shuffle beyond theirs. Tokenless documents score no row and so
    cannot be selected, matching the estimator's support.
    """
    from etl_guiacores_spark.operators.sampling import weighted_sample_topk

    scores = dsir_importance(docs, is_target, id_col, text_col, num_buckets, seed)
    picked = weighted_sample_topk(
        scores, id_col, "importance_ppm", k, seed=f"{seed}-sel"
    ).select(id_col)
    return scores.join(picked, id_col)
