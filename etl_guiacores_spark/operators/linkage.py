"""Fuzzy record linkage: blocked edit-distance matching and entity
resolution.

The reference deduplicates businesses by exact id
(src/common/utils.py:48-62); real directory data also needs FUZZY
matching — "Panadería San Juan" vs "Panaderia San Juan S.R.L." are the
same business with no shared key. The classic scalable shape is
block -> pair -> verify -> cluster:

1. **block**: derive a cheap blocking key per record (here: lowercased
   first token; production composes phonetic code + length bucket +
   prefix so key cardinality grows with the data). Only records
   sharing a block ever pair — the all-pairs square never
   materializes, exactly like LSH banding for documents.
2. **pair + verify**: within a block, candidate pairs prefilter on
   length difference (|len(a)-len(b)| <= max_dist is a lower bound on
   edit distance, so the filter is lossless) and verify with
   Levenshtein, using Spark's thresholded variant so the DP matrix
   aborts early on hopeless pairs.
3. **cluster** (``resolve_entities``): matched pairs are edges;
   connected components labels every record with a canonical entity
   id — the same adaptive CC machinery as document near-dup
   (operators/graph.py).

Scale: one shuffle on the block key to generate pairs (AQE skew-join
splits hot blocks); the verify predicate runs inside codegen; pair
volume is sum over blocks of C(block_size, 2), bounded by blocking-key
selectivity — the operator's contract is that the caller's key keeps
blocks bounded, the same contract every record-linkage system states.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_block_key(col: Column) -> Column:
    """Lowercased first whitespace token — the simplest useful key.
    Compose stronger keys (soundex + length bucket, 2-char prefix +
    token count) for production-cardinality data."""
    return F.lower(F.element_at(F.split(F.trim(col), r"\s+"), 1))


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 5,
    block_key: Column | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) whose names match within
    ``max_dist`` edits, with the measured ``dist``.

    Pairs only form within a block; the length-difference prefilter is
    exact (|len difference| lower-bounds edit distance) and the
    thresholded ``levenshtein`` short-circuits above ``max_dist``.
    """
    key = block_key if block_key is not None else default_block_key(F.col(name_col))
    t = df.select(
        F.col(id_col), F.col(name_col).alias("__name"), key.alias("__blk")
    ).filter(F.col("__blk").isNotNull())
    a = t.select(
        F.col(id_col).alias("id_a"), F.col("__name").alias("__name_a"), "__blk"
    )
    b = t.select(
        F.col(id_col).alias("id_b"), F.col("__name").alias("__name_b"), "__blk"
    )
    dist = F.levenshtein(F.col("__name_a"), F.col("__name_b"), max_dist)
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("__name_a") - F.length("__name_b")) <= max_dist
        )
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") >= 0)  # thresholded levenshtein: -1 = above
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 5,
    block_key: Column | None = None,
) -> DataFrame:
    """Entity resolution: label every record with its fuzzy-match
    component's minimum id (``entity_id``). Records matching nothing
    form singleton entities. Composes ``fuzzy_match_pairs`` with the
    adaptive connected-components operator."""
    from etl_guiacores_spark.operators.graph import connected_components

    pairs = fuzzy_match_pairs(df, id_col, name_col, max_dist, block_key).select(
        F.col("id_a"), F.col("id_b")
    )
    labels = connected_components(
        df.select(id_col), pairs, id_col=id_col, src_col="id_a", dst_col="id_b"
    )
    return labels.select(F.col("id").alias(id_col), F.col("component").alias("entity_id"))
