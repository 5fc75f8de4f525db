"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join handles most cases at runtime (enabled in
session.py); these explicit operators cover the cases AQE can't:
broadcast-infeasible dimension sizes with a few pathological keys,
and deterministic plans where runtime re-splitting is undesirable.

``salted_join``: the big (skewed) side gets a random salt in
[0, salt), the small side is exploded ``salt`` ways; the join key
becomes (key, salt) so one hot key spreads over ``salt`` reducers.
``salted_distinct_count``: two-phase distinct-count — partial
distinct per (key, salt), then final merge — the agg analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side on ``key`` with salting.

    The small side is replicated ``salt``x (explode of a literal
    range) — acceptable exactly because it is small; the big side's
    rows scatter uniformly via a per-row random salt, so a hot key's
    rows land on ``salt`` different reducers instead of one straggler.

    Only big-side-preserving joins are supported: a right/full outer
    join would emit every unmatched small-side REPLICA (up to ``salt``
    duplicates per key) — salting is the wrong tool there.
    """
    if how.lower().replace("_", "") not in {
        "inner", "left", "leftouter", "leftsemi", "leftanti",
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side "
            "is replicated per salt, so right/full-outer would emit "
            "unmatched replicas as duplicate rows"
        )
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_exploded, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame, group_key: str, distinct_col: str, salt: int = 16
) -> DataFrame:
    """count(DISTINCT x) per group without funneling a hot group into
    one reducer: partial distinct on (key, salt-of-x), then sum.
    Exact (not approximate): the same x always hashes to the same
    salt, so partial distinct sets are disjoint across salts.
    """
    # pmod, not abs(hash) % n: hash covers the full int32 range and
    # abs(Int.MIN_VALUE) THROWS under ANSI (Spark 4 default) — on a
    # billions-of-rows corpus some value hashes there eventually and
    # kills the job (same fix as packing.py's bucketing; reproduced
    # live before changing)
    salted = df.withColumn("__salt", F.pmod(F.hash(F.col(distinct_col)), F.lit(salt)))
    partial = salted.groupBy(group_key, "__salt").agg(
        F.count_distinct(F.col(distinct_col)).alias("__partial")
    )
    return partial.groupBy(group_key).agg(
        F.sum("__partial").cast("long").alias("distinct_count")
    )
