"""Distributed Bloom filter as a bounded bit-position table.

The decontamination / membership primitive at 100 TB: testing every
corpus n-gram against a benchmark set by exact join (q59's shape)
shuffles the full posting list; a Bloom filter compresses the
benchmark side to a fixed-size bit set that BROADCASTS, turning
membership into a map-side probe — the same idea as Spark's own
runtime bloom-filter join pruning, but as an explicit, reusable,
engine-portable operator (Spark's ``DataFrame.stat.bloomFilter``
materializes on the driver and its murmur-based layout is not
reproducible in another engine; this one is pure DataFrame algebra
on both sides).

Representation: the filter is a DataFrame of the DISTINCT SET bit
positions — at most ``num_bits`` rows of one int each. For the classic
regime (bits ~ 10-20x member count, k ~ ln2 * bits/members) that is a
few MB per hundred million members, well inside broadcast range, and
it lands in parquet like any other artifact so one build serves many
probe jobs.

Guarantees (the Bloom contract, q107 hash-checks both on real data):
- NO false negatives: every truly-present value probes positive.
- False positives bounded: a non-member probes positive only if all
  ``k`` of its positions collide; the expected rate is
  ``(1 - e^(-k*n/m))^k``.

Hashing is the repo's engine-portable md5 family (first 8 hex digits
as u32, per-probe seed), bit-identical in DuckDB — swap for xxhash64
at production scale, same plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(value: Column, probe: int, num_bits: int, seed: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:{probe}:"), value)), 1, 8), 16, 10
    ).cast("long")
    return (h % F.lit(num_bits)).cast("long")


def _positions(value: Column, num_bits: int, num_hashes: int, seed: str) -> Column:
    return F.array(*[_position(value, i, num_bits, seed) for i in range(num_hashes)])


def bloom_build(
    members: DataFrame,
    value_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    seed: str = "bloom",
) -> DataFrame:
    """Build the filter: distinct set-bit positions of every member.

    One scan + one distinct on a bounded-range int key (<= num_bits
    values, so the shuffle fan-in is bounded no matter the member
    count; map-side partial distinct collapses most traffic). Returns
    a single-column ``bit`` DataFrame — persist it to parquet as the
    shareable filter artifact.
    """
    return (
        members.select(
            F.explode(
                _positions(F.col(value_col), num_bits, num_hashes, seed)
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    value_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    seed: str = "bloom",
) -> DataFrame:
    """Add ``maybe_member`` to ``probes``: TRUE iff all ``num_hashes``
    positions of the value are set in ``bits``.

    ENTIRELY map-side: one broadcast LEFT join per hash position (the
    bit table is distinct, so each join matches at most one row and
    never multiplies the stream), AND-ed into the verdict. No shuffle
    of the probe stream, no distinct, no verdict join-back — the probe
    costs ``num_hashes`` md5s and ``num_hashes`` broadcast hash-probes
    per row, independent of how many members built the filter. That
    independence is the point: a member set too big to broadcast as
    postings still probes map-side through its fixed-size bit table.
    """
    out = probes
    verdict = F.lit(True)
    for i in range(num_hashes):
        b = F.broadcast(
            bits.select(F.col("bit").alias(f"__b{i}"), F.lit(True).alias(f"__hit{i}"))
        )
        out = out.join(
            b,
            _position(F.col(value_col), i, num_bits, seed) == F.col(f"__b{i}"),
            "left",
        ).drop(f"__b{i}")
        verdict = verdict & F.coalesce(F.col(f"__hit{i}"), F.lit(False))
    return out.withColumn("maybe_member", verdict).drop(
        *[f"__hit{i}" for i in range(num_hashes)]
    )
