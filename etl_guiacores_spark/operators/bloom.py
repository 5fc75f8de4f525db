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

    The filter broadcasts. Each probe value explodes to its positions,
    left-joins the broadcast bit set (map-side, no shuffle of the
    probe stream for the join itself), and a per-value count of
    matched positions compared against ``num_hashes`` decides
    membership — the only shuffle keys on the probe value for that
    count, carrying (value, matched-int) pairs.
    """
    pos = F.explode(
        _positions(F.col(value_col), num_bits, num_hashes, seed)
    ).alias("bit")
    # membership depends only on the value: probe DISTINCT values, then
    # join the verdict back — repeated values across rows don't re-probe
    marked = (
        probes.select(value_col).distinct()
        .select(value_col, pos)
        .join(F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy(value_col)
        .agg((F.sum(F.coalesce(F.col("__set"), F.lit(0))) == num_hashes).alias("maybe_member"))
    )
    return probes.join(marked, value_col)
