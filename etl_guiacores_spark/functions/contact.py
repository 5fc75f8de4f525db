"""Phone normalization as Column expressions (zero UDF).

The reference has two conflicting formats (SURVEY §0 defect #5); the
engine's canonical rule is the transformer's (T2):
digits-only; <10 digits invalid; 10 -> 3-4-3; 11 -> 2-3-3-3; longer
kept raw (reference: src/transformers/business_transformer.py:31-49).
The legacy variant (T3, 10 -> 3-3-4 / 7 -> 3-4,
reference: src/common/utils.py:136-160) is kept as an explicitly
named alternative for parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _digits(col: Column) -> Column:
    return F.regexp_replace(col, r"\D", "")


def normalize_phone(col: Column) -> Column:
    """T2 canonical phone rule; invalid (<10 digits) -> NULL."""
    d = _digits(col)
    return (
        F.when(F.length(d) < 10, F.lit(None))
        .when(
            F.length(d) == 10,
            F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 4), F.substring(d, 8, 3)),
        )
        .when(
            F.length(d) == 11,
            F.concat_ws(
                "-",
                F.substring(d, 1, 2),
                F.substring(d, 3, 3),
                F.substring(d, 6, 3),
                F.substring(d, 9, 3),
            ),
        )
        .otherwise(d)
    )


def format_phone_variant(col: Column) -> Column:
    """T3 legacy rule: 10 -> 3-3-4, 7 -> 3-4, else digits or NULL when empty.

    reference: src/common/utils.py:136-160.
    """
    d = _digits(col)
    return (
        F.when(F.length(d) == 0, F.lit(None))
        .when(
            F.length(d) == 10,
            F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 3), F.substring(d, 7, 4)),
        )
        .when(F.length(d) == 7, F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 4)))
        .otherwise(d)
    )


def normalize_phone_list(col: Column, sep: str = r",\s*") -> Column:
    """T4 — split a comma-joined phone string, normalize each entry,
    drop invalid ones, rejoin; empty result -> NULL.

    Higher-order functions keep this JVM-side
    (reference: src/transformers/business_transformer.py:91-96 loops in Python).
    """
    normalized = F.transform(F.split(col, sep), lambda x: normalize_phone(x))
    kept = F.filter(normalized, lambda x: x.isNotNull())
    return F.when(F.size(kept) > 0, F.array_join(kept, ", "))


def clean_phone_list(col: Column, sep: str = r",\s*") -> Column:
    """T11 — split, strip hyphens/spaces, order-preserving dedupe, rejoin.

    ``array_distinct`` keeps the first occurrence, matching the
    reference's order-preserving set walk
    (reference: src/tools/clean_data.py:7-28).
    """
    stripped = F.transform(F.split(col, sep), lambda x: F.regexp_replace(x, r"[-\s]", ""))
    deduped = F.array_distinct(F.filter(stripped, lambda x: F.length(x) > 0))
    return F.when(F.size(deduped) > 0, F.array_join(deduped, ", "))
