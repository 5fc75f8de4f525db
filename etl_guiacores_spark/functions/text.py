"""Text cleaning / validation as pure Column expressions (zero UDF).

Engine convention (SURVEY §1.2): NULL internally, the reference's
``'N/A'`` sentinel only at the CSV export boundary — ``from_na`` /
``to_na`` are that codec.

Every function here is a JVM-side expression, so it stays inside
whole-stage codegen; the reference does the same work row-at-a-time
in Python (reference: src/transformers/business_transformer.py:25-57,
src/common/data_cleaner.py:25-60, src/tools/clean_data.py:30-39).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NA = "N/A"

#: regex from reference: src/transformers/business_transformer.py:56
EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def from_na(col: Column) -> Column:
    """'N/A' / empty-string sentinel -> NULL (ingestion codec)."""
    c = F.trim(col)
    return F.when((c == NA) | (c == ""), F.lit(None)).otherwise(col)


def to_na(col: Column) -> Column:
    """NULL -> 'N/A' sentinel (export codec).

    reference: src/transformers/business_transformer.py:27-28 uses the
    sentinel pervasively; the engine renders it only at the boundary.
    """
    return F.coalesce(col, F.lit(NA))


def clean_text(col: Column) -> Column:
    """Collapse internal whitespace and trim; blank -> NULL.

    T1 — reference: src/transformers/business_transformer.py:25-29 and
    src/common/utils.py:94-113. Null passes through.
    """
    cleaned = F.trim(F.regexp_replace(col, r"\s+", " "))
    return empty_to_null(cleaned)


def empty_to_null(col: Column) -> Column:
    """Blank-after-trim string -> NULL.

    T8 — the reference drops falsy dict keys
    (reference: src/common/data_cleaner.py:25); with a fixed schema the
    engine nullifies instead of dropping.
    """
    return F.when(F.length(F.trim(col)) == 0, F.lit(None)).otherwise(col)


def validate_email(col: Column) -> Column:
    """Email that fails the reference regex -> NULL.

    T5 — reference: src/transformers/business_transformer.py:51-57.
    """
    return F.when(col.rlike(EMAIL_RE), col)


def scrub_social(col: Column) -> Column:
    """Social URL containing 'guiacores' (case-insensitive) -> NULL.

    T10 — reference: src/tools/clean_data.py:30-39 (links back to the
    directory site itself are not real social profiles).
    """
    return F.when(F.lower(col).contains("guiacores"), F.lit(None)).otherwise(col)


def coerce_long(col: Column) -> Column:
    """Digit-only string -> bigint, else NULL.

    T9 — reference: src/common/data_cleaner.py:36-60 infers int via
    ``isdigit()``; here an explicit guarded cast.
    """
    # try_cast: the regex admits digit runs past bigint range, where an
    # ANSI cast would throw instead of honoring the "else NULL" contract
    return F.when(col.rlike(r"^\d+$"), col.try_cast("long"))


def coerce_bool(col: Column) -> Column:
    """'true'/'false' (any case) -> boolean, else NULL.

    T9 — reference: src/common/data_cleaner.py:36-60.
    """
    lowered = F.lower(F.trim(col))
    return F.when(lowered.isin("true", "false"), lowered == "true")
