"""Identifier extraction as Column expressions.

reference: src/common/utils.py:115-134 (X12 id from URL query param),
src/extractors/sequential_collector.py:606-639 (X11 total-matches).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def business_id_from_url(col: Column) -> Column:
    """X12 — the ``id=`` query-parameter value, NULL if absent."""
    return F.parse_url(col, F.lit("QUERY"), F.lit("id"))


def total_matches(col: Column) -> Column:
    """X11 — ``(\\d+)\\s+coincidencias`` from header text -> int."""
    m = F.regexp_extract(col, r"(\d+)\s+coincidencias", 1)
    # try_cast: a garbled header can carry a digit run past int range,
    # where an ANSI cast would abort the extraction instead of NULLing
    return F.when(m != "", m.try_cast("int"))
