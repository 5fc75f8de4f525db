"""Address split (T12) as Column expressions.

reference: src/tools/clean_data.py:41-57 — rsplit on ``' - '``:
last segment becomes ``localidad``, the rest rejoined is
``direccion``; a 1-segment address keeps ``direccion`` and gets a
NULL ``localidad``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = " - "


def split_address(col: Column) -> tuple[Column, Column]:
    """Return ``(direccion, localidad)`` columns."""
    parts = F.split(col, SEP)
    n = F.size(parts)
    direccion = F.when(
        n > 1, F.array_join(F.slice(parts, 1, (n - 1).cast("int")), SEP)
    ).otherwise(col)
    localidad = F.when(n > 1, F.element_at(parts, -1))
    return direccion, localidad
