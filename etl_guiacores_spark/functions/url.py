"""URL validation / normalization as Column expressions.

reference: src/transformers/business_transformer.py:59-68 (T6 validate),
src/transformers/url_transformer.py:28-53 (T7 normalize).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scheme + non-empty host, the urlparse(scheme, netloc) check of T6
_URL_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/\s]+"


def validate_url(col: Column) -> Column:
    """T6 — URL without scheme+host -> NULL."""
    return F.when(col.rlike(_URL_RE), col)


def normalize_url(
    col: Column,
    *,
    blocked_domains: Sequence[str] = (),
    max_length: int | None = None,
) -> Column:
    """T7 — default https:// scheme, blocklist rejection, truncation.

    The reference checks an allow/block list per row in Python
    (reference: src/transformers/url_transformer.py:36-46); a short
    literal list compiles to an OR-chain here. For a large list use a
    broadcast anti-join at the DataFrame level instead
    (operators.joins.filter_blocked_domains).
    """
    with_scheme = F.when(
        ~F.lower(col).rlike(r"^https?://"), F.concat(F.lit("https://"), col)
    ).otherwise(col)
    host = F.parse_url(with_scheme, F.lit("HOST"))

    out = with_scheme
    if blocked_domains:
        blocked = F.lit(False)
        for d in blocked_domains:
            blocked = blocked | F.lower(host).contains(d.lower())
        out = F.when(blocked, F.lit(None)).otherwise(out)
    if max_length is not None:
        out = F.substring(out, 1, max_length)
    return out
