"""k-anonymity auditing and suppression over quasi-identifiers.

A corpus that ships as training data carries re-identification risk
through QUASI-IDENTIFIER combinations — columns individually harmless
(language, source, a coarse size bucket) whose joint value can be
unique enough to point at one record. The reference pipeline scrubs
direct identifiers only (social links, phones —
/root/reference/src/etl/transformers.py); k-anonymity is the standard
generalization the privacy literature (Sweeney 2002) applies to the
indirect ones: every released record must share its quasi-identifier
combination with at least k-1 others.

Two operators, both plain relational:

- ``k_anonymity_audit``: one map-side-combinable groupBy to
  equivalence classes (quasi-combo -> class size) with a violation
  flag — the report a release review reads.
- ``suppress_below_k``: the enforcement pass — rows in violating
  classes get their quasi columns nulled (suppression, the simplest
  generalization step). One aggregate + one equi-join back on the
  quasi key; AQE broadcasts the class table when it is small, which
  it is by construction (bounded by combo cardinality, not rows).

Determinism: both outputs are pure functions of the data (counts and
equality joins, no sampling), so they hash identically across
engines, partitionings, and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Equivalence classes over ``quasi_cols`` with their sizes and a
    ``violates`` flag (class smaller than ``k``). NULL quasi values
    form their own classes (SQL GROUP BY semantics — identically on
    Spark and DuckDB), which is the conservative choice: a null combo
    shared by few rows is still a fingerprint.

    Returns (quasi_cols..., class_size, violates).
    """
    if k < 1:
        raise ValueError("k_anonymity_audit requires k >= 1")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("class_size")
    ).withColumn("violates", F.col("class_size") < F.lit(k))


def suppress_below_k(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Null out every quasi-identifier column on rows whose
    equivalence class has fewer than ``k`` members; all other columns
    and the row count are preserved (suppression never drops data,
    it coarsens it). Null-safe on the join key via a null-safe
    equality predicate so NULL-valued classes are suppressed
    correctly too.
    """
    classes = (
        k_anonymity_audit(df, quasi_cols, k)
        .filter("violates")
        .select(
            *[F.col(c).alias(f"__k_{c}") for c in quasi_cols], "violates"
        )
    )
    pred = None
    for c in quasi_cols:
        term = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        pred = term if pred is None else (pred & term)
    return df.join(classes, pred, "left").select(
        *[
            F.when(F.col("violates").isNotNull(), F.lit(None)).otherwise(F.col(c)).alias(c)
            if c in quasi_cols
            else F.col(c)
            for c in df.columns
        ]
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    diversity: int,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala 2007): k-anonymity
    stops an attacker from singling a record out, but a class whose
    members all share one SENSITIVE value still leaks it (homogeneity
    attack — "every document in this small bucket came from the same
    crawl source"). Distinct l-diversity additionally requires every
    equivalence class to carry at least ``diversity`` distinct
    sensitive values.

    One map-side-combinable groupBy over the quasi columns with an
    exact COUNT(DISTINCT sensitive) — at 100 TB the class table is
    bounded by quasi-combo cardinality, and the distinct is a
    two-phase partial aggregate, never a row-wise shuffle of the
    sensitive payload. NULL sensitive values are not counted as a
    distinct value (COUNT DISTINCT semantics, identical on both
    engines), the conservative read: a class of all-NULL sensitives
    has diversity 0.

    Returns (quasi_cols..., class_size, n_sensitive, violates).
    """
    if diversity < 1:
        raise ValueError("l_diversity_audit requires diversity >= 1")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("class_size"),
        F.countDistinct(sensitive_col).cast("long").alias("n_sensitive"),
    ).withColumn("violates", F.col("n_sensitive") < F.lit(diversity))
