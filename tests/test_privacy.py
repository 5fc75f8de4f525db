"""k-anonymity audit + suppression."""

from __future__ import annotations

from etl_guiacores_spark.operators.privacy import (
    k_anonymity_audit,
    suppress_below_k,
)


def _df(spark):
    rows = [
        # class (es, web): 3 rows -> satisfies k=3
        (1, "es", "web"), (2, "es", "web"), (3, "es", "web"),
        # class (en, web): 2 rows -> violates k=3
        (4, "en", "web"), (5, "en", "web"),
        # class (None, api): 1 row -> violates (nulls form a class)
        (6, None, "api"),
    ]
    return spark.createDataFrame(rows, "id long, lang string, src string")


def test_audit_sizes_and_flags(spark):
    got = {
        (r["lang"], r["src"]): (r["class_size"], r["violates"])
        for r in k_anonymity_audit(_df(spark), ["lang", "src"], 3).collect()
    }
    assert got[("es", "web")] == (3, False)
    assert got[("en", "web")] == (2, True)
    assert got[(None, "api")] == (1, True)


def test_suppress_nulls_quasi_only_in_violating_classes(spark):
    out = suppress_below_k(_df(spark), ["lang", "src"], 3)
    rows = {r["id"]: (r["lang"], r["src"]) for r in out.collect()}
    assert len(rows) == 6  # suppression never drops rows
    for i in (1, 2, 3):
        assert rows[i] == ("es", "web")  # satisfying class untouched
    for i in (4, 5, 6):
        assert rows[i] == (None, None)  # quasi cols suppressed


def test_k1_never_violates(spark):
    audit = k_anonymity_audit(_df(spark), ["lang", "src"], 1)
    assert audit.filter("violates").count() == 0


def test_bad_k_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        k_anonymity_audit(_df(spark), ["lang"], 0)


# --- l-diversity -----------------------------------------------------------

def _ldf(spark):
    rows = [
        # class (es,): 3 rows, 3 distinct sources -> diverse at l=3
        (1, "es", "a"), (2, "es", "b"), (3, "es", "c"),
        # class (en,): 3 rows but one source -> homogeneity leak
        (4, "en", "a"), (5, "en", "a"), (6, "en", "a"),
        # class (fr,): sensitive all NULL -> diversity 0, violates
        (7, "fr", None), (8, "fr", None),
    ]
    return spark.createDataFrame(rows, "id long, lang string, src string")


def test_l_diversity_flags_homogeneous_classes(spark):
    from etl_guiacores_spark.operators.privacy import l_diversity_audit

    got = {
        r["lang"]: (r["class_size"], r["n_sensitive"], r["violates"])
        for r in l_diversity_audit(_ldf(spark), ["lang"], "src", 3).collect()
    }
    assert got["es"] == (3, 3, False)
    assert got["en"] == (3, 1, True)   # large class, one sensitive value
    assert got["fr"] == (2, 0, True)   # NULL sensitive counts as nothing


def test_l_diversity_bad_l_raises(spark):
    import pytest

    from etl_guiacores_spark.operators.privacy import l_diversity_audit

    with pytest.raises(ValueError):
        l_diversity_audit(_ldf(spark), ["lang"], "src", 0)
