"""Unit tests for the pure Column-expression cleaning functions.

Mirrors the reference's per-stage unit-test intent (SURVEY §5) with
the observable behaviors of
src/transformers/business_transformer.py / src/tools/clean_data.py /
src/common/utils.py as the spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_guiacores_spark.functions import (
    business_id_from_url,
    clean_phone_list,
    clean_text,
    coerce_bool,
    coerce_long,
    format_phone_variant,
    from_na,
    normalize_phone,
    normalize_phone_list,
    normalize_url,
    scrub_social,
    split_address,
    to_na,
    total_matches,
    validate_email,
    validate_url,
)


def apply1(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r[0] for r in df.select(fn(F.col("x")).alias("y")).collect()]


class TestCleanText:
    def test_collapses_whitespace(self, spark):
        assert apply1(spark, clean_text, ["  a   b \t c \n d  "]) == ["a b c d"]

    def test_blank_and_null(self, spark):
        assert apply1(spark, clean_text, ["   ", None]) == [None, None]

    def test_idempotent(self, spark):
        once = apply1(spark, clean_text, ["x   y"])[0]
        assert apply1(spark, clean_text, [once]) == [once]


class TestNaCodec:
    def test_round_trip(self, spark):
        assert apply1(spark, from_na, ["N/A", "", "  N/A ", "ok"]) == [None, None, None, "ok"]
        assert apply1(spark, to_na, [None, "ok"]) == ["N/A", "ok"]


class TestPhone:
    def test_canonical_rule(self, spark):
        # reference: business_transformer.py:31-49 — 10 -> 3-4-3, 11 -> 2-3-3-3,
        # <10 invalid, >11 raw digits
        got = apply1(
            spark,
            normalize_phone,
            ["2991234567", "29912345678", "123456789", "(0299) 15-412-3456", None],
        )
        assert got == ["299-1234-567", "29-912-345-678", None, "0299154123456", None]

    def test_variant_rule(self, spark):
        # reference: utils.py:136-160 — 10 -> 3-3-4, 7 -> 3-4
        assert apply1(spark, format_phone_variant, ["2991234567", "4771234", ""]) == [
            "299-123-4567",
            "477-1234",
            None,
        ]

    def test_list_normalize_drops_invalid(self, spark):
        got = apply1(spark, normalize_phone_list, ["2991234567, 123, 29912345678", "1, 2"])
        assert got == ["299-1234-567, 29-912-345-678", None]

    def test_list_clean_dedupes_preserving_order(self, spark):
        # reference: tools/clean_data.py:7-28
        got = apply1(spark, clean_phone_list, ["299-123-4567, 2991234567, 477 1234"])
        assert got == ["2991234567, 4771234"]


class TestEmail:
    def test_valid_kept_invalid_nulled(self, spark):
        got = apply1(
            spark,
            validate_email,
            ["a.b+c@example.com.ar", "broken@", "no-at.net", "x y@z.com", None],
        )
        assert got == ["a.b+c@example.com.ar", None, None, None, None]


class TestUrl:
    def test_validate(self, spark):
        got = apply1(spark, validate_url, ["https://a.com/x", "ftp://h/x", "nope", "http://", None])
        assert got == ["https://a.com/x", "ftp://h/x", None, None, None]

    def test_normalize_adds_scheme(self, spark):
        got = apply1(spark, normalize_url, ["example.com/x", "HTTPS://ok.com"])
        assert got == ["https://example.com/x", "HTTPS://ok.com"]

    def test_normalize_blocklist_and_truncate(self, spark):
        fn = lambda c: normalize_url(c, blocked_domains=["guiacores.com.ar"], max_length=20)
        got = apply1(spark, fn, ["www.guiacores.com.ar/p", "averylongdomainname.com/abcdef"])
        assert got == [None, "https://averylongdom"]

    def test_scrub_social(self, spark):
        got = apply1(spark, scrub_social, ["https://GuiaCores.com.ar/x", "https://fb.com/x", None])
        assert got == [None, "https://fb.com/x", None]


class TestAddress:
    def test_split(self, spark):
        df = spark.createDataFrame(
            [("Av. Roca 742 - (8300) Neuquen",), ("Calle 10 - Centro - (8324) Cipolletti",), ("sin separador",), (None,)],
            ["a"],
        )
        direccion, localidad = split_address(F.col("a"))
        got = df.select(direccion.alias("d"), localidad.alias("l")).collect()
        assert (got[0]["d"], got[0]["l"]) == ("Av. Roca 742", "(8300) Neuquen")
        assert (got[1]["d"], got[1]["l"]) == ("Calle 10 - Centro", "(8324) Cipolletti")
        assert (got[2]["d"], got[2]["l"]) == ("sin separador", None)
        assert (got[3]["d"], got[3]["l"]) == (None, None)


class TestCoercion:
    def test_long(self, spark):
        assert apply1(spark, coerce_long, ["42", "4x2", "", None]) == [42, None, None, None]

    def test_bool(self, spark):
        assert apply1(spark, coerce_bool, ["true", " False ", "1", None]) == [
            True,
            False,
            None,
            None,
        ]


class TestIds:
    def test_business_id(self, spark):
        got = apply1(
            spark,
            business_id_from_url,
            [
                "https://www.guiacores.com.ar/index.php?r=search/detail&id=123&x=1",
                "https://www.guiacores.com.ar/index.php?r=x",
            ],
        )
        assert got == ["123", None]

    def test_total_matches(self, spark):
        got = apply1(spark, total_matches, ["Se encontraron 42 coincidencias", "nada"])
        assert got == [42, None]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_numeric_coercions_overflow_to_null(spark):
    """Digit runs past the target range return NULL (the documented
    contract) instead of throwing under ANSI."""
    from etl_guiacores_spark.functions.ids import total_matches
    from etl_guiacores_spark.functions.text import coerce_long

    d = spark.createDataFrame(
        [("123456789012345678901234567890", "99999999999 coincidencias")],
        "big string, header string",
    )
    row = d.select(
        coerce_long(F.col("big")).alias("v"),
        total_matches(F.col("header")).alias("m"),
    ).collect()[0]
    assert row["v"] is None
    assert row["m"] is None
