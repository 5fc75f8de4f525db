"""Fetch stage: retries, rate limiting, row-level error isolation."""

from __future__ import annotations

from etl_guiacores_spark.sources.fetch import RateLimiter, fake_transport, fetch_pages


def make_urls(spark, n=4):
    return spark.createDataFrame(
        [(str(i), f"https://example.com/{i}") for i in range(n)], ["id_negocio", "url"]
    )


class TestFetchPages:
    def test_success_and_row_level_failure(self, spark):
        urls = make_urls(spark, 4)
        factory = lambda: fake_transport(
            pages={f"https://example.com/{i}": f"<html>{i}</html>" for i in range(3)},
        )
        got = {r["id_negocio"]: r for r in fetch_pages(urls, factory, max_attempts=2).collect()}
        assert got["0"]["html"] == "<html>0</html>" and got["0"]["fetch_error"] is None
        assert got["0"]["attempts"] == 1
        # url 3 missing from fake corpus -> quarantined row, not a task failure
        assert got["3"]["html"] is None
        assert "404" in got["3"]["fetch_error"]
        assert got["3"]["attempts"] == 2  # R1 retried

    def test_partition_fanout(self, spark):
        urls = make_urls(spark, 8)
        got = fetch_pages(urls, lambda: fake_transport(), num_partitions=4).collect()
        assert len(got) == 8 and all(r["html"] for r in got)


class TestRateLimiter:
    def test_spacing(self):
        t = {"now": 0.0}
        slept = []
        rl = RateLimiter(2.0, clock=lambda: t["now"], sleep=lambda s: slept.append(s))
        rl.wait()  # first call free
        rl.wait()  # must wait 0.5s
        assert slept == [0.5]

    def test_disabled(self):
        rl = RateLimiter(0.0, clock=lambda: 0.0, sleep=lambda s: (_ for _ in ()).throw(AssertionError))
        rl.wait()
        rl.wait()


class TestSyntheticSite:
    """The driver-facing q201 source (sources/synthetic.py): a
    deterministic, invertible guiacores-shaped site."""

    def test_page_fields_are_closed_forms(self):
        from etl_guiacores_spark.sources.html_parse import parse_detail_html
        from etl_guiacores_spark.sources.synthetic import synthetic_detail_page

        rec = parse_detail_html(synthetic_detail_page(12))
        assert rec["nombre"] == "Negocio 12"
        assert rec["telefonos"] == "+54 342 4000012, 15-4000013"
        assert rec["whatsapp"] is None  # 12 % 3 == 0 -> itemprop site instead
        assert rec["sitio_web"] == "https://negocio-12.example.com"
        assert rec["email"] == "contacto12@example.com"
        assert rec["instagram"] == "https://instagram.com/negocio12"
        assert rec["latitud"] == "-31.0012" and rec["longitud"] == "-60.0036"
        # odd id: hours captured with the Abierto badge token stripped
        rec = parse_detail_html(synthetic_detail_page(5))
        assert rec["horarios"] == "Lun a Vie de 10 a 17"
        assert rec["facebook"] == "https://facebook.com/negocio5"

    def test_transport_outage_and_unkeyed_url(self):
        import pytest

        from etl_guiacores_spark.sources.synthetic import (
            DETAIL_URL_BASE,
            synthetic_site_transport,
        )

        t = synthetic_site_transport()
        assert "Negocio 5" in t(DETAIL_URL_BASE + "5")
        with pytest.raises(IOError, match="synthetic outage id=97"):
            t(DETAIL_URL_BASE + "97")
        with pytest.raises(IOError, match="404"):
            t("https://example.com/no-id-param")

    def test_listing_page_and_batch_parse(self, spark):
        from etl_guiacores_spark.sources.html_parse import (
            parse_listing_pages,
            parse_search_results,
        )
        from etl_guiacores_spark.sources.synthetic import (
            LISTING_URL_BASE,
            synthetic_listing_page,
            synthetic_site_transport,
        )

        # page 3 lists 30..39 keep-first (intra-page dup of 30
        # collapsed) plus the overlap id 40; both & and &amp; hrefs
        pairs = parse_search_results(synthetic_listing_page(3))
        assert [int(b) for b, _ in pairs] == list(range(30, 41))
        t = synthetic_site_transport()
        assert "search/detail" in t(LISTING_URL_BASE + "3")
        # batch stage keeps the source page for discovery accounting
        df = spark.createDataFrame(
            [(LISTING_URL_BASE + "3", synthetic_listing_page(3)),
             (LISTING_URL_BASE + "4", synthetic_listing_page(4))],
            ["url", "html"],
        )
        got = parse_listing_pages(df).collect()
        assert len(got) == 22
        # id 40 discovered from BOTH pages (overlap + page 4's first)
        pages_for_40 = {r["page_url"] for r in got if r["id_negocio"] == "40"}
        assert len(pages_for_40) == 2
