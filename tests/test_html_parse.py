"""Parser fixtures reconstructed from the reference's selectors
(SURVEY §5 item 5; FIXTURES.md §7)."""

from __future__ import annotations

from etl_guiacores_spark.sources.html_parse import (
    parse_detail_html,
    parse_pages,
    parse_search_results,
)

DETAIL_HTML = """
<html><body>
  <a class="search-result-name" href="#"><h1>Panadería  La Espiga</h1></a>
  <span class="search-result-address">Av. Argentina 123 - (8300) Neuquén</span>
  <a href="tel:+2991234567">299 123-4567</a>
  <a href="tel:+2994771234">299 477-1234</a>
  <a href="https://api.whatsapp.com/send?phone=5492991234567&text=hola">WhatsApp</a>
  <a itemprop="url" href="https://laespiga.com.ar">sitio</a>
  <a onclick="irContacto()" href="#">info@laespiga.com.ar</a>
  <a href="https://www.facebook.com/laespiga">fb</a>
  <a href="https://www.instagram.com/laespiga">ig</a>
  <i class="far fa-clock"></i><span>Lun a Vie 8-20 Cerrado</span>
  <div id="yw0" class="list-view"><div class="items">
    <a class="search-result-link" href="#">Panaderías</a>
    <a class="search-result-link" href="#">Confiterías</a>
  </div></div>
  <p class="search-result-description">Pan artesanal.</p>
  <div class="map" data-lat="-38.9516" data-lng="-68.0591"></div>
</body></html>
"""


class TestDetailParser:
    def test_all_fields(self):
        rec = parse_detail_html(DETAIL_HTML)
        assert rec["nombre"] == "Panadería La Espiga"
        assert rec["direccion"] == "Av. Argentina 123 - (8300) Neuquén"
        assert rec["telefonos"] == "299 123-4567, 299 477-1234"
        assert rec["whatsapp"] == "5492991234567"
        assert rec["sitio_web"] == "https://laespiga.com.ar"
        assert rec["email"] == "info@laespiga.com.ar"
        assert rec["facebook"] == "https://www.facebook.com/laespiga"
        assert rec["instagram"] == "https://www.instagram.com/laespiga"
        assert rec["horarios"] == "Lun a Vie 8-20"
        assert rec["rubros"] == "Panaderías, Confiterías"
        assert rec["descripcion"] == "Pan artesanal."
        assert rec["latitud"] == "-38.9516"
        assert rec["longitud"] == "-68.0591"

    def test_empty_and_malformed(self):
        assert parse_detail_html("")["nombre"] is None
        assert parse_detail_html("<div><a <<<")["nombre"] is None

    def test_non_contact_email_link_ignored(self):
        rec = parse_detail_html('<a onclick="irContacto()">sin arroba</a>')
        assert rec["email"] is None


class TestSearchResults:
    def test_extracts_unique_ids(self):
        html = (
            '<a href="index.php?r=search/detail&id=11">a</a>'
            '<a href="index.php?r=search/detail&amp;id=22">b</a>'
            '<a href="index.php?r=search/detail&id=11">dup</a>'
        )
        got = parse_search_results(html)
        assert [bid for bid, _ in got] == ["11", "22"]
        assert all("id=" in url for _, url in got)


class TestParsePagesStage:
    def test_mapinpandas_schema_and_values(self, spark):
        df = spark.createDataFrame(
            [("https://x/index.php?r=search/detail&id=77", DETAIL_HTML)], ["url", "html"]
        )
        got = parse_pages(df).collect()
        assert len(got) == 1
        assert got[0]["id_negocio"] == "77"
        assert got[0]["nombre"] == "Panadería La Espiga"


class TestNestedMarkupCapture:
    """Captured fields must survive nested elements — a capture ends
    when ITS element closes, not on the first end tag of any child."""

    def test_phone_with_nested_icon(self):
        from etl_guiacores_spark.sources.html_parse import parse_detail_html

        r = parse_detail_html(
            "<a href='tel:+2994123456'><i class='fa'></i>299-412-3456</a>"
        )
        assert r["telefonos"] == "299-412-3456"

    def test_name_with_inline_bold(self):
        from etl_guiacores_spark.sources.html_parse import parse_detail_html

        r = parse_detail_html(
            '<a class="search-result-name"><h1>Biz <b>Bold</b> Name</h1></a>'
        )
        assert r["nombre"] == "Biz Bold Name"

    def test_overlapping_captures_each_get_full_subtree(self):
        from etl_guiacores_spark.sources.html_parse import parse_detail_html

        r = parse_detail_html(
            '<span class="search-result-address">Calle '
            '<a href="tel:123456789">123-456</a> x</span>'
        )
        assert r["direccion"] == "Calle 123-456 x"
        assert r["telefonos"] == "123-456"

    def test_unclosed_capture_flushes_at_eof(self):
        from etl_guiacores_spark.sources.html_parse import parse_detail_html

        r = parse_detail_html('<span class="search-result-address">Calle 77')
        assert r["direccion"] == "Calle 77"


class TestStrayEndTags:
    def test_stray_end_tag_does_not_truncate_capture(self):
        # html.parser reports </br> as an end tag with no open element;
        # it must be ignored, not drain the stack and force-finish the
        # address capture mid-field
        rec = parse_detail_html(
            '<span class="search-result-address">Calle 5</br>Piso 2</span>'
        )
        # both halves survive; the separator-free join matches the
        # reference's get_text(strip=True) concatenation
        assert rec["direccion"] == "Calle 5Piso 2"

    def test_stray_end_tag_keeps_ancestor_tracking(self):
        # a spurious </p> inside list-view must not reset _in_list_view
        # — the rubros after it still belong to the list
        html = (
            '<div class="list-view"><div>'
            "</p>"
            '<a class="search-result-link" href="#">Panaderías</a>'
            "</div></div>"
        )
        rec = parse_detail_html(html)
        assert rec["rubros"] == "Panaderías"
