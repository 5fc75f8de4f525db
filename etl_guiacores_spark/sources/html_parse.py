"""HTML detail-page / search-results parsing (SURVEY §2.2, X1-X10, S6).

The reference parses with BeautifulSoup selectors in three divergent
copies (reference: src/extractors/bulk_scraper.py:64-192,
sequential_scraper.py:200-308, manual_scraper.py:80-180); the engine
collapses them into ONE parser built on the stdlib HTMLParser (no
external deps) and exposes it as an Arrow-batched ``mapInPandas``
stage, so parsing runs vectorized per partition on executors.

Selector semantics reproduced (reference: bulk_scraper.py:90-103):
- nombre:    ``a.search-result-name h1`` text                  (X1)
- direccion: ``span.search-result-address`` text               (X1)
- telefonos: all ``a[href^="tel:"]`` texts                     (X2)
- whatsapp:  phone query-param of an api.whatsapp.com link,
             digit-regex fallback on the link text             (X3)
- sitio_web: ``a[itemprop="url"]`` href                        (X4)
- email:     contact link text containing '@'                  (X5)
- facebook/instagram: first ``a[href*=domain]``                (X6)
- horarios:  text after an ``i.far.fa-clock`` icon, minus
             Cerrado/Abierto tokens                            (X7)
- rubros:    ``.search-result-link`` texts inside the
             ``div.list-view`` category block                  (X8)
- lat/lng:   ``div.map`` data-lat / data-lng attributes        (X9)
- search results: ``a[href*="r=search/detail"]`` → (id, url)   (S6)
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DETAIL_FIELDS = [
    "nombre",
    "direccion",
    "telefonos",
    "whatsapp",
    "sitio_web",
    "email",
    "facebook",
    "instagram",
    "horarios",
    "rubros",
    "descripcion",
    "latitud",
    "longitud",
]

PARSED_SCHEMA = T.StructType(
    [T.StructField("id_negocio", T.StringType()), T.StructField("url", T.StringType())]
    + [T.StructField(f, T.StringType()) for f in DETAIL_FIELDS]
)

#: canonical detail-page URL prefix — the single source for the URL
#: shape (cli.py worklists, sources/synthetic.py, q201's oracle all
#: derive from it; _DETAIL_HREF_RE below recognizes the same shape)
DETAIL_URL_BASE = "https://www.guiacores.com.ar/index.php?r=search/detail&id="

_DETAIL_HREF_RE = re.compile(r"r=search/detail(?:&|&amp;)id=(\d+)")
_DIGITS_RE = re.compile(r"\d+")
_WA_PHONE_RE = re.compile(r"[?&]phone=(\d+)")


class _DetailPageParser(HTMLParser):
    """Single-pass SAX-style extraction of every X1-X10 field."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.fields: dict[str, object] = {f: None for f in DETAIL_FIELDS}
        self.fields["telefonos"] = []
        self.fields["rubros"] = []
        self._stack: list[tuple[str, dict]] = []
        #: active captures as [key, stack-depth-at-start, text parts];
        #: a capture ends when ITS element closes (depth drops below
        #: the recorded depth), so nested markup (<b>, icons, <br/>)
        #: keeps contributing text instead of truncating the field —
        #: and overlapping captures (a tel: anchor inside the address
        #: span) each collect their full subtree like the reference's
        #: BeautifulSoup get_text() did
        self._captures: list[list] = []
        self._in_name_anchor = 0
        self._in_list_view = 0
        self._clock_pending = False

    @staticmethod
    def _classes(attrs: dict) -> set[str]:
        return set((attrs.get("class") or "").split())

    def handle_starttag(self, tag: str, attrs_list) -> None:
        attrs = dict(attrs_list)
        classes = self._classes(attrs)
        href = attrs.get("href") or ""
        self._stack.append((tag, attrs))

        if tag == "a":
            if "search-result-name" in classes:
                self._in_name_anchor = len(self._stack)
            if href.startswith("tel:"):
                self._begin_capture("telefonos")
            elif "api.whatsapp.com" in href:
                m = _WA_PHONE_RE.search(href)
                if m:
                    self.fields["whatsapp"] = m.group(1)
                else:
                    self._begin_capture("whatsapp")  # digit fallback on text
            elif attrs.get("itemprop") == "url" and self.fields["sitio_web"] is None:
                self.fields["sitio_web"] = href or None
            elif "facebook.com" in href and self.fields["facebook"] is None:
                self.fields["facebook"] = href
            elif "instagram.com" in href and self.fields["instagram"] is None:
                self.fields["instagram"] = href
            elif attrs.get("onclick") == "irContacto()":
                self._begin_capture("email")
            elif self._in_list_view and "search-result-link" in classes:
                self._begin_capture("rubros")
        elif tag == "h1" and self._in_name_anchor:
            self._begin_capture("nombre")
        elif tag == "span" and "search-result-address" in classes:
            self._begin_capture("direccion")
        elif tag == "span" and self._clock_pending:
            self._begin_capture("horarios")
            self._clock_pending = False
        elif tag == "i" and {"far", "fa-clock"} <= classes:
            self._clock_pending = True
        elif tag == "div":
            if "list-view" in classes:
                self._in_list_view = len(self._stack)
            if "map" in classes:
                if attrs.get("data-lat"):
                    self.fields["latitud"] = attrs["data-lat"]
                if attrs.get("data-lng"):
                    self.fields["longitud"] = attrs["data-lng"]
        elif tag == "p" and "search-result-description" in classes:
            self._begin_capture("descripcion")

    def handle_endtag(self, tag: str) -> None:
        # a stray end tag with NO matching open element (</br>, a
        # spurious </p>) must be ignored outright — letting the
        # implicit-close loop below run would drain the whole stack,
        # force-finishing every active capture and resetting ancestor
        # tracking for the rest of the page
        if not any(frame[0] == tag for frame in self._stack):
            return
        while self._stack and self._stack[-1][0] != tag:
            self._stack.pop()
        depth = len(self._stack)
        if self._stack:
            self._stack.pop()
        new_depth = len(self._stack)
        if self._captures:
            remaining = []
            for cap in self._captures:
                if new_depth < cap[1]:  # the capturing element closed
                    self._finish_capture(cap[0], cap[2])
                else:
                    remaining.append(cap)
            self._captures = remaining
        if self._in_name_anchor and depth <= self._in_name_anchor:
            self._in_name_anchor = 0
        if self._in_list_view and depth <= self._in_list_view:
            self._in_list_view = 0

    def handle_data(self, data: str) -> None:
        for cap in self._captures:
            cap[2].append(data)

    def close(self) -> None:
        super().close()
        # malformed HTML may never close a captured element — flush at
        # EOF so the text gathered so far is kept, not dropped
        for key, _, parts in self._captures:
            self._finish_capture(key, parts)
        self._captures = []

    def _begin_capture(self, key: str) -> None:
        self._captures.append([key, len(self._stack), []])

    def _finish_capture(self, key: str, parts: list[str]) -> None:
        text = " ".join("".join(parts).split())
        if not text:
            return
        if key == "telefonos":
            self.fields["telefonos"].append(text)
        elif key == "rubros":
            self.fields["rubros"].append(text)
        elif key == "email":
            if "@" in text and self.fields["email"] is None:  # X5 guard
                self.fields["email"] = text
        elif key == "whatsapp":
            m = _DIGITS_RE.search(text)  # X3 fallback
            if m and self.fields["whatsapp"] is None:
                self.fields["whatsapp"] = m.group(0)
        elif key == "horarios":
            # X7: strip open/closed badge tokens
            cleaned = re.sub(r"Cerrado|Abierto", "", text).strip()
            if cleaned and self.fields["horarios"] is None:
                self.fields["horarios"] = cleaned
        elif self.fields.get(key) is None:
            self.fields[key] = text


def parse_detail_html(html: str) -> dict[str, str | None]:
    """Parse one detail page into the flat string record shape the
    reference emits (comma-joined multi-values, SURVEY §1.2)."""
    p = _DetailPageParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # R2: malformed page -> partial/null fields, never a task failure
    out = dict(p.fields)
    out["telefonos"] = ", ".join(out["telefonos"]) or None
    out["rubros"] = ", ".join(out["rubros"]) or None
    return out


def parse_search_results(html: str) -> list[tuple[str, str]]:
    """S6 — (id_negocio, detail_url) pairs from a listing page
    (reference: src/extractors/manual_scraper.py:46-78)."""
    seen: dict[str, str] = {}
    for m in _DETAIL_HREF_RE.finditer(html or ""):
        bid = m.group(1)
        if bid not in seen:  # D2 keep-first within the page
            seen[bid] = f"{DETAIL_URL_BASE}{bid}"
    return list(seen.items())


def parse_pages(df: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """Arrow-batched parse stage: DataFrame[url, html] -> PARSED_SCHEMA.

    ``mapInPandas`` keeps parsing on executors with one Python worker
    per partition — the Spark-native replacement for the reference's
    process pool (reference: src/extractors/bulk_scraper.py:245-247).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                rec = parse_detail_html(html)
                u = url or ""
                if "id=" in u:
                    m = _DIGITS_RE.search(u.rsplit("id=", 1)[-1])
                    bid = m.group(0) if m else None
                elif u.startswith("file:") or ("://" not in u and u.endswith(".html")):
                    # scan_html_dir rows carry a FILE path, not a query
                    # URL — take the last digit run of the basename
                    # (pagina_77.html -> 77) so manual --file mode
                    # yields keyed rows instead of quarantining 100%.
                    # Gated to local files ONLY: a WEB url without id=
                    # (a listing page, /page2) must stay unkeyed and
                    # quarantine, not receive a fabricated id that
                    # collides and gets silently dropped by dedupe
                    hits = _DIGITS_RE.findall(u.rsplit("/", 1)[-1])
                    bid = hits[-1] if hits else None
                else:
                    bid = None
                rec["id_negocio"] = bid
                rec["url"] = url
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in PARSED_SCHEMA.fields])

    return df.mapInPandas(run, PARSED_SCHEMA)


LISTING_SCHEMA = T.StructType(
    [
        T.StructField("page_url", T.StringType()),
        T.StructField("id_negocio", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def parse_listing_pages(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """S6 as a batch stage: DataFrame[url, html] of SEARCH-RESULTS
    pages -> one row per discovered (id_negocio, detail url), with
    the source listing page kept as ``page_url`` so discovery
    accounting (which page surfaced which business) stays queryable.
    Intra-page duplicate links collapse keep-first inside
    :func:`parse_search_results` (D2); cross-PAGE duplicates are the
    caller's distinct/groupBy — same split as the reference, which
    dedupes per page while scrolling and globally when consolidating
    (reference: src/extractors/manual_scraper.py:46-78). Arrow-batched
    ``mapInPandas``, one Python worker per partition, like
    :func:`parse_pages`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for page_url, html in zip(pdf[url_col], pdf[html_col]):
                for bid, durl in parse_search_results(html):
                    rows.append(
                        {"page_url": page_url, "id_negocio": bid, "url": durl}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in LISTING_SCHEMA.fields]
            )

    return df.mapInPandas(run, LISTING_SCHEMA)


def scan_html_dir(spark, path: str) -> DataFrame:
    """S5 — local HTML directory scan: one row per file (url=file path,
    html=content). The reference reads these raw without parsing
    (defect #3, reference: src/main.py:174-181); here the scan feeds
    parse_pages so the intended parse actually happens."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(f"{path}/*.html", wholetext=True)
        .withColumn("url", F.input_file_name())
        .withColumnRenamed("value", "html")
        .select("url", "html")
    )


# executor-side importability: serialize this module's functions by
# value so mapInPandas closures never import the package on workers
from etl_guiacores_spark import shipping as _shipping  # noqa: E402
import sys as _sys  # noqa: E402

_shipping.register_udf_module(_sys.modules[__name__])
