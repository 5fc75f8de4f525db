"""Deterministic synthetic guiacores-shaped site (driver-facing S3/X1-X10 verification).

The fetch->parse surface (SURVEY §2.1 S3/S4, §2.2 X1-X10) is
pytest-verified but its correctness deserves the same EXTERNAL check
as every other operator family: an end-to-end row in the driver's
oracle compare. That needs a page source that is (a) reachable from
executors with no network, (b) deterministic, and (c) invertible —
every extracted field a closed-form function of the business id, so
an ANSI-SQL oracle can constant-fold the expected parse output
without running the parser.

``synthetic_site_transport`` is that source: a :mod:`fetch`-compatible
transport whose detail page for ``id=N`` exercises every X1-X10
selector the reference scrapes (reference:
src/extractors/bulk_scraper.py:90-103) — name anchor, address span,
one or two ``tel:`` anchors, a whatsapp link with/without the phone
query param, itemprop/facebook/instagram/contact links, the
fa-clock + badge-token horarios path, multi-value rubros inside the
list-view block, description paragraph, and map data-lat/lng
attributes — plus a deterministic outage (``N % 97 == 0``) so the R1
retry and R2 quarantine columns are externally checked too.
"""

from __future__ import annotations

import re

from etl_guiacores_spark.sources.fetch import Transport
from etl_guiacores_spark.sources.html_parse import DETAIL_URL_BASE

__all__ = [
    "DETAIL_URL_BASE",
    "LISTING_URL_BASE",
    "FAIL_MOD",
    "synthetic_detail_page",
    "synthetic_listing_page",
    "synthetic_site_transport",
]

#: listing (search-results) URL prefix served by the same transport
LISTING_URL_BASE = "https://www.guiacores.com.ar/index.php?r=search/index&page="

_ID_RE = re.compile(r"[?&]id=(\d+)")
_PAGE_RE = re.compile(r"[?&]page=(\d+)")

#: every (N % FAIL_MOD == 0) fetch raises — exercises retry + quarantine
FAIL_MOD = 97


def synthetic_detail_page(n: int) -> str:
    """Detail page whose every field is a closed-form function of ``n``."""
    tel2 = f'<a href="tel:15-4{n + 1:06d}">15-4{n + 1:06d}</a>' if n % 2 == 0 else ""
    wa = (
        f'<a href="https://api.whatsapp.com/send?phone=549342{n % 1000000:06d}">WhatsApp</a>'
        if n % 3 != 0
        else ""
    )
    sitio = (
        f'<a itemprop="url" href="https://negocio-{n}.example.com">web</a>'
        if n % 3 == 0
        else ""
    )
    email = (
        f'<a onclick="irContacto()">contacto{n}@example.com</a>' if n % 4 == 0 else ""
    )
    fb = f'<a href="https://facebook.com/negocio{n}">fb</a>' if n % 5 == 0 else ""
    ig = f'<a href="https://instagram.com/negocio{n}">ig</a>' if n % 6 == 0 else ""
    # odd ids carry hours behind the clock icon, with an "Abierto"
    # badge token the X7 extractor must strip
    hor = (
        f'<i class="far fa-clock"></i><span>Abierto Lun a Vie de {8 + n % 3} a 17</span>'
        if n % 2 == 1
        else ""
    )
    extra = f'<a class="search-result-link">Extra {n % 3}</a>' if n % 10 == 0 else ""
    return (
        "<html><body>"
        f'<a class="search-result-name" href="#"><h1>Negocio {n}</h1></a>'
        f'<span class="search-result-address">Calle {n % 90 + 1} Nro {n * 7 % 10000}</span>'
        f'<a href="tel:+54 342 4{n:06d}">+54 342 4{n:06d}</a>{tel2}{wa}{sitio}{email}{fb}{ig}{hor}'
        f'<p class="search-result-description">Proveedor numero {n} de servicios</p>'
        f'<div class="map" data-lat="-31.{n % 10000:04d}" data-lng="-60.{(n * 3) % 10000:04d}"></div>'
        f'<div class="list-view"><a class="search-result-link">Rubro {n % 7}</a>{extra}</div>'
        "</body></html>"
    )


def synthetic_listing_page(k: int) -> str:
    """Search-results page ``k`` (S6 shape): detail links for ids
    ``k*10 .. k*10+9``, a duplicate link of the first id (the D2
    keep-first-within-page case), and an overlap link ``k*10+10``
    (page ``k+1``'s first id — the cross-page dedupe case). Half the
    hrefs use the HTML-escaped ``&amp;`` separator so both branches
    of the parser's href regex are exercised."""
    first = k * 10

    def link(n: int, escaped: bool) -> str:
        sep = "&amp;" if escaped else "&"
        return (
            f'<a href="/index.php?r=search/detail{sep}id={n}">'
            f"Negocio {n}</a>"
        )

    links = [link(first + j, escaped=j % 2 == 1) for j in range(10)]
    links.append(link(first, escaped=True))      # intra-page duplicate
    links.append(link(first + 10, escaped=False))  # overlap with page k+1
    return (
        "<html><body><div class='search-results'>"
        + "".join(links)
        + "</div></body></html>"
    )


def synthetic_site_transport() -> Transport:
    """Transport factory for :func:`fetch.fetch_pages` — one per
    partition, stateless (determinism needs no session). Serves
    detail pages for ``id=`` URLs and search-results pages for
    ``page=`` URLs."""

    def fetch(url: str) -> str:
        m = _ID_RE.search(url or "")
        if m:
            n = int(m.group(1))
            if n % FAIL_MOD == 0:
                raise IOError(f"synthetic outage id={n}")
            return synthetic_detail_page(n)
        m = _PAGE_RE.search(url or "")
        if m:
            return synthetic_listing_page(int(m.group(1)))
        raise IOError(f"404 {url}")

    return fetch


# executor-side importability: mapInPandas closures must not import
# the package on workers (same pattern as html_parse / fetch)
from etl_guiacores_spark import shipping as _shipping  # noqa: E402
import sys as _sys  # noqa: E402

_shipping.register_udf_module(_sys.modules[__name__])
