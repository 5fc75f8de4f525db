"""JS-executing browser transport seam (SURVEY §2.1 S7, sequential mode).

The reference's sequential mode drives a real browser: open the search
page, apply advanced-search filters (rubro/localidad dropdowns, the
``Tm=1`` empresas filter), then click "Ver más" until no new results
appear (reference: src/extractors/sequential_collector.py:243-412,
452-561). ``requests``-style transports cannot execute the JS that
grows the listing, so that path needs a browser.

Engine shape: JS stays OUT of the distributed plan. A ``JsTransport``
renders successive listing states (driver-side, or inside one fetch
partition); every rendered state is parsed into a small DataFrame
batch and fed to ``discover_until_idle``, so dedupe-across-rounds,
accumulation, and the idle stop-condition all stay in Spark. A real
deployment injects ``selenium_transport``; tests and offline runs use
``FakeJsListingTransport`` — same seam, deterministic listing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

from etl_guiacores_spark.sources.html_parse import parse_search_results

# Reference selector constants (sequential_collector.py:28-40): the
# form controls the browser drives. Kept here so a webdriver-backed
# transport and the fake agree on the surface being automated.
SEARCH_URL = "https://www.guiacores.com.ar/index.php?r=search%2Findex"
VER_MAS_SELECTOR = "#btnSearchMore"
ADVANCED_BUTTON_SELECTOR = "a[data-target='#modalBusquedaAvanzada']"
RUBRO_SELECT_SELECTOR = "#searchadvanced-idrubro"
LOCALIDAD_SELECT_SELECTOR = "#searchadvanced-idlocalidad"
ADVANCED_SUBMIT_SELECTOR = "#botonBuscarAvanzada"
# the modal FORM itself (reference sequential_collector.py:53 —
# '#formBusquedaAvazada', sic): the element whose disappearance
# signals the filtered search applied. The trigger anchor above stays
# in the page after the modal closes, so waiting on it never fires.
ADVANCED_MODAL_SELECTOR = "#formBusquedaAvazada"
RESULT_NAME_SELECTOR = ".search-result-name"
EMPRESAS_FILTER = {"Tm": "1"}  # listing restricted to empresas


class JsTransport(Protocol):
    """Minimal browser surface the discovery loop needs."""

    def open_listing(self, url: str, filters: dict[str, str]) -> str:
        """Navigate to the search page, apply form filters, return the
        rendered listing HTML."""
        ...

    def load_more(self) -> str | None:
        """Click "Ver más"; return the re-rendered listing HTML, or
        None when the button is gone/disabled (listing exhausted)."""
        ...

    def close(self) -> None: ...


def selenium_transport(
    headless: bool = True, load_timeout: float = 10.0
) -> "JsTransport":
    """Webdriver-backed JsTransport (requires selenium + a browser;
    neither ships in this container, so construction is import-gated).

    Mirrors the reference's driver loop: open → fill the advanced-search
    modal (reference: sequential_collector.py:243-412) → click
    ``#btnSearchMore`` per round (:452-561).
    """
    try:
        from selenium import webdriver
        from selenium.webdriver.common.by import By
        from selenium.webdriver.support import expected_conditions as EC
        from selenium.webdriver.support.ui import Select, WebDriverWait
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "selenium_transport needs the 'selenium' package and a browser; "
            "inject FakeJsListingTransport (or any JsTransport) instead"
        ) from e

    class _SeleniumTransport:
        def __init__(self) -> None:
            opts = webdriver.ChromeOptions()
            if headless:
                opts.add_argument("--headless=new")
            self.driver = webdriver.Chrome(options=opts)
            self.wait = WebDriverWait(self.driver, load_timeout)

        def open_listing(self, url: str, filters: dict[str, str]) -> str:
            from urllib.parse import urlencode

            selector_by_field = {
                "rubro": RUBRO_SELECT_SELECTOR,
                "localidad": LOCALIDAD_SELECT_SELECTOR,
            }
            query_filters = {k: v for k, v in filters.items() if k in ("Tm",)}
            form = {k: v for k, v in filters.items() if k not in query_filters}
            # validate BEFORE driving the browser: an unknown key
            # mid-modal would otherwise kill the crawl with a KeyError
            unknown = sorted(set(form) - set(selector_by_field))
            if unknown:
                raise ValueError(
                    f"unknown listing filter(s) {unknown}; valid form "
                    f"fields: {sorted(selector_by_field)} (plus query "
                    f"param 'Tm')"
                )
            if query_filters:
                url = f"{url}&{urlencode(query_filters)}"
            self.driver.get(url)
            if form:
                self.wait.until(
                    EC.element_to_be_clickable(
                        (By.CSS_SELECTOR, ADVANCED_BUTTON_SELECTOR)
                    )
                ).click()
                for fieldname, wanted in form.items():
                    sel = Select(
                        self.wait.until(
                            EC.presence_of_element_located(
                                (By.CSS_SELECTOR, selector_by_field[fieldname])
                            )
                        )
                    )
                    sel.select_by_visible_text(wanted)
                # APPLY the search: selecting alone filters nothing —
                # the reference clicks #botonBuscarAvanzada and waits
                # for the modal to go away (sequential_collector.py:
                # 354-361); without this the returned HTML is the
                # unfiltered listing under an open modal
                self.wait.until(
                    EC.element_to_be_clickable(
                        (By.CSS_SELECTOR, ADVANCED_SUBMIT_SELECTOR)
                    )
                ).click()
                try:
                    self.wait.until(
                        EC.invisibility_of_element_located(
                            (By.CSS_SELECTOR, ADVANCED_MODAL_SELECTOR)
                        )
                    )
                except Exception:
                    pass  # modal close animation timing — listing wait below decides
            # the listing is JS-rendered: reading page_source straight
            # after get()/submit can observe an empty page and start
            # discovery from nothing; tolerate a genuinely empty result
            # on timeout
            try:
                self.wait.until(
                    EC.presence_of_element_located(
                        (By.CSS_SELECTOR, RESULT_NAME_SELECTOR)
                    )
                )
            except Exception:
                pass
            return self.driver.page_source

        def load_more(self) -> str | None:
            try:
                btn = self.driver.find_element(By.CSS_SELECTOR, VER_MAS_SELECTOR)
            except Exception:
                return None
            if not btn.is_displayed() or not btn.is_enabled():
                return None
            n_before = len(
                self.driver.find_elements(By.CSS_SELECTOR, ".search-result-name")
            )
            btn.click()
            # the click fires an async request; reading page_source
            # immediately would observe the pre-click listing and make
            # the idle counter terminate early. Wait for growth; on
            # timeout return the current state and let the caller's
            # idle-rounds logic decide.
            try:
                self.wait.until(
                    lambda d: len(
                        d.find_elements(By.CSS_SELECTOR, ".search-result-name")
                    )
                    > n_before
                )
            except Exception:
                pass
            return self.driver.page_source

        def close(self) -> None:
            self.driver.quit()

    return _SeleniumTransport()


class FakeJsListingTransport:
    """Deterministic JsTransport over a synthetic business universe.

    Semantics mirror the real site: the listing starts with one page,
    every "Ver más" click re-renders the FULL accumulated listing (so
    later rounds repeat earlier rows — the dedupe-across-rounds path is
    genuinely exercised); ``Tm=1`` restricts to empresas (here: even
    ids); a ``rubro`` filter restricts the universe further. The button
    disappears once everything is listed.
    """

    def __init__(
        self,
        n_total: int = 100,
        page_size: int = 10,
        rubro_of: Callable[[int], str] = lambda i: "Ferreterías" if i % 3 == 0 else "Otros",
    ) -> None:
        self.n_total, self.page_size, self.rubro_of = n_total, page_size, rubro_of
        self._universe: list[int] = []
        self._shown = 0
        self.clicks = 0
        self.closed = False

    def _render(self) -> str:
        rows = []
        for bid in self._universe[: self._shown]:
            rows.append(
                f"<a class='search-result-name' "
                f"href='/index.php?r=search/detail&id={bid}'><h1>Biz {bid}</h1></a>"
            )
        return f"<html><body>{''.join(rows)}</body></html>"

    def open_listing(self, url: str, filters: dict[str, str]) -> str:
        ids = range(1, self.n_total + 1)
        if filters.get("Tm") == "1":  # empresas only
            ids = (i for i in ids if i % 2 == 0)
        if "rubro" in filters:
            ids = (i for i in ids if self.rubro_of(i) == filters["rubro"])
        self._universe = list(ids)
        self._shown = min(self.page_size, len(self._universe))
        return self._render()

    def load_more(self) -> str | None:
        if self._shown >= len(self._universe):
            return None  # button gone: everything listed
        self.clicks += 1
        self._shown = min(self._shown + self.page_size, len(self._universe))
        return self._render()

    def close(self) -> None:
        self.closed = True


def browser_discovery_batches(
    spark: SparkSession,
    transport: JsTransport,
    url: str = SEARCH_URL,
    filters: dict[str, str] | None = None,
) -> Callable[[int], DataFrame | None]:
    """Adapt a JsTransport to ``discover_until_idle``'s batch callable:
    round 0 opens the listing with filters applied, each later round
    clicks "Ver más"; every rendered state parses (S6) into a
    (id_negocio, url) DataFrame. Returns None once the button is gone,
    which ends the loop before the idle counter even has to."""
    filters = dict(EMPRESAS_FILTER if filters is None else filters)

    def get(round_index: int) -> DataFrame | None:
        html = (
            transport.open_listing(url, filters)
            if round_index == 0
            else transport.load_more()
        )
        if html is None:
            return None
        pairs = parse_search_results(html)
        return spark.createDataFrame(
            pairs or [("__none__", "__none__")], ["id_negocio", "url"]
        ).filter("id_negocio != '__none__'")

    return get
