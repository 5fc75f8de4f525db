"""JsTransport seam: the "Ver más" load-more loop end-to-end through
discover_until_idle, with filter pushdown and dedupe across rounds."""

from __future__ import annotations

from etl_guiacores_spark.sources.browser import (
    EMPRESAS_FILTER,
    FakeJsListingTransport,
    browser_discovery_batches,
)
from etl_guiacores_spark.streaming.discovery import discover_until_idle


def test_load_more_loop_with_tm_filter(spark):
    """>=3 load-more rounds; Tm=1 restricts to empresas (even ids);
    every round re-renders the full listing so dedupe-across-rounds is
    genuinely exercised."""
    t = FakeJsListingTransport(n_total=100, page_size=10)
    got = discover_until_idle(
        browser_discovery_batches(spark, t, filters=dict(EMPRESAS_FILTER))
    )
    ids = sorted(int(r["id_negocio"]) for r in got.collect())
    assert ids == list(range(2, 101, 2))  # all 50 empresas, once each
    assert t.clicks >= 3  # 50 results / 10 per page -> 4 clicks


def test_rubro_filter_narrows_universe(spark):
    t = FakeJsListingTransport(n_total=60, page_size=5)
    got = discover_until_idle(
        browser_discovery_batches(
            spark, t, filters={"Tm": "1", "rubro": "Ferreterías"}
        )
    )
    ids = sorted(int(r["id_negocio"]) for r in got.collect())
    # even AND divisible by 3
    assert ids == [i for i in range(1, 61) if i % 2 == 0 and i % 3 == 0]


def test_progress_callback_rounds(spark):
    """The discovery loop reports per-round counts through the
    progress hook without extra Spark jobs."""
    t = FakeJsListingTransport(n_total=40, page_size=10)
    events = []
    got = discover_until_idle(
        browser_discovery_batches(spark, t, filters=dict(EMPRESAS_FILTER)),
        progress_callback=lambda stage, info: events.append((stage, info)),
    )
    assert got.count() == 20
    rounds = [e for e in events if e[0] == "round"]
    assert len(rounds) >= 2
    assert rounds[0][1]["n_new"] == 10
    assert events[-1][0] == "done"
    assert events[-1][1]["total"] == 20


def test_selenium_transport_gated():
    """Without selenium installed, the webdriver factory raises a clear
    ImportError instead of failing deep inside."""
    import pytest

    from etl_guiacores_spark.sources.browser import selenium_transport

    try:
        import selenium  # noqa: F401

        pytest.skip("selenium present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="JsTransport"):
        selenium_transport()
