"""Distributed page-fetch stage (SURVEY §2.1 S3/S4, §2.9 R1/R5/R6).

The reference fans URLs out to a 4-process pool where each worker
boots a Chrome subprocess (reference: src/extractors/bulk_scraper.py:213-214,
245-247). Spark-first design: the URL worklist is a DataFrame, the
fetch is a ``mapInPandas`` stage with

- ONE transport per partition (R5 resource lifecycle — the analog of
  the reference's driver-per-worker, amortized over the partition),
- a token-bucket rate limiter per partition (R6 —
  reference: bulk_scraper.py:81 random sleeps),
- bounded retries with backoff per URL (R1 —
  reference: src/common/utils.py:64-92), failures yielding an error
  column instead of a task failure (R2 quarantine path).

Network access is abstracted behind ``transport`` so tests and the
benchmark use a deterministic in-process fake; a real deployment
passes a requests-backed transport. Scale: fetch parallelism ==
partition count — ``df.repartition(n)`` replaces the reference's
``max_workers``/``chunk_size`` knobs (reference: src/common/config.py:71-80).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("id_negocio", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("fetch_error", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
    ]
)

Transport = Callable[[str], str]


def requests_transport(timeout: float = 30.0) -> Transport:
    """Real HTTP transport (one pooled session per partition)."""
    import requests

    session = requests.Session()

    def fetch(url: str) -> str:
        resp = session.get(url, timeout=timeout)
        resp.raise_for_status()
        return resp.text

    return fetch


def fake_transport(pages: dict[str, str] | None = None, fail_urls: set[str] | None = None) -> Transport:
    """Deterministic in-process transport for tests/benchmarks."""
    fail_urls = fail_urls or set()

    def fetch(url: str) -> str:
        if url in fail_urls:
            raise IOError(f"fake failure for {url}")
        if pages is not None:
            if url not in pages:
                raise IOError(f"404 {url}")
            return pages[url]
        return f"<html><body><a class='search-result-name'><h1>Biz {url}</h1></a></body></html>"

    return fetch


class RateLimiter:
    """Token bucket: at most ``rate`` calls/sec per partition (R6)."""

    def __init__(self, rate: float, clock=time.monotonic, sleep=time.sleep):
        self.min_interval = 1.0 / rate if rate > 0 else 0.0
        self._clock, self._sleep = clock, sleep
        self._next_ok = 0.0

    def wait(self) -> None:
        if self.min_interval <= 0:
            return
        now = self._clock()
        if now < self._next_ok:
            self._sleep(self._next_ok - now)
            now = self._next_ok
        self._next_ok = now + self.min_interval


def fetch_pages(
    urls: DataFrame,
    transport_factory: Callable[[], Transport],
    *,
    url_col: str = "url",
    id_col: str = "id_negocio",
    max_attempts: int = 3,
    retry_delay: float = 0.0,
    rate_limit_per_sec: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """URL worklist -> fetched HTML (+ error/attempt columns).

    ``transport_factory`` runs once per partition on the executor —
    never serialize a live client through the closure.
    """
    max_attempts = max(1, max_attempts)  # 0 would emit rows with neither html nor error
    if num_partitions:
        urls = urls.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()  # R5: one client per partition
        limiter = RateLimiter(rate_limit_per_sec)
        for pdf in batches:
            out = []
            for bid, url in zip(pdf[id_col], pdf[url_col]):
                html, err, attempt = None, None, 0
                for attempt in range(1, max_attempts + 1):  # R1
                    limiter.wait()
                    try:
                        html, err = transport(url), None
                        break
                    except Exception as e:  # noqa: BLE001 — R2: row-level isolation
                        err = f"{type(e).__name__}: {e}"
                        if attempt < max_attempts and retry_delay:
                            time.sleep(retry_delay)
                out.append(
                    {
                        "id_negocio": bid,
                        "url": url,
                        "html": html,
                        "fetch_error": err,
                        "attempts": attempt,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FETCH_SCHEMA.fields])

    return urls.mapInPandas(run, FETCH_SCHEMA)


# executor-side importability: serialize this module's functions by
# value so mapInPandas closures never import the package on workers
from etl_guiacores_spark import shipping as _shipping  # noqa: E402
import sys as _sys  # noqa: E402

_shipping.register_udf_module(_sys.modules[__name__])
