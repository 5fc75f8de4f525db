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
