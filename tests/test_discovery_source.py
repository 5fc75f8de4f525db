"""Spark 4 Python DataSource: discovery crawl as a real source."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.dedupe import dedupe_keyed_first
from etl_guiacores_spark.sources.discovery_source import ListingDataSource


def load(spark, **opts):
    spark.dataSource.register(ListingDataSource)
    reader = spark.read.format("guiacores_listing")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


class TestListingSource:
    def test_cross_product_partitions_and_rows(self, spark):
        df = load(
            spark,
            rubros="panaderia,ferreteria",
            localidades="neuquen,cipolletti",
            pages_per_combo="2",
        )
        assert df.select("rubro", "localidad").distinct().count() == 4  # J1
        # overlapping ids across pages within a combo -> dedupe has work
        one = df.filter((F.col("rubro") == "panaderia") & (F.col("localidad") == "neuquen"))
        assert one.count() == 20
        assert one.select("id_negocio").distinct().count() < 20

    def test_keep_first_dedupe_downstream(self, spark):
        df = load(spark, rubros="panaderia", localidades="neuquen", pages_per_combo="3")
        unique = dedupe_keyed_first(df, ["id_negocio"], ["page"])
        # first-discovery wins: every kept row carries the earliest page
        kept = {r["id_negocio"]: r["page"] for r in unique.collect()}
        raw = df.groupBy("id_negocio").agg(F.min("page").alias("p")).collect()
        assert kept == {r["id_negocio"]: r["p"] for r in raw}

    def test_empty_filters_fall_back_to_single_combo(self, spark):
        df = load(spark, pages_per_combo="1")
        assert df.count() == 10
        assert df.select("rubro").distinct().collect()[0]["rubro"] is None


def listing_for_test(rubro, localidad, page, page_size):
    """module-level so the executor can import it by dotted path"""
    return [(f"{rubro}-{page}-{i}", f"http://x/id={page}{i}") for i in range(2)]


class TestListingFactoryInjection:
    def test_dotted_path_factory_replaces_synthetic(self, spark):
        from etl_guiacores_spark.sources.discovery_source import ListingDataSource

        spark.dataSource.register(ListingDataSource)
        df = (
            spark.read.format("guiacores_listing")
            .option("rubros", "pan")
            .option("pages_per_combo", "2")
            .option(
                "listing_factory",
                "tests.test_discovery_source:listing_for_test",
            )
            .load()
        )
        ids = sorted(r["id_negocio"] for r in df.collect())
        assert ids == ["pan-0-0", "pan-0-1", "pan-1-0", "pan-1-1"]

    def test_tiny_page_size_still_advances(self, spark):
        from etl_guiacores_spark.sources.discovery_source import synthetic_listing

        p0 = synthetic_listing("a", "b", 0, page_size=2)
        p1 = synthetic_listing("a", "b", 1, page_size=2)
        assert p0 != p1  # step floored at 1: pages must not repeat forever
