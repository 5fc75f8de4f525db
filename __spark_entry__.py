"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``etl_guiacores_spark.queries.REGISTRY``: the driver
runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]``
at sf=0.01 and compares against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import etl_guiacores_spark.queries_extra  # noqa: F401 — registers coverage queries
import etl_guiacores_spark.queries_scale  # noqa: F401 — registers scale queries
from etl_guiacores_spark.queries import REGISTRY
from etl_guiacores_spark.session import configure_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    configure_session(spark)
    return REGISTRY["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted -> rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
