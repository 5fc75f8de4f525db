"""SparkSession factory with deterministic, scale-aware defaults.

The reference hard-codes a 4-process pool and fixed chunk sizes
(reference: src/common/config.py:71-80, src/main.py:241-253); here
parallelism is Spark partitioning and every knob that affects plan
shape or result hashing is pinned:

- ``spark.sql.session.timeZone=UTC``: parquet timestamps compare
  bit-stably against the DuckDB oracle.
- AQE on: runtime coalescing + skew-join handling — the 100 TB
  story relies on it.
- Arrow on: every Pandas-UDF boundary is vectorized.
- shuffle partitions sized to cores for local runs; a real cluster
  deployment overrides via ``extra_conf`` (AQE coalesces anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "etl-guiacores-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # nanosecond parquet timestamps (events table) read as long;
        # sources.tables converts them back to TimestampType
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    from etl_guiacores_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Pin result-affecting conf on an externally created session.

    The verification driver owns its own SparkSession; only settings
    that are safe to change at runtime are applied here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from etl_guiacores_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    return spark
