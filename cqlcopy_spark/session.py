"""SparkSession construction with scale-appropriate defaults.

The engine targets large multi-executor clusters; these defaults are the
ones that matter identically at local[32] and at 1000 executors:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- UTC session timezone: fixtures are TZ-naive, DuckDB oracle runs in UTC
  (FIXTURES.md), and any cluster job should be TZ-pinned anyway.
- Arrow enabled for the pandas-UDF operators.
- shuffle.partitions sized by env so tests (32) and clusters (thousands)
  configure it without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_builder(
    app_name: str = "cqlcopy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    """Return a configured builder; caller may add more .config() calls."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("CQLCOPY_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("CQLCOPY_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )


def get_spark(app_name: str = "cqlcopy_spark") -> SparkSession:
    return session_builder(app_name).getOrCreate()
