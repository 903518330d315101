"""SparkSession factory tuned for both local testing and cluster scale.

Local runs use local[N] (single JVM); the config below is chosen so the
same code deploys unchanged to a multi-executor cluster:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned partition counts
  at 100 TB scale.
- shuffle.partitions is a *hint* only; AQE coalesces. On a real
  cluster this would be set to ~2-3x total cores by the submitter.
- Arrow enabled: every applyInPandas / mapInPandas kernel moves data
  in columnar batches, not pickled rows.
- Session timezone pinned to UTC: the reference stores naive-UTC
  timestamps (charting/server.py:50-60); pinning makes Spark results
  comparable to DuckDB/parquet epoch values.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "tastytrade_sdk_spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults."""
    n = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.session.timeZone", "UTC")
        # Naive parquet timestamps (isAdjustedToUTC=false) must read as
        # TIMESTAMP (LTZ, pinned UTC above), not TIMESTAMP_NTZ: the
        # epoch functions (unix_micros/unix_millis) reject NTZ, and the
        # data contract (FIXTURES.md) is naive-UTC storage.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # NOTE: a 48g heap measured 3-30x SLOWER on allocation-heavy
        # stages here (GC over a huge young gen); 16g is the sweet spot
        # for local[32] at these scale factors
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
