"""SparkSession factory for local testing and bench runs.

The driver supplies its own session to ``__spark_entry__``; this factory is
for tests / bench only. Settings chosen for a single-JVM local[N] box but
scale-safe: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions ~= cores (not the 200 default), UTC session
timezone so timestamps compare cleanly against the tz-naive parquet
fixtures and the DuckDB oracle, Arrow enabled for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "clickhouse_data_rebalance_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an externally-supplied session.

    The driver hands us a session we didn't build; pin the confs that
    affect result correctness (timezone) and plan quality (AQE) that are
    runtime-mutable. Static confs (driver memory, master) are left alone.
    """
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        # events.parquet carries TIMESTAMP(NANOS) — read as long, converted
        # to a µs TimestampType in tables.load_tables.
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-mutable in this session build; best effort
    return spark
