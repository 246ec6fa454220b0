"""SparkSession builder for the engine.

Tuned for local[32] testing but every knob is chosen for cluster scale:
AQE handles skew/coalescing at 100 TB, Arrow covers the pandas-UDF
boundary, and UTC session time keeps timestamp semantics identical to
the DuckDB oracle (parquet TIMESTAMP is naive; treating it as UTC makes
Spark and DuckDB agree bit-for-bit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spark-flows", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(min(int(cpus) * 2, 64)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark can't read as
        # TimestampType; read the raw int64 and convert in catalog.table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
