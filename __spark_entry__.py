"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001; ``queries()``
and ``oracle_sql()`` expose every implemented SURVEY §2 key from the
engine's registry (nfdump2clickhouse_spark.registry). The driver compares
each pair via DuckDB at sf0.01 (row-count + schema + order-insensitive
value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nfdump2clickhouse_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_pricing_summary) on /root/testdata/sf0.001."""
    q = registry.queries()["agg_pricing_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each hash-checked key."""
    return registry.oracle_sql()
