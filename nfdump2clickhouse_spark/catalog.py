"""Fixture-table loaders.

``tables(spark, sf_dir)`` returns a dict of lazily-planned DataFrames, one
per driver fixture table. Reads are plain ``spark.read.parquet`` so
Catalyst's column pruning / predicate pushdown reach the scan; schemas are
pinned (schemas.py) to keep types stable across scale factors.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from .schemas import FIXTURE_SCHEMAS

TABLE_NAMES = tuple(FIXTURE_SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_TS_NANOS_CACHE: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """True when the events fixture stores ``ts`` as TIMESTAMP(NANOS)."""
    cached = _TS_NANOS_CACHE.get(path)
    if cached is None:
        import glob

        import pyarrow.parquet as pq
        import pyarrow.types as pat

        probe = path
        if os.path.isdir(path):  # Spark writes directory-form parquet
            parts = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
            if not parts:
                parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            probe = parts[0] if parts else path
        ts_type = pq.read_schema(probe).field("ts").type
        cached = pat.is_timestamp(ts_type) and ts_type.unit == "ns"
        _TS_NANOS_CACHE[path] = cached
    return cached


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pinned schema (no inference) — required for the streaming source and
    # keeps TimestampType (not NTZ) uniform across Spark versions/configs.
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        # events.ts as TIMESTAMP(NANOS) is illegal for Spark's reader, so read
        # the physical int64 (nanosAsLong, session.py) and truncate ns→µs —
        # same floor-division DuckDB applies when comparing at µs precision.
        # (Fixture generations vary: ns and µs have both been observed, so
        # sniff the footer once per path instead of hard-coding either.)
        raw = StructType(
            [
                StructField("ts", LongType())
                if f.name == "ts"
                else f
                for f in FIXTURE_SCHEMAS[name].fields
            ]
        )
        return (
            spark.read.schema(raw)
            .parquet(path)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
