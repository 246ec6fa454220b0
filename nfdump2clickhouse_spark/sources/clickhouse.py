"""ClickHouse-side artifacts for the parity deployment path.

The reference README instructs operators to create the target table
(conventionally `nfsen.flows`) by hand from a published MergeTree DDL
[P]; the tool then bulk-inserts parquet into it. This module generates
that DDL from the engine's single source of truth (`schemas.FLOWS` plus
the derived layout columns), so the Spark engine and a real ClickHouse
target can never drift, and builds the JDBC bits `foreachBatch` needs
(sources/sinks.jdbc_batch_writer).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

from ..schemas import FLOWS

#: Spark → ClickHouse type mapping for the flows columns (SURVEY §1.2).
#: Unsigned counters use UInt64 (the reference DDL's choice [P]); Spark's
#: LongType caveat is documented in SURVEY §1.3.
_CH_TYPES = {
    TimestampType: "DateTime",
    DoubleType: "Float64",
    FloatType: "Float32",
    IntegerType: "UInt16",
    LongType: "UInt64",
    StringType: "String",
}

#: columns that benefit from LowCardinality dictionary encoding [P]
_LOW_CARD = {"pr", "flg", "flowsrc", "ra"}

#: nullable in the reference schema [P §1.2]
_NULLABLE = {"pr"}


def flows_ddl(
    database: str = "nfsen",
    table: str = "flows",
    ttl_days: int = 90,
    schema: StructType = FLOWS,
) -> str:
    """CREATE TABLE DDL for the ClickHouse target, generated from the
    pinned Spark schema: MergeTree partitioned by day, ordered by
    (ts, sa, da) — the primary-key layout whose sparse index the parquet
    sink mirrors with its in-file (ts, sa_num) sort — with the
    reference's ≈90-day TTL [P]."""
    cols = []
    for f in schema.fields:
        ch = _CH_TYPES[type(f.dataType)]
        # ClickHouse nests Nullable INSIDE LowCardinality
        if f.name in _NULLABLE:
            ch = f"Nullable({ch})"
        if f.name in _LOW_CARD:
            ch = f"LowCardinality({ch})"
        cols.append(f"    `{f.name}` {ch}")
    body = ",\n".join(cols)
    return (
        f"CREATE TABLE IF NOT EXISTS {database}.{table} (\n"
        f"{body}\n"
        f") ENGINE = MergeTree()\n"
        f"PARTITION BY toDate(ts)\n"
        f"ORDER BY (ts, sa, da)\n"
        f"TTL te + INTERVAL {ttl_days} DAY\n"
        f"SETTINGS index_granularity = 8192"
    )


def jdbc_properties(user: str = "default", password: str = "") -> dict[str, str]:
    """Connection properties for `df.write.jdbc` against the official
    ClickHouse JDBC driver."""
    return {
        "user": user,
        "password": password,
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
    }


def jdbc_url(host: str = "localhost", port: int = 8123, database: str = "nfsen") -> str:
    return f"jdbc:clickhouse://{host}:{port}/{database}"


def clickhouse_endpoint() -> tuple[str, int] | None:
    """(host, port) of a configured ClickHouse, or None.

    Reads ``CLICKHOUSE_HOST`` / ``CLICKHOUSE_PORT`` (HTTP port, default
    8123) — the standard env knobs a deployment sets; unset means this
    environment has no server (the test container) and JDBC paths should
    fall back to the parquet protocol demo."""
    import os

    host = os.environ.get("CLICKHOUSE_HOST")
    if not host:
        return None
    return host, int(os.environ.get("CLICKHOUSE_PORT", "8123"))


def clickhouse_reachable(timeout_s: float = 1.0) -> bool:
    """True iff a configured ClickHouse answers a TCP connect. Probe-only
    (no query): callers gate real JDBC round-trips on this and skip
    cleanly — with a log line, not a hard error — when absent."""
    import socket

    ep = clickhouse_endpoint()
    if ep is None:
        return False
    try:
        with socket.create_connection(ep, timeout=timeout_s):
            return True
    except OSError:
        return False
