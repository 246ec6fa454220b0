"""Sinks & storage layout (SURVEY §2.1, §4.3.1, §4.3.5).

The reference's at-rest layout is a ClickHouse MergeTree ordered by
time/address with a 90-day TTL [P]. The engine-native equivalent:

- hive-partitioned parquet by (dt, flowsrc)  → partition pruning
- sortWithinPartitions(ts, sa_num) pre-write → row-group min/max stats
  behave like MergeTree's sparse primary index (data skipping)
- retention = dropping whole dt= partitions  → metadata-only, no rewrite
- ClickHouse parity sink = JDBC in foreachBatch with batch-id idempotence
"""

from __future__ import annotations

import os
import shutil
from datetime import date, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_flows_partitioned(df: DataFrame, path: str, mode: str = "append") -> None:
    """Partitioned, sorted columnar layout (MergeTree ORDER BY analog)."""
    (
        df.repartition("dt", "flowsrc")
        .sortWithinPartitions("ts", "sa_num")
        .write.mode(mode)
        .partitionBy("dt", "flowsrc")
        .option("compression", "zstd")
        .parquet(path)
    )


def drop_expired_partitions(path: str, keep_days: int, today: date) -> list[str]:
    """TTL expiry as partition drop (SURVEY §3.2 E3') — O(partitions)
    metadata work, never a row rewrite. Local-FS implementation; on a real
    cluster this is a catalog/`ALTER TABLE DROP PARTITION` call."""
    cutoff = today - timedelta(days=keep_days)
    dropped = []
    if not os.path.isdir(path):
        return dropped
    for entry in sorted(os.listdir(path)):
        if entry.startswith("dt="):
            try:
                d = date.fromisoformat(entry[3:])
            except ValueError:
                continue
            if d < cutoff:
                shutil.rmtree(os.path.join(path, entry))
                dropped.append(entry)
    return dropped


def jdbc_batch_writer(
    url: str,
    table: str,
    properties: dict[str, str],
    ledger_path: str | None = None,
):
    """foreachBatch sink for the ClickHouse-parity path (SURVEY §4.3.5).

    Returns f(batch_df, batch_id) that appends via JDBC. Idempotence: a
    batch-id ledger is consulted before writing, so a restarted query
    re-offering batch N is a no-op (reference parity: file-level retry
    [P]). With a real ClickHouse target, pair with ReplacingMergeTree
    keyed on (batch_id, row) for exactly-once-effect.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if ledger_path is not None:
            marker = os.path.join(ledger_path, f"batch_{batch_id}.done")
            if os.path.exists(marker):
                return
        batch_df.write.mode("append").jdbc(url, table, properties=properties)
        if ledger_path is not None:
            os.makedirs(ledger_path, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write("ok")

    return write_batch


def parquet_batch_writer(path: str, ledger_path: str | None = None):
    """Same idempotent-foreachBatch protocol with a parquet target —
    used where no JDBC endpoint exists (tests, offline dev)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if ledger_path is not None:
            marker = os.path.join(ledger_path, f"batch_{batch_id}.done")
            if os.path.exists(marker):
                return
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )
        if ledger_path is not None:
            os.makedirs(ledger_path, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write("ok")

    return write_batch
