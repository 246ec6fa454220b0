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


def overwrite_day_partitions(df: DataFrame, path: str) -> None:
    """Backfill/correction path: replace exactly the (dt, flowsrc)
    partitions present in ``df``, leaving every other partition's files
    untouched — Spark's dynamic partition-overwrite mode scoped to this
    one write. This is how replayed or corrected rotations land without
    rewriting the table and without the duplicate rows a plain append
    would create; at 100 TB an overwrite touches only the affected
    day/source leaves (same layout and sort as the normal sink)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_flows_partitioned(df, path, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


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


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int,
    key: str,
    path: str,
    sort_col: str | None = None,
) -> None:
    """Bucketed, bucket-sorted external table (SURVEY §4.2 'co-locate
    joins via bucketing'): both sides of a recurring equi-join written
    with the same bucket count and key join with NO shuffle — the scans
    come up `Bucketed: true` and the Exchange disappears from the join
    subtree. At 100 TB this converts every repeated fact-to-fact join on
    the bucket key from a full network shuffle into a local merge."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(sort_col or key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_glob: str = "dt=*/flowsrc=*",
) -> list[str]:
    """Small-files compaction — the engine's analog of MergeTree's
    background part merges [P]. Streaming ingest with one micro-batch per
    5-min rotation necessarily writes one small file per batch per
    partition; query-side scan cost then grows with file COUNT, not data
    size. Compaction rewrites each leaf partition into
    ceil(bytes/target) files, preserving the (ts, sa_num) sort that buys
    row-group skipping.

    Runs per-leaf-partition (never a global rewrite), so at 100 TB it is
    driven incrementally: only partitions whose file count exceeds a
    threshold are rewritten, each an independent job touching one
    partition's data. Returns the compacted partition dirs."""
    import glob as _glob
    import math

    compacted = []
    for leaf in sorted(_glob.glob(os.path.join(path, partition_glob))):
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        if len(files) <= 1:
            continue
        total = sum(os.path.getsize(os.path.join(leaf, f)) for f in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(files):
            continue
        df = spark.read.parquet(leaf)
        tmp = leaf + "._compact_tmp"
        (
            df.repartition(n_out)
            .sortWithinPartitions("ts", "sa_num")
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(tmp)
        )
        for f in files:
            os.remove(os.path.join(leaf, f))
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                os.replace(os.path.join(tmp, f), os.path.join(leaf, f))
        shutil.rmtree(tmp)
        compacted.append(leaf)
    return compacted


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
        # batch_id rides along (same contract as parquet_batch_writer):
        # the provenance column replays/audits need downstream
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).jdbc(url, table, properties=properties)
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
