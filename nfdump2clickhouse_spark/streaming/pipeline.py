"""Streaming pipeline building blocks + self-contained demo runs.

Each `run_*` helper materializes a complete streaming scenario on temp
dirs: write nfcapd-style rotated files, run a real StreamingQuery with
`Trigger.availableNow` + `maxFilesPerTrigger=1` (so every rotation is its
own micro-batch and watermarks advance between files, exactly like the
5-min production cadence), and return the sink contents as a batch
DataFrame. The driver's rows-only check executes these for real.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from contextlib import contextmanager
from datetime import datetime, timezone

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import FLOWS
from ..sources.flows import write_flow_files
from ..sources.sinks import parquet_batch_writer


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"sf_{prefix}_")


@contextmanager
def _demo_state_partitions(spark: SparkSession, n: int = 8):
    """Size the state store for the demo's data, not the session default.

    Streaming aggregation locks its state-partition count to
    `spark.sql.shuffle.partitions` at the FIRST start of a checkpoint, and
    every micro-batch commits one state file per partition — 64 partitions
    × 6 micro-batches of a few hundred rows is pure fixed overhead. On a
    production checkpoint you'd size this once for peak key cardinality;
    the demos run on fresh checkpoints so a small count is correct."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _mem_name() -> str:
    return "m" + uuid.uuid4().hex[:12]


def _source(
    spark: SparkSession, watch_dir: str, max_files: int = 1
) -> DataFrame:
    # max_files=1 replays rotations one micro-batch each (what the
    # watermark/dedup/restart demos assert on); join demos that only
    # need file-set-then-advancer sequencing pass a higher cap to cut
    # batch count
    return (
        spark.readStream.schema(FLOWS)
        .option("maxFilesPerTrigger", max_files)
        .parquet(watch_dir)
    )


def run_stream_dir(spark: SparkSession) -> DataFrame:
    """src_stream_dir: ingest 3 rotated files exactly once; the checkpoint
    seen-files log is the dedup ledger (rerunning the query adds nothing).
    """
    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    write_flow_files(spark, watch, n_files=3, rows_per_file=200)
    name = _mem_name()
    q = (
        _source(spark, watch)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("ra").agg(
        F.count(F.lit(1)).alias("n_flows"), F.sum("ibyt").alias("bytes")
    )


def run_foreachbatch(spark: SparkSession) -> DataFrame:
    """stream_foreachbatch: the reference's convert→insert loop [P] as an
    idempotent per-micro-batch parquet append (JDBC/ClickHouse variant:
    sources.sinks.jdbc_batch_writer)."""
    watch, ckpt, out, ledger = _tmp("watch"), _tmp("ckpt"), _tmp("out"), _tmp("ledger")
    write_flow_files(spark, watch, n_files=3, rows_per_file=150)
    sink = parquet_batch_writer(os.path.join(out, "flows"), ledger_path=ledger)
    q = (
        _source(spark, watch)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(out, "flows"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def run_watermark(spark: SparkSession) -> DataFrame:
    """stream_watermark: 10-min watermark on 5-min tumbling counts; the
    last file replays rows from the first rotation's window (far past the
    watermark by then) — those land in no emitted window, so the [0,5)
    window emits exactly its 100 on-time rows, never the 50 replays.
    Five on-time rotations so the watermark (max_ts - 10 min, advanced at
    batch boundaries) actually passes the first windows' ends before the
    availableNow run terminates — with fewer files nothing ever emits in
    append mode and the scenario asserts nothing."""
    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, watch, n_files=5, rows_per_file=100, start=start)
    # late file: same event times as rotation 0, arriving 5 rotations
    # later (arrival=1 → mod-time an hour after the on-time rotations)
    write_flow_files(
        spark, os.path.join(watch), n_files=1, rows_per_file=50, start=start,
        tag="late", arrival=1,
    )
    name = _mem_name()
    agg = (
        _source(spark, watch)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))  # group on the window struct:
        # projecting .start before the agg would sever the watermark link
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("wstart"), "n")
    )
    with _demo_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_dedup_watermark(spark: SparkSession) -> DataFrame:
    """stream_dedup_watermark: dropDuplicatesWithinWatermark over replayed
    rotations — file 4 duplicates file 1's rows; state expires with the
    watermark instead of growing forever (the stream-dedup
    requirement at 100 TB)."""
    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, watch, n_files=2, rows_per_file=100, start=start)
    # duplicate of rotation 0 (same rows incl. ts) arriving later as its
    # OWN file (arrival=1 → later mod-time) — tag keeps it from
    # overwriting the on-time rotation, so the dedup operator really sees
    # the 100 rows a second time
    write_flow_files(
        spark, watch, n_files=1, rows_per_file=100, start=start, tag="replay",
        arrival=1,
    )
    name = _mem_name()
    dedup = (
        _source(spark, watch)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["sa", "da", "sp", "dp", "ts"])
    )
    with _demo_state_partitions(spark):
        q = (
            dedup.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).groupBy("ra").agg(F.count(F.lit(1)).alias("n_unique"))


def run_output_modes(spark: SparkSession) -> DataFrame:
    """stream_output_modes: the same aggregation under complete mode
    (update/append variants exercised elsewhere: run_watermark uses
    append; complete re-emits full state per batch)."""
    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    write_flow_files(spark, watch, n_files=3, rows_per_file=100)
    name = _mem_name()
    agg = _source(spark, watch).groupBy("dp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ibyt").alias("bytes")
    )
    with _demo_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_session_stream(spark: SparkSession) -> DataFrame:
    """stream_session_window: per-(sa, da) session windows (5-min gap)
    under a watermark, in a real StreamingQuery — the streaming form of
    the batch-checked win_session key. Sessions merge across micro-batches
    while open and emit exactly once when the watermark passes their
    close (append mode); state is bounded by the watermark, the 100 TB
    requirement for an unbounded flow stream."""
    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    write_flow_files(spark, watch, n_files=4, rows_per_file=120)
    name = _mem_name()
    agg = (
        _source(spark, watch)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), F.col("sa"), F.col("da"))
        .agg(F.count(F.lit(1)).alias("n_flows"), F.sum("ibyt").alias("bytes"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "sa",
            "da",
            "n_flows",
            "bytes",
        )
    )
    with _demo_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_transform_with_state(spark: SparkSession) -> DataFrame:
    """stream_tws: the Spark 4 stateful API (transformWithStateInPandas +
    StatefulProcessor) for the same flow-stitching semantics as
    run_stateful_sessions — per (sa, da) key a ValueState of running
    (n_flows, total_bytes) survives across micro-batches. The typed
    state-variable API (value/list/map states, timers) is the
    applyInPandasWithState successor and the intended 100 TB path: state
    lives in the per-key state store (RocksDB on a cluster), never in the
    plan.

    Requires google.protobuf (the state-server wire format); raises
    ImportError where it is unavailable — callers/tests gate on that."""
    import google.protobuf.descriptor  # noqa: F401  (hard dep of the TWS worker)

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("sa", StringType()),
            StructField("da", StringType()),
            StructField("n_flows", LongType()),
            StructField("total_bytes", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", LongType())]
    )

    class Stitch(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                total += int(pdf["ibyt"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "sa": [key[0]],
                    "da": [key[1]],
                    "n_flows": [n],
                    "total_bytes": [total],
                }
            )

        def close(self) -> None:
            pass

    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    write_flow_files(spark, watch, n_files=3, rows_per_file=150)
    name = _mem_name()
    # transformWithState requires the RocksDB state store (the default
    # HDFS-backed provider does not implement the new state-variable API)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = (
        _source(spark, watch)
        .groupBy("sa", "da")
        .transformWithStateInPandas(
            Stitch(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
    with _demo_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # last emitted totals per key = the stitched final state
    return spark.table(name).groupBy("sa", "da").agg(
        F.max("n_flows").alias("n_flows"), F.max("total_bytes").alias("total_bytes")
    )


def run_stateful_sessions(spark: SparkSession) -> DataFrame:
    """stream_stateful (SURVEY §4.3.4): flow/session stitching across
    micro-batches with applyInPandasWithState — per (sa, da) key, a
    running (n_flows, total_bytes) state survives from one rotation to the
    next; each batch emits the updated totals."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    watch, ckpt = _tmp("watch"), _tmp("ckpt")
    write_flow_files(spark, watch, n_files=3, rows_per_file=150)
    name = _mem_name()

    def stitch(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["ibyt"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"sa": [key[0]], "da": [key[1]], "n_flows": [n], "total_bytes": [total]}
        )

    out = (
        _source(spark, watch)
        .groupBy("sa", "da")
        .applyInPandasWithState(
            stitch,
            outputStructType="sa string, da string, n_flows long, total_bytes long",
            stateStructType="n long, total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    with _demo_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # final state per key = last emitted row (max n_flows)
    return spark.table(name).groupBy("sa", "da").agg(
        F.max("n_flows").alias("n_flows"), F.max("total_bytes").alias("total_bytes")
    )


def run_restart_resume(spark: SparkSession) -> DataFrame:
    """stream_foreachbatch across a RESTART: the operational guarantee the
    reference daemon gets from file-level retry [P §3.1 E2], here from the
    checkpoint. Run 1 drains rotations 0-1 and terminates (availableNow —
    the systemd-timer deployment mode); two more rotations land; run 2
    starts from the SAME checkpoint and must process exactly the two new
    files; run 3 with nothing new must add zero rows. The seen-files log
    in the checkpoint is what replaces the reference's watcher state, so
    this is the test that it survives process death."""
    watch, ckpt, out, ledger = _tmp("watch"), _tmp("ckpt"), _tmp("out"), _tmp("ledger")
    sink = parquet_batch_writer(os.path.join(out, "flows"), ledger_path=ledger)
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)

    def drain() -> None:
        q = (
            _source(spark, watch)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_flow_files(spark, watch, n_files=2, rows_per_file=120, start=start)
    drain()
    from datetime import timedelta

    # rotations 2-3: later start → later explicit mtime, listed after run
    # 1's files (no wall-clock sleep needed — mtimes are set, not sampled)
    write_flow_files(
        spark, watch, n_files=2, rows_per_file=120,
        start=start + timedelta(minutes=10),
    )
    drain()  # restart from the same checkpoint: must pick up exactly 2 files
    drain()  # nothing new: must be a no-op
    return (
        spark.read.parquet(os.path.join(out, "flows"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def run_stream_stream_join(spark: SparkSession) -> DataFrame:
    """stream_stream_join: watermarked stream-stream inner join — the
    missing piece between stream-static enrichment (foreachBatch) and
    stateful sessions: BOTH sides are unbounded, so each must buffer rows
    in the state store until the other side's watermark proves no more
    matches can arrive.

    Scenario: request flows (dir A) joined to their response flows
    (dir B, reversed 5-tuple, emitted one rotation later) on the
    (addr, port) pair with a ±5-min event-time bound. The time-range
    predicate is what lets Spark EVICT state: with 10-min watermarks on
    both sides, a buffered request can be dropped once the response
    watermark passes ts+5min — without the bound, state grows forever
    (the #1 production failure of stream-stream joins; SURVEY §2.9).
    availableNow + memory sink keeps the demo deterministic."""
    watch_a, watch_b, ckpt = _tmp("req"), _tmp("resp"), _tmp("ckpt")
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, watch_a, n_files=3, rows_per_file=100, start=start)
    # responses: same flows re-keyed by swapping src/dst, landing one
    # rotation later (arrival shifts mtime, ts stays in-window)
    import pyarrow.parquet as pq

    os.makedirs(watch_b, exist_ok=True)
    for p in sorted(os.listdir(watch_a)):
        t = pq.read_table(os.path.join(watch_a, p))
        pdf = t.to_pandas()
        pdf = pdf.rename(
            columns={"sa": "da", "da": "sa", "sp": "dp", "dp": "sp"}
        )[[c for c in pdf.columns]]
        out_p = os.path.join(watch_b, p + ".resp")
        pdf.to_parquet(out_p)
        st = os.stat(os.path.join(watch_a, p))
        os.utime(out_p, (st.st_atime + 300, st.st_mtime + 300))
    req = _source(spark, watch_a, max_files=16).withWatermark(
        "ts", "10 minutes"
    )
    resp = (
        _source(spark, watch_b, max_files=16)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("sa").alias("r_sa"),
            F.col("da").alias("r_da"),
            F.col("sp").alias("r_sp"),
            F.col("dp").alias("r_dp"),
            F.col("ts").alias("r_ts"),
            F.col("ibyt").alias("r_ibyt"),
        )
    )
    joined = req.join(
        resp,
        (F.col("sa") == F.col("r_da"))
        & (F.col("da") == F.col("r_sa"))
        & (F.col("sp") == F.col("r_dp"))
        & (F.col("dp") == F.col("r_sp"))
        & (F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES")),
        "inner",
    ).select("ts", "sa", "da", "sp", "dp", "ibyt", "r_ibyt")
    name = _mem_name()
    with _demo_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_stream_left_outer_join(spark: SparkSession) -> DataFrame:
    """stream_left_outer_join: the OUTER variant of the watermarked
    stream-stream join — requests whose response never arrives must
    still be emitted (with NULL response columns), but only once the
    response-side watermark proves the match window is closed. That
    deferred-emit rule is the semantic difference from batch left joins
    and the reason outer stream joins REQUIRE both the watermark and the
    event-time bound (inner joins merely want them for state eviction).

    Scenario: responses are generated only for even source ports, so
    exactly half the requests match; a final far-future rotation (no
    joinable rows) advances the watermark past every request's window so
    the unmatched half actually flushes before availableNow terminates."""
    watch_a, watch_b, ckpt = _tmp("req"), _tmp("resp"), _tmp("ckpt")
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, watch_a, n_files=3, rows_per_file=100, start=start)
    import pyarrow.parquet as pq

    os.makedirs(watch_b, exist_ok=True)
    for p in sorted(os.listdir(watch_a)):
        pdf = pq.read_table(os.path.join(watch_a, p)).to_pandas()
        pdf = pdf[pdf["sp"] % 2 == 0]
        pdf = pdf.rename(columns={"sa": "da", "da": "sa", "sp": "dp", "dp": "sp"})
        out_p = os.path.join(watch_b, p + ".resp")
        pdf.to_parquet(out_p)
        st = os.stat(os.path.join(watch_a, p))
        os.utime(out_p, (st.st_atime + 300, st.st_mtime + 300))
    # watermark advancer: event times 2 h later, keys that match nothing
    import pyarrow as pa

    adv = pq.read_table(os.path.join(watch_a, sorted(os.listdir(watch_a))[0]))
    apdf = adv.to_pandas().head(5).copy()
    apdf["ts"] = apdf["ts"] + pd_timedelta_hours(2)
    apdf["te"] = apdf["te"] + pd_timedelta_hours(2)
    apdf["sa"] = "255.255.255.255"
    apdf["da"] = "255.255.255.254"
    # the join's GLOBAL watermark is min(req side, resp side), so the
    # advancer must land in BOTH watch dirs — advancing only one side
    # pins the global watermark and no NULL row ever flushes
    newest = max(
        os.stat(os.path.join(watch_b, f)).st_mtime for f in os.listdir(watch_b)
    )
    for wdir in (watch_a, watch_b):
        adv_p = os.path.join(wdir, "nfcapd.advancer")
        # pandas datetime arithmetic upgrades ts to ns; cast back to the
        # rotation files' schema or Spark's streaming scan rejects the file
        pq.write_table(pa.Table.from_pandas(apdf, schema=adv.schema), adv_p)
        os.utime(adv_p, (newest + 3600, newest + 3600))

    req = _source(spark, watch_a, max_files=16).withWatermark(
        "ts", "10 minutes"
    )
    resp = (
        _source(spark, watch_b, max_files=16)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("sa").alias("r_sa"),
            F.col("da").alias("r_da"),
            F.col("sp").alias("r_sp"),
            F.col("dp").alias("r_dp"),
            F.col("ts").alias("r_ts"),
            F.col("ibyt").alias("r_ibyt"),
        )
    )
    joined = req.join(
        resp,
        (F.col("sa") == F.col("r_da"))
        & (F.col("da") == F.col("r_sa"))
        & (F.col("sp") == F.col("r_dp"))
        & (F.col("dp") == F.col("r_sp"))
        & (F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES")),
        "left_outer",
    ).select("ts", "sa", "da", "sp", "dp", "ibyt", "r_ibyt")
    out = _tmp("out")
    with _demo_state_partitions(spark):

        def drain() -> None:
            q = (
                joined.writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        # NULL-side rows are emitted in the batch AFTER the watermark
        # passes their bound; availableNow terminates at end-of-input, so
        # a second drain (new advancer rotation → one more batch) is what
        # flushes the unmatched half — the restart is checkpoint-resumed,
        # exactly the run_restart_resume operational pattern
        for wdir in (watch_a, watch_b):
            adv2 = os.path.join(wdir, "nfcapd.advancer2")
            pq.write_table(pa.Table.from_pandas(apdf, schema=adv.schema), adv2)
            os.utime(adv2, (newest + 7200, newest + 7200))
        drain()
    # drop the advancer rows themselves (recognizable sentinel address):
    # the demo's contract is about the real request population
    return spark.read.parquet(out).filter(F.col("sa") != "255.255.255.255")


def pd_timedelta_hours(h: int):
    import pandas as pd

    return pd.Timedelta(hours=h)


def run_v9_stream_source(spark: SparkSession) -> DataFrame:
    """stream_v9_source: an nfcapd capture directory as a GENUINE
    streaming source through the Python DataSource stream-reader API —
    the streaming half of the native v9 story (`FlowService` fmt="v9"
    is the batch-incremental half; `flows_netflow_v9_decode` the batch
    reader).

    Offset design: nfcapd rotation names are time-ordered
    (`nfcapd.YYYYMMDDhhmm`), so the offset is simply the
    lexicographically LAST ingested file name — O(1) state, no
    unbounded seen-files log, and a checkpoint restart resumes after
    the recorded rotation exactly like nfcapd's own tailer would. Each
    micro-batch's partitions are the files in (start, end]; the
    template-stateful decode runs whole-file per partition on
    executors (templates never cross rotations — exporters re-announce
    per file).

    Demo: announce 2 rotations, drain, announce 1 more, drain again —
    the second drain must ingest ONLY the new rotation (the offset
    ledger, not mtime races, decides)."""
    from ..sources.netflow_v9 import write_netflow_v9

    cap_dir, ckpt = _tmp("v9src"), _tmp("v9ckpt")
    write_netflow_v9(cap_dir, n_files=2, records_per_file=10)
    _register_v9_stream_source(spark)
    name = _mem_name()
    q = (
        spark.readStream.format("v9_stream")
        .option("path", cap_dir)
        .load()
        .withColumn("batch", F.lit(0))
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        n_first = spark.table(name).count()
        # a third rotation arrives (lexicographically later name)
        import shutil as _sh

        extra = _tmp("v9extra")
        write_netflow_v9(extra, n_files=1, records_per_file=6)
        _sh.move(
            os.path.join(extra, "nfcapd.v9.0000"),
            os.path.join(cap_dir, "nfcapd.v9.0002"),
        )
        q.processAllAvailable()
        n_total = spark.table(name).count()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("capture")
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.sum("ibyt").alias("bytes"),
            F.min("ts").alias("first_ms"),
        )
        .withColumn("n_first_drain", F.lit(n_first))
        .withColumn("n_total", F.lit(n_total))
    )


def _register_flow_stream_source(
    spark: SparkSession, fmt_name: str, decoder: str
) -> None:
    """Register a flow-capture Python DataSource (stream reader with
    last-rotation-name offsets) on this session; idempotent. ``decoder``
    selects the per-file decode on the EXECUTOR ("v9" export-packet
    streams / "nffile" nfdump on-disk format) — everything else (the
    O(1) offset design, per-file partitions, whole-file decode) is
    format-independent, which is the point: the streaming contract of
    an nfcapd directory does not depend on what nfcapd wrote into the
    files."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class FlowStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.path = options.get("path")

        def initialOffset(self):
            return {"last": ""}

        def latestOffset(self):
            names = sorted(
                n
                for n in os.listdir(self.path)
                if os.path.isfile(os.path.join(self.path, n))
            )
            return {"last": names[-1] if names else ""}

        def partitions(self, start, end):
            names = sorted(
                n
                for n in os.listdir(self.path)
                if start["last"] < n <= end["last"]
                and os.path.isfile(os.path.join(self.path, n))
            )
            return [
                InputPartition(os.path.join(self.path, n)) for n in names
            ]

        def read(self, partition):
            if decoder == "nffile":
                from nfdump2clickhouse_spark.sources.nffile import (
                    decode_nffile as dec,
                )
            else:
                from nfdump2clickhouse_spark.sources.netflow_v9 import (
                    decode_flow_stream as dec,
                )

            fpath = partition.value
            with open(fpath, "rb") as fh:
                content = fh.read()
            cap = os.path.basename(fpath)
            for t in dec(content):
                yield (cap, *t)

        def commit(self, end):
            pass

    class FlowStreamSource(DataSource):
        @classmethod
        def name(cls):
            return fmt_name

        def schema(self):
            return (
                "capture string, ts long, te long, td double, sa string,"
                " da string, sp int, dp int, pr string, flg string,"
                " ipkt long, ibyt long, ra string"
            )

        def streamReader(self, schema):
            return FlowStreamReader(self.options)

    spark.dataSource.register(FlowStreamSource)


def _register_v9_stream_source(spark: SparkSession) -> None:
    _register_flow_stream_source(spark, "v9_stream", "v9")


def run_nffile_stream_source(spark: SparkSession) -> DataFrame:
    """stream_nffile_source: the streaming half of the nfdump ON-DISK
    format story (VERDICT r4 missing-#2), completing the triple the v9
    path already has — `flows_nffile_decode` (batch), `FlowService`
    fmt="nffile" (batch-incremental), and this (genuine streaming
    source). Same O(1) last-rotation-name offset design as
    `stream_v9_source` via the shared registrar; only the executor-side
    decode differs.

    Demo contract (mirrors the v9 demo): announce 2 on-disk rotations,
    drain, announce 1 more, drain — the second drain ingests ONLY the
    new rotation."""
    from ..sources.nffile import write_nffile

    cap_dir, ckpt = _tmp("nfsrc"), _tmp("nfckpt")
    write_nffile(cap_dir, n_files=2, records_per_file=10)
    _register_flow_stream_source(spark, "nffile_stream", "nffile")
    name = _mem_name()
    q = (
        spark.readStream.format("nffile_stream")
        .option("path", cap_dir)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        n_first = spark.table(name).count()
        import shutil as _sh

        extra = _tmp("nfextra")
        write_nffile(extra, n_files=1, records_per_file=6)
        _sh.move(
            os.path.join(extra, "nfcapd.nf.0000"),
            os.path.join(cap_dir, "nfcapd.nf.0002"),
        )
        q.processAllAvailable()
        n_total = spark.table(name).count()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("capture")
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.sum("ibyt").alias("bytes"),
            F.min("ts").alias("first_ms"),
        )
        .withColumn("n_first_drain", F.lit(n_first))
        .withColumn("n_total", F.lit(n_total))
    )


def run_v9_restartable(spark: SparkSession, cap_dir: str, ckpt: str) -> int:
    """One availableNow drain of the v9 stream source into a parquet
    sink at ``ckpt``'s sibling, returning the cumulative row count —
    used by the checkpoint-restart test: each call is a NEW query
    resuming from the committed offset."""
    _register_v9_stream_source(spark)
    out = ckpt + "_out"
    q = (
        spark.readStream.format("v9_stream")
        .option("path", cap_dir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).count()
