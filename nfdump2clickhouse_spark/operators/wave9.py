"""Wave-9 operators (round 2): Python DataSource API, state-store
introspection, inline observed metrics, grouping_id, and multiset set
operations.

Same SURVEY §5.3 conventions as waves 4-8.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

# --- custom Python DataSource ------------------------------------------------


@register("source_python_datasource")  # rows-only: synthetic source; the
# partition-parallelism and row contracts are pinned in tests
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source via the Python DataSource API (Spark 4's
    `pyspark.sql.datasource`): the clean seam for the reference's
    `nfdump -r <file> -o csv` decode loop — each InputPartition is one
    capture file, `read(partition)` shells out/decodes IN PYTHON on the
    executor, and Spark handles distribution, retries, and Arrow
    transfer. This replaces the driver-side staging dance
    (`FlowService.decode_cmd` models today's subprocess path) with a
    first-class parallel source: `spark.read.format("nfcapd")` at
    100 TB = one partition per rotation file across the fleet.

    The demo source synthesizes 4 deterministic 'files' of flow-like
    rows (no nfdump binary in env — SURVEY §8); the decode body is the
    swap point."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class CaptureReader(DataSourceReader):
        def __init__(self, n_files: int = 4, rows_per_file: int = 50):
            self.n_files = n_files
            self.rows_per_file = rows_per_file

        def partitions(self):
            # one partition per simulated capture file → Spark schedules
            # them across executors exactly like rotation files
            return [InputPartition(i) for i in range(self.n_files)]

        def read(self, partition):
            fidx = partition.value
            # deterministic stand-in for `nfdump -r file_{fidx} -o csv`
            for r in range(self.rows_per_file):
                yield (
                    fidx,
                    r,
                    f"10.0.{fidx}.{r % 250}",
                    f"192.168.1.{r % 250}",
                    100 + (r * 7 + fidx) % 900,
                )

    class CaptureSource(DataSource):
        @classmethod
        def name(cls):
            return "wave9_nfcapd"

        def schema(self):
            return "file_idx int, row_idx int, sa string, da string, ibyt long"

        def reader(self, schema):
            return CaptureReader()

    spark.dataSource.register(CaptureSource)
    raw = spark.read.format("wave9_nfcapd").load()
    return raw.groupBy("file_idx").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("ibyt").alias("bytes"),
        F.countDistinct("sa").alias("n_src"),
    )


# --- state-store introspection -----------------------------------------------


@register("stream_state_reader")  # rows-only: state layout is engine-
# internal; the keys==groups invariant is pinned in tests
def stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store data source (Spark 4 `statestore` format): read the
    OPERATOR STATE of a streaming aggregation straight from its
    checkpoint — the debugging/ops capability that turns 'why is my
    streaming agg wrong/huge?' from guesswork into a query. At 100 TB
    this is how state bloat is diagnosed (group-key skew shows up as
    partition_id row counts) and how state is audited after an
    incident, with no replay.

    Demo: a per-user streaming count over one rotation's events (the
    deterministic `event_id < 1000` slice — a bare `limit` would pick
    whatever rows partition read order serves first, so the test's
    independently recomputed group count could flake; ADVICE r2), then
    the checkpoint's state read back and summarized per shuffle
    partition."""
    src, ckpt = tempfile.mkdtemp(prefix="sf_ssr_"), tempfile.mkdtemp(
        prefix="sf_ssrc_"
    )
    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id")
        .filter(F.col("event_id") < 1000)
    )
    e.write.mode("overwrite").parquet(os.path.join(src, "f0"))
    sdf = spark.readStream.schema("user_id long, event_id long").parquet(
        src + "/*"
    )
    from ..streaming.pipeline import _demo_state_partitions

    with _demo_state_partitions(spark):
        q = (
            sdf.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("wave9_state_demo")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return state.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_state_keys")
    )


# --- inline observed metrics -------------------------------------------------


@register(
    "observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           -- COALESCE: DuckDB count_if over zero rows is NULL where
           -- Spark's is 0 — a count of an empty table is truthfully 0
           -- (r7 class-2 convention, applied r9 per SURVEY §17.1)
           CAST(COALESCE(count_if(value > 500), 0) AS BIGINT) AS n_big,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline data-quality metrics with `df.observe()`: named aggregates
    piggyback on the SAME pass as the real action — zero extra scans —
    and surface through the Observation handle / listener bus. The
    pattern every production pipeline needs for row-count reconciliation
    and freshness gates: at 100 TB a separate metrics query doubles the
    scan bill; observe() makes it free. The observed values are returned
    AS the result here so the driver hash-checks that the piggybacked
    aggregates equal the oracle's direct ones."""
    from pyspark.sql import Observation

    e = table(spark, sf_dir, "events")
    obs = Observation("quality")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("value") > 500).alias("n_big"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    # the action the metrics ride on (noop sink = full scan, no transfer)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_big"], m["total_value"])],
        "n_rows long, n_big long, total_value double",
    )


# --- grouping_id over cube ---------------------------------------------------


@register(
    "agg_grouping_id",
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS etype,
           COALESCE(CAST(dow AS VARCHAR), '(all)') AS dow_s,
           GROUPING(event_type) * 2 + GROUPING(dow) AS gid,
           COUNT(*) AS n
    FROM (
      SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow FROM events
    )
    GROUP BY CUBE (event_type, dow)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID over a CUBE — the bitmask that tells subtotal rows
    apart from data rows whose key happens to be NULL (the classic
    rollup-report bug; `agg_cube` shows the totals, this key shows the
    disambiguation). Spark's grouping_id() bit order (first grouping
    column = MSB) is replicated in the oracle as GROUPING(a)*2 +
    GROUPING(b), pinning the cross-engine contract. Cube = Expand ×4
    then one partial+final agg — same single-scan shape as agg_cube."""
    e = table(spark, sf_dir, "events")
    base = e.select(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    )
    return (
        base.cube("event_type", "dow")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("etype"),
            F.coalesce(F.col("dow").cast("string"), F.lit("(all)")).alias(
                "dow_s"
            ),
            "gid",
            "n",
        )
    )


# --- multiset set operations -------------------------------------------------


@register(
    "set_intersect_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
    INTERSECT ALL
    SELECT user_id, event_type FROM events WHERE event_id % 3 = 0
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection keeping min(m, n)
    duplicates per row (§2.7's set ops are the DISTINCT forms; the ALL
    forms are what reconciliation queries need, where duplicate COUNTS
    carry meaning). Planned as one hash shuffle per side + a counted
    merge — same cost shape as the distinct form, no dedup pass."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id"
    )
    a = e.filter(F.col("event_id") % 2 == 0).select("user_id", "event_type")
    b = e.filter(F.col("event_id") % 3 == 0).select("user_id", "event_type")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
    EXCEPT ALL
    SELECT user_id, event_type FROM events WHERE event_id % 3 = 0
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference keeping max(m − n, 0) copies:
    the 'what rows did the rewrite lose, counted' audit (a DISTINCT
    except hides lost duplicates entirely — exactly the rows a dedup
    bug eats). Same one-shuffle-per-side counted-merge plan as
    INTERSECT ALL."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id"
    )
    a = e.filter(F.col("event_id") % 2 == 0).select("user_id", "event_type")
    b = e.filter(F.col("event_id") % 3 == 0).select("user_id", "event_type")
    return a.exceptAll(b)
