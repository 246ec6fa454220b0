"""Wave-10 operators (round 2): real binary NetFlow v5 decode, count-min
sketches, Arrow-optimized scalar UDFs, parameterized SQL, session
variables, and the REBALANCE hint.

Same SURVEY §5.3 conventions as waves 4-9.
"""

from __future__ import annotations

import os
import struct
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

# --- NetFlow v5 binary decode ------------------------------------------------

_NF5_HEADER = struct.Struct(">HHIIIIBBH")  # 24 bytes
_NF5_RECORD = struct.Struct(">IIIHHIIIIHHBBBBHHBBH")  # 48 bytes


def decode_v5(content: bytes) -> list[tuple]:
    """Pure v5 decode of one capture: 24-byte header + 48-byte records →
    [(sa, da, sp, dp, pr, ipkt, ibyt), ...]. TOTAL on truncated input:
    the header's record count is trusted only as an upper bound — a cut
    file yields the whole records present and stops (the same
    truncation-totality contract the v9 decoder fuzz pinned)."""
    hdr_fmt, rec_fmt = ">HHIIIIBBH", ">IIIHHIIIIHHBBBBHHBBH"
    hdr_size, rec_size = struct.calcsize(hdr_fmt), struct.calcsize(rec_fmt)
    if len(content) < hdr_size:
        return []
    ver, cnt = struct.unpack_from(">HH", content, 0)[:2]
    if ver != 5:
        return []
    out = []
    off = hdr_size
    for _ in range(cnt):
        if off + rec_size > len(content):
            break  # truncated capture: keep the complete records
        (
            src, dst, _nh, _in, _out2,
            pkts, octets, _first, _last,
            sp, dp, _pad, flags, proto, _tos,
            _sas, _das, _sm, _dm, _p2,
        ) = struct.unpack_from(rec_fmt, content, off)
        off += rec_size
        out.append(
            (
                f"{src >> 24}.{(src >> 16) & 255}.{(src >> 8) & 255}.{src & 255}",
                f"{dst >> 24}.{(dst >> 16) & 255}.{(dst >> 8) & 255}.{dst & 255}",
                sp, dp, int(proto), int(pkts), int(octets),
            )
        )
    return out


def write_netflow_v5(
    path: str,
    n_files: int = 4,
    records_per_file: int = 30,
    sampling_interval: int = 0,
) -> None:
    """Deterministic NetFlow v5 export packets, one per 'rotation': the
    24-byte header + 48-byte records the real nfcapd wire/disk world
    speaks (field layout per Cisco's published v5 spec).

    ``sampling_interval`` > 0 writes the header's sampling field with
    mode 01 (packet-sampled) in the top 2 bits and the interval in the
    low 14 — the input `flows_sampling_correction` corrects for."""
    os.makedirs(path, exist_ok=True)
    sampling = (0b01 << 14) | sampling_interval if sampling_interval else 0
    for f in range(n_files):
        recs = []
        for r in range(records_per_file):
            src = (10 << 24) | (f << 16) | (r % 250)
            dst = (192 << 24) | (168 << 16) | (1 << 8) | (r % 250)
            pkts = 1 + (r * 3 + f) % 100
            octets = pkts * (64 + (r * 13) % 1400)
            recs.append(
                _NF5_RECORD.pack(
                    src, dst, 0, 1, 2,
                    pkts, octets,
                    1000 * r, 1000 * r + 500,
                    1024 + r, 443,
                    0, 0x18, 6, 0,
                    64512, 64513, 24, 24, 0,
                )
            )
        header = _NF5_HEADER.pack(
            5, len(recs), 3_600_000, 1_709_251_200 + 300 * f, 0, 0, 0, 0, sampling
        )
        with open(os.path.join(path, f"nfcapd.{f:04d}"), "wb") as fh:
            fh.write(header + b"".join(recs))


@register("flows_netflow_v5_decode")  # rows-only: binary fixture is
# synthesized locally; the decode↔generator roundtrip is pinned in tests
def flows_netflow_v5_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary NetFlow v5 decode — the closest in-env stand-in for
    the reference's `nfdump -r` hot path (no nfdump binary here, but the
    v5 wire format is public and struct-decodable): `binaryFile` source
    loads each capture whole, a mapInPandas worker struct-unpacks the
    24-byte header + 48-byte records, and the rows aggregate per file.

    Scale shape: one capture file = one row into the Python worker =
    one decode unit, so parallelism is file-count (exactly how rotations
    shard); the unpack loop is O(file bytes) with zero JVM↔Python
    chatter beyond the Arrow batch. For long-term ingest this decode
    body belongs inside the Python DataSource
    (`source_python_datasource`) — same loop, scheduled by Spark."""
    import pandas as pd

    base = tempfile.mkdtemp(prefix="sf_nf5_")
    write_netflow_v5(base)

    def decode(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                cap = os.path.basename(path)
                out.extend((cap, *t) for t in decode_v5(bytes(content)))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "capture", "sa", "da", "sp", "dp", "pr", "ipkt", "ibyt",
                    ],
                )

    raw = spark.read.format("binaryFile").load(os.path.join(base, "nfcapd.*"))
    flows = raw.select("path", "content").mapInPandas(
        decode,
        "capture string, sa string, da string, sp int, dp int, pr int,"
        " ipkt long, ibyt long",
    )
    return flows.groupBy("capture").agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.sum("ipkt").alias("pkts"),
        F.sum("ibyt").alias("bytes"),
        F.countDistinct("sa").alias("n_src"),
    )


# --- count-min sketch --------------------------------------------------------


@register("agg_countmin_sketch")  # rows-only: sketch estimates are
# one-sided-biased by construction; the bound contract is in tests
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (engine-native `count_min_sketch` aggregate,
    eps=1%, conf=95%): fixed-KB frequency summaries with the one-sided
    guarantee true ≤ estimate ≤ true + eps·N — the third sketch family
    next to HLL (`agg_hll_sketch_merge`, distincts) and Misra-Gries
    (`topk_spacesaving`, exact-bound heavy hitters). CMS is the
    mergeable one to ship across days when you need per-ITEM frequency
    queries, not just the top-k. Emits the sketch's size and the
    estimate-vs-true comparison for the 5 event types (probed via a
    second tiny pass; the sketch itself is one aggregate over the
    corpus).

    NULL items are not sketch members — gated two-sided (the NULL group
    key otherwise reaches the driver-side sorted() and Python's `<`
    chokes on None vs str; EDGE_SWEEP_r10 class A)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    sk_row = e.agg(
        F.count_min_sketch("event_type", F.lit(0.01), F.lit(0.95), F.lit(42)).alias(
            "sk"
        ),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    true = {
        r.event_type: r.cnt
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    rows = [
        (t, int(true[t]), len(sk_row.sk), int(sk_row.n)) for t in sorted(true)
    ]
    return spark.createDataFrame(
        rows, "item string, true_count long, sketch_bytes int, n_total long"
    )


# --- Arrow-optimized scalar UDF ----------------------------------------------


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT event_id,
           ROUND(value * 1.1 + CAST(length(event_type) AS DOUBLE), 4) AS adj
    FROM events WHERE event_id % 10 = 0
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (`@udf(useArrow=True)`, Spark 4): the
    row-at-a-time API with Arrow-batched transport — ~2-5× over pickled
    UDFs with zero signature change, completing the §2.10 ladder:
    python scalar (pickled) → THIS (arrow transport) → pandas_udf
    (vectorized compute) → built-in Columns (JVM codegen, the real
    answer for this arithmetic — same disclosure as `udf_python_scalar`).
    """
    from pyspark.sql.functions import udf

    @udf("double", useArrow=True)
    def adjust(value: float, etype: str) -> float:
        return round(value * 1.1 + float(len(etype)), 4)

    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    return e.select(
        "event_id", adjust(F.col("value"), F.col("event_type")).alias("adj")
    )


# --- parameterized SQL -------------------------------------------------------


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_totalprice > 50000
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers, Spark 3.4+/4): the
    injection-safe templating surface — parameters bind as LITERALS in
    the plan (so constant folding and scan pushdown see the real values,
    unlike string concat which invites both injection and cache misses).
    The operational twin of `filter_nfdump_lang`'s compiled filters:
    external inputs become plan constants, never SQL text."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("w10_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM w10_orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :minprice
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1996-01-01", "minprice": 50000},
    )


# --- session variables -------------------------------------------------------


@register(
    "sql_session_variables",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity >= 40
    GROUP BY l_returnflag
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE / SET VARIABLE, Spark 4): typed,
    session-scoped state referenced directly in queries — how multi-step
    SQL workflows thread thresholds between statements without client-
    side templating. The variable binds as a foldable expression, so
    pushdown sees the literal, same as parameter markers."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("w10_lineitem")
    spark.sql("DECLARE OR REPLACE VARIABLE w10_min_qty INT DEFAULT 0")
    spark.sql("SET VARIABLE w10_min_qty = 40")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM w10_lineitem
        WHERE l_quantity >= w10_min_qty
        GROUP BY l_returnflag
        """
    )


# --- REBALANCE hint ----------------------------------------------------------


@register("hint_rebalance")  # rows-only: output is a layout property
# (file count/sizes), not a value the oracle can see
def hint_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REBALANCE hint: AQE-driven output repartitioning that
    splits skewed partitions AND coalesces tiny ones to target-sized
    chunks — the write-path answer to both the small-files problem
    (`maint_compaction` is the after-the-fact repair; this prevents it)
    and straggler writes from skewed keys. Unlike repartition(n) it
    needs no magic number: AQE sizes from runtime statistics. Emits the
    before/after partition counts of a deliberately skewed projection."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    skewed = li.repartition(64, "l_returnflag")  # 3 keys → ≤3 real + 61 empty
    rebalanced = skewed.hint("rebalance")
    out = tempfile.mkdtemp(prefix="sf_reb_")
    rebalanced.write.mode("overwrite").parquet(out)
    import glob

    n_files = len(glob.glob(os.path.join(out, "*.parquet")))
    n_rows = spark.read.parquet(out).count()
    return spark.createDataFrame(
        [(64, n_files, n_rows)],
        "partitions_before int, files_after int, rows long",
    )
