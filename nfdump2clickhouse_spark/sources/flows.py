"""Flow-record ingest (SURVEY §1.2, §3.1 E2 [P]).

The reference shells out to `nfdump -r <file> -o csv`, loads the CSV with
pandas, projects 48 → 13 columns, and tags each row with a per-watch-dir
`flowsrc` [P]. Here the same dataflow is declarative: an explicit-schema
CSV (or parquet) read, a Column-only projection, and derived numeric
address columns so CIDR predicates push down (SURVEY §4.3.2).

Also hosts the deterministic synthetic flow generator used by streaming
and ingest tests (FIXTURES.md §B) — nfcapd-style 5-minute rotated files.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta, timezone

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ip import ipv4_to_num
from ..schemas import FLOWS, NFDUMP_CSV_RAW

#: columns kept from the raw nfdump record (the reference's projection [P])
KEEP = ["ts", "te", "td", "sa", "da", "sp", "dp", "pr", "flg", "ipkt", "ibyt", "ra"]


def project_flows(raw: DataFrame, flowsrc: str) -> DataFrame:
    """48-col raw nfdump CSV frame → 13-col typed analytical schema.

    Adds the constant `flowsrc` tag (one per watched dir [P]) plus derived
    `sa_num`/`da_num` LongType addresses and a `dt` date partition column —
    the two layout choices that buy data skipping at 100 TB (SURVEY §4.3).
    """
    return raw.select(
        F.to_timestamp("ts").alias("ts"),
        F.to_timestamp("te").alias("te"),
        F.col("td").cast("double").alias("td"),
        F.col("sa"),
        F.col("da"),
        F.col("sp").cast("int").alias("sp"),
        F.col("dp").cast("int").alias("dp"),
        F.nullif(F.col("pr"), F.lit("")).alias("pr"),
        F.col("flg"),
        F.col("ipkt").cast("bigint").alias("ipkt"),
        F.col("ibyt").cast("bigint").alias("ibyt"),
        F.col("ra"),
        F.lit(flowsrc).alias("flowsrc"),
    ).withColumns(
        {
            "sa_num": ipv4_to_num(F.col("sa")),
            "da_num": ipv4_to_num(F.col("da")),
            "dt": F.to_date("ts"),
        }
    )


def read_v9_directory(
    spark: SparkSession, path: str, flowsrc: str, exporter: str | None = None
) -> DataFrame:
    """Native template-decode of a directory of v9/IPFIX capture files
    into the SAME 13-col + layout shape as ``project_flows`` — the
    nfdump-subprocess-free ingest seam (SURVEY §1.2; VERDICT r3 next-#1).

    One capture file decodes whole on one executor (template state never
    crosses rotation files — exporters re-announce per rotation), via
    ``binaryFile`` + Arrow-batched ``mapInPandas``; the decoder emits
    epoch-ms integers which are cast to TimestampType here. The result
    feeds ``sinks.write_flows_partitioned`` unchanged."""
    from .netflow_v9 import FLOW_COLUMNS

    def decode(batches):
        import pandas as pd

        from nfdump2clickhouse_spark.sources.netflow_v9 import (
            decode_flow_stream,
        )
        from nfdump2clickhouse_spark.sources.nffile import is_nffile

        for pdf in batches:
            for content in pdf["content"]:
                content = bytes(content)
                if is_nffile(content):  # wrong-source guard: nfcapd's
                    # on-disk record format is NOT an export-packet
                    # stream — the silent-zero-rows failure mode VERDICT
                    # r4 missing-#2 names
                    raise ValueError(
                        "nfdump nffile magic detected: this directory "
                        "holds nfcapd on-disk files, not raw v9/IPFIX "
                        "export packets — use format=nffile (native) "
                        "or decode_cmd"
                    )
                flows = decode_flow_stream(content, exporter=exporter)
                if flows:
                    yield pd.DataFrame(flows, columns=FLOW_COLUMNS)

    raw = spark.read.format("binaryFile").load(path)
    decoded = raw.select("content").mapInPandas(
        decode,
        "ts long, te long, td double, sa string, da string, sp int, dp int,"
        " pr string, flg string, ipkt long, ibyt long, ra string",
    )
    return _finalize_decoded(decoded, flowsrc)


def _finalize_decoded(decoded: DataFrame, flowsrc: str) -> DataFrame:
    """Epoch-ms decoder output → FLOWS contract + layout columns (shared
    tail of both native binary sources)."""
    return decoded.select(
        F.timestamp_millis("ts").alias("ts"),
        F.timestamp_millis("te").alias("te"),
        "td", "sa", "da", "sp", "dp", "pr", "flg", "ipkt", "ibyt", "ra",
        F.lit(flowsrc).alias("flowsrc"),
    ).withColumns(
        {
            "sa_num": ipv4_to_num(F.col("sa")),  # NULL for IPv6 (v4-only index)
            "da_num": ipv4_to_num(F.col("da")),
            "dt": F.to_date("ts"),
        }
    )


def read_nffile_directory(
    spark: SparkSession, path: str, flowsrc: str, exporter: str | None = None
) -> DataFrame:
    """Native decode of a directory of nfdump ON-DISK files (nffile
    layout v1 OR v2 — nfdump 1.6 and 1.7+ archives mix freely; what
    ``nfcapd`` actually writes) into the same 13-col + layout shape as
    ``project_flows`` (VERDICT r4 missing-#2, v1 closed r11; format
    spec in ``sources/nffile.py``).

    Identical scale shape to ``read_v9_directory``: one nfcapd file
    decodes whole on one executor via ``binaryFile`` + Arrow-batched
    ``mapInPandas`` (the file is the natural unit — blocks inside it
    share the file header's codec), and Spark owns scheduling and
    retries. Structural misconfiguration (raw export packets, missing
    codec) raises the decoder's actionable ValueError instead of
    yielding zero rows silently."""
    from .netflow_v9 import FLOW_COLUMNS

    def decode(batches):
        import pandas as pd

        from nfdump2clickhouse_spark.sources.nffile import decode_nffile

        for pdf in batches:
            for content in pdf["content"]:
                flows = decode_nffile(bytes(content), exporter=exporter)
                if flows:
                    yield pd.DataFrame(flows, columns=FLOW_COLUMNS)

    raw = spark.read.format("binaryFile").load(path)
    decoded = raw.select("content").mapInPandas(
        decode,
        "ts long, te long, td double, sa string, da string, sp int, dp int,"
        " pr string, flg string, ipkt long, ibyt long, ra string",
    )
    return _finalize_decoded(decoded, flowsrc)


def read_flow_csv(spark: SparkSession, path: str, flowsrc: str) -> DataFrame:
    """Typed read of `nfdump -o csv` output (explicit schema, never
    inferred — SURVEY §1.2)."""
    raw = (
        spark.read.schema(NFDUMP_CSV_RAW)
        .option("header", True)
        .csv(path)
    )
    return project_flows(raw, flowsrc)


def stream_flow_dir(spark: SparkSession, watch_dir: str, flowsrc: str) -> DataFrame:
    """Streaming source over a watched directory of rotated parquet flow
    files — Spark's seen-files log replaces the reference's watchdog +
    completeness heuristics (SURVEY §3.2 E2'); `cleanSource=archive` (set
    by callers that own the dir) replaces post-insert deletion."""
    return (
        spark.readStream.schema(FLOWS)
        .option("maxFilesPerTrigger", 1)  # one nfcapd rotation per micro-batch
        .parquet(watch_dir)
        .withColumn("flowsrc", F.coalesce("flowsrc", F.lit(flowsrc)))
    )


# --- deterministic synthetic flow data (FIXTURES.md §B) ---------------------


def _h(*parts: object) -> int:
    """Stable tiny hash for reproducible pseudo-random fields."""
    s = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.sha1(s).digest()[:6], "big")


def flow_rows(
    file_idx: int, n_rows: int, start: datetime
) -> list[dict]:
    rows = []
    for i in range(n_rows):
        h = _h(file_idx, i)
        ts = start + timedelta(seconds=(h % 300))
        td = (h >> 8) % 120 + ((h >> 4) % 100) / 100.0
        rows.append(
            {
                "ts": ts,
                "te": ts + timedelta(seconds=td),
                "td": td,
                "sa": f"10.{h % 4}.{(h >> 2) % 8}.{(h >> 5) % 32}",
                "da": f"192.168.{(h >> 7) % 4}.{(h >> 9) % 16}",
                "sp": 1024 + h % 50000,
                "dp": [80, 443, 53, 22, 8080][h % 5],
                "pr": [None, "TCP", "UDP", "ICMP", "TCP"][h % 5],
                "flg": "...A.S." if h % 3 else "....S..",
                "ipkt": 1 + (h % 1000) ** 2 % 9973,
                "ibyt": 40 + (h % 100000),
                "ra": f"172.16.0.{1 + h % 2}",
                "flowsrc": None,
            }
        )
    return rows


#: pyarrow schema mirroring schemas.FLOWS (µs timestamps — Spark-readable)
def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("ts", pa.timestamp("us")),
            ("te", pa.timestamp("us")),
            ("td", pa.float64()),
            ("sa", pa.string()),
            ("da", pa.string()),
            ("sp", pa.int32()),
            ("dp", pa.int32()),
            ("pr", pa.string()),
            ("flg", pa.string()),
            ("ipkt", pa.int64()),
            ("ibyt", pa.int64()),
            ("ra", pa.string()),
            ("flowsrc", pa.string()),
        ]
    )


def write_flow_files(
    spark: SparkSession,
    out_dir: str,
    n_files: int = 3,
    rows_per_file: int = 200,
    start: datetime | None = None,
    fmt: str = "parquet",
    tag: str = "",
    arrival: int = 0,
) -> list[str]:
    """Materialize nfcapd-style rotated files (`nfcapd.YYYYMMDDhhmm.*`),
    ONE real file per simulated 5-min window (exactly like one nfcapd
    capture — the streaming file source lists plain files, not part-file
    directories), in mod-time order so rotations replay in sequence.

    Each file's mtime is SET explicitly to its rotation time plus
    `arrival` hours (os.utime) — Spark's FileStreamSource lists files in
    mod-time order, so late/replayed rotations are modeled by `arrival=1`
    instead of wall-clock sleeps (deterministic and saves ~1s per call)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    start = start or datetime(2024, 3, 1, tzinfo=timezone.utc)
    os.makedirs(out_dir, exist_ok=True)
    schema = _arrow_schema()
    paths = []
    for fidx in range(n_files):
        fstart = start + timedelta(minutes=5 * fidx)
        # `tag` distinguishes replayed/late rotations (nfcapd.…​.retry-style)
        # from the original: without it a replay would silently OVERWRITE
        # the on-time file instead of arriving as a new one
        name = f"nfcapd.{fstart:%Y%m%d%H%M}" + (f".{tag}" if tag else "")
        rows = flow_rows(fidx, rows_per_file, fstart.replace(tzinfo=None))
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        tbl = pa.Table.from_pydict(cols, schema=schema)
        if fmt == "parquet":
            path = os.path.join(out_dir, f"{name}.parquet")
            pq.write_table(tbl, path)
        else:
            # full 48-field nfdump CSV record (the real `nfdump -o csv`
            # shape [P]); fields we don't synthesize are zeroed
            import csv as _csv

            from ..schemas import NFDUMP_CSV_FIELDS

            path = os.path.join(out_dir, f"{name}.csv")
            with open(path, "w", newline="") as fh:
                w = _csv.writer(fh)
                w.writerow(NFDUMP_CSV_FIELDS)
                for r in rows:
                    full = {k: "0" for k in NFDUMP_CSV_FIELDS}
                    for k in KEEP:
                        v = r[k]
                        full[k] = "" if v is None else str(v)
                    w.writerow([full[k] for k in NFDUMP_CSV_FIELDS])
        mt = fstart.timestamp() + arrival * 3600
        os.utime(path, (mt, mt))
        paths.append(path)
    return paths
