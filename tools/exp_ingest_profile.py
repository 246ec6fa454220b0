"""Round-12 profiling pass: streaming ingest throughput (VERDICT r11
next-#6). The driver's r11 reading dropped 76k → 60k rows/s; the service
code is unchanged since r10 (the r11 flows.py diff is docstring-only),
and the metric's history swings 34.8k–76.7k. One pass with
per-micro-batch timings to find where the wall time actually goes
(decode? sort? parquet write? stream bookkeeping?) and whether the
steady-state rate is back in band on a quiet box.

Repeats the exact bench._ingest_throughput setup N times in one session
and prints each run's rows/s plus the micro-batch progress breakdown
(durationMs phases) of the drain query.

Run: python tools/exp_ingest_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfdump2clickhouse_spark.service import FlowService, parse_config  # noqa: E402
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402
from nfdump2clickhouse_spark.sources.flows import write_flow_files  # noqa: E402

RUNS = int(os.environ.get("RUNS", "5"))


def one_run(spark, run_idx: int) -> float:
    base = tempfile.mkdtemp(prefix=f"sf_ingest_prof_{run_idx}_")
    watch = os.path.join(base, "watch")
    n_files, rows_per_file = 6, 20000
    t_gen0 = time.perf_counter()
    write_flow_files(
        spark,
        watch,
        n_files=n_files,
        rows_per_file=rows_per_file,
        start=datetime(2024, 3, 1, tzinfo=timezone.utc),
    )
    t_gen = time.perf_counter() - t_gen0
    conf = os.path.join(base, "c.conf")
    with open(conf, "w") as fh:
        fh.write(
            f"[general]\ntable_path = {base}/flows\ncheckpoint_root = {base}/ckpt\n"
            f"max_files_per_trigger = {n_files}\n"
            f"[bench]\nwatchdir = {watch}\n"
        )
    svc = FlowService(spark, parse_config(conf))
    t0 = time.perf_counter()
    queries = svc.start(available_now=True)
    for q in queries:
        q.awaitTermination()
    dt = time.perf_counter() - t0
    rate = n_files * rows_per_file / dt
    print(f"run {run_idx}: gen={t_gen:.2f}s drain={dt:.2f}s rate={rate:,.0f} rows/s")
    for q in queries:
        for p in q.recentProgress:
            d = p.get("durationMs") or {}
            print(
                "  batch", p.get("batchId"),
                "rows", p.get("numInputRows"),
                "trigger", d.get("triggerExecution"),
                "addBatch", d.get("addBatch"),
                "getBatch", d.get("getBatch"),
                "latestOffset", d.get("latestOffset"),
                "queryPlanning", d.get("queryPlanning"),
                "walCommit", d.get("walCommit"),
                "commitOffsets", d.get("commitOffsets"),
            )
    return rate


def main():
    print("load at start:", os.getloadavg())
    spark = get_spark("exp-ingest-profile")
    rates = [one_run(spark, i) for i in range(RUNS)]
    print("rates:", json.dumps([round(r, 1) for r in rates]))
    spark.stop()


if __name__ == "__main__":
    main()
