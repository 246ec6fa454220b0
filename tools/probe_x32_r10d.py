"""Fifth-batch completion: the unique-text keys the shingle-curve OOM
crash skipped in probe_x32_r10c, the re-probe of the fixed
`dedup_shingle_size_curve`, and a `time-dilated` x32 events variant
for `join_interval_bin`.

The standard x32 builder repeats event timestamps VERBATIM, so every
3-minute bin gets 32x rows on BOTH join sides — true overlap pairs
grow ~1024x, the temporal analog of the dup-mass class. The
time-dilated variant offsets copy i's timestamps by i*(span+1h): per-
bin density stays at base (a month of traffic instead of 32x one
day), so the wall ratio measures the PLAN, not fixture-compressed
co-occurrence.

Run: python tools/probe_x32_r10d.py
Writes tools/probe_ratios_r10_x32d.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nfdump2clickhouse_spark import registry  # noqa: E402
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402
from tools.scale_probe import build  # noqa: E402
from tools.probe_x32_r9 import build_unique_text, link_missing  # noqa: E402

BASE = "/root/testdata/sf0.1"
N = 32

UNIQUE_TEXT_KEYS = [
    "dedup_shingle_size_curve",
    "dedup_substring_spans",
    "dedup_threshold_curve",
    "text_containment",
    "text_line_dedup",
]


def build_time_dilated(spark, base: str, out: str, n: int) -> None:
    """x32 events with copy i shifted by i*(span+1h): event rate and
    per-bin density stay at base; only the covered time range grows."""
    os.makedirs(out, exist_ok=True)
    df = spark.read.parquet(f"{base}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    row = df.select(us.alias("us"), "event_id", "user_id").agg(
        F.max("event_id").alias("mi"),
        F.max("user_id").alias("mu"),
        (F.max("us") - F.min("us")).alias("span"),
    ).collect()[0]
    step_sec = row.span // 1_000_000 + 3600  # span + 1h, whole seconds
    parts = []
    for i in range(n):
        parts.append(
            df.withColumn("event_id", F.col("event_id") + F.lit(i * (row.mi + 1)))
            .withColumn("user_id", F.col("user_id") + F.lit(i * (row.mu + 1)))
            # INTERVAL addition preserves the fixture's ts type
            # (TIMESTAMP_NTZ in driver-generated parquet)
            .withColumn("ts", F.expr(f"ts + INTERVAL {i * step_sec} SECOND"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/events.parquet")


def main() -> None:
    std = f"/tmp/sf_scale_probe_x{N}"
    uniq = "/tmp/sf_x32_unique_text"
    dil = "/tmp/sf_x32_time_dilated"
    spark = get_spark("probe-x32-r10d")
    if not os.path.exists(f"{std}/embeddings.parquet"):
        build(spark, BASE, std, N)
    if not os.path.exists(f"{uniq}/documents.parquet"):
        build_unique_text(spark, BASE, uniq, N)
        link_missing(uniq, std)
    if not os.path.exists(f"{dil}/events.parquet"):
        t0 = time.perf_counter()
        build_time_dilated(spark, BASE, dil, N)
        link_missing(dil, std)
        print(f"built {dil} in {time.perf_counter() - t0:.1f}s", flush=True)

    specs = registry.all_specs()

    def run(key: str, sf: str) -> float:
        t0 = time.perf_counter()
        specs[key].fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {}

    def probe(key: str, fixture: str, tag: str) -> None:
        run(key, BASE)  # warm
        tb = min(run(key, BASE), run(key, BASE))
        ts = min(run(key, fixture), run(key, fixture))
        results[f"{key}@{tag}"] = {
            "base": round(tb, 2),
            "x32": round(ts, 2),
            "ratio": round(ts / tb, 1),
        }
        print(
            f"{key}@{tag}: base {tb:.2f}s x32 {ts:.2f}s ratio {ts / tb:.1f}",
            flush=True,
        )

    for k in UNIQUE_TEXT_KEYS:
        probe(k, uniq, "unique-text")
    probe("join_interval_bin", dil, "time-dilated")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_ratios_r10_x32d.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
