"""Fifth 32x batch: the last 23 keys whose only scale evidence was the
8x tier (r3-r6 probes). After this run every registry key with a
data-heavy shape has a 32x measurement or a documented by-contract
exclusion.

The seven dup-mass-family keys (shingle/containment/line-dedup
pipelines) run on the r9 ``unique-text`` variant — the honest fixture
for pair-generating keys (cross-copy duplicate mass zero, true pair
mass exactly 32x); the rest run on the standard RI-preserving x32
fixture.

Run: python tools/probe_x32_r10c.py
Writes tools/probe_ratios_r10_x32c.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfdump2clickhouse_spark import registry  # noqa: E402
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402
from tools.scale_probe import build  # noqa: E402
from tools.probe_x32_r9 import build_unique_text, link_missing  # noqa: E402

BASE = "/root/testdata/sf0.1"
N = 32

STANDARD_KEYS = [
    "agg_quantile_weighted",
    "events_growth_accounting",
    "events_interarrival_stats",
    "events_sequence_match",
    "flows_stat_report",
    "flows_traffic_matrix",
    "join_interval_bin",
    "maint_join_cardinality_exact",
    "maint_skew_report",
    "privacy_pseudonymize",
    "privacy_t_closeness",
    "sample_negative_mining",
    "sample_ppswor",
    "text_zipf_slope",
    "win_session",
    "win_sliding_distinct",
]

UNIQUE_TEXT_KEYS = [
    "corpus_report_e2e",
    "dedup_canonical_doc",
    "dedup_shingle_size_curve",
    "dedup_substring_spans",
    "dedup_threshold_curve",
    "text_containment",
    "text_line_dedup",
]


def main() -> None:
    std = f"/tmp/sf_scale_probe_x{N}"
    uniq = "/tmp/sf_x32_unique_text"
    spark = get_spark("probe-x32-r10c")
    if not os.path.exists(f"{std}/embeddings.parquet"):
        build(spark, BASE, std, N)
    if not os.path.exists(f"{uniq}/documents.parquet"):
        build_unique_text(spark, BASE, uniq, N)
        link_missing(uniq, std)

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

    for k in STANDARD_KEYS:
        probe(k, std, "std")
    for k in UNIQUE_TEXT_KEYS:
        probe(k, uniq, "unique-text")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_ratios_r10_x32c.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
