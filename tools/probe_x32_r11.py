"""Round-11 32x probes: the two touched keys whose r11 edits changed
LOGIC rather than just adding pushdown-able NULL gates —
`dedup_near_minhash` (degenerate docs now carry a per-doc sentinel
shingle so the MinHashLSH input is valid by construction) and
`stats_ks_test` (plan-time int64/decimal width branch on the driver's
n0*n1). The other 33 r11 touches are scan-side isNotNull filters with
no plan-shape change; their 8x re-ratios (probe_ratios_r11_touched)
are the sufficient evidence. Both keys run on the standard verbatim
x32 fixture AND the unique-text x32 (dup-mass-free) so the dup-mass
contract stays decomposed, r10-style.

Run: python tools/probe_x32_r11.py
Writes tools/probe_ratios_r11_x32.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfdump2clickhouse_spark import registry  # noqa: E402
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402
from tools.probe_x32_r9 import build_unique_text, link_missing  # noqa: E402
from tools.scale_probe import build  # noqa: E402

BASE = "/root/testdata/sf0.1"
N = 32


def main() -> None:
    std = f"/tmp/sf_scale_probe_x{N}"
    uniq = "/tmp/sf_x32_unique_text"
    spark = get_spark("probe-x32-r11")
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

    probe("dedup_near_minhash", std, "x32")
    probe("dedup_near_minhash", uniq, "unique-text")
    probe("stats_ks_test", std, "x32")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_ratios_r11_x32.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
