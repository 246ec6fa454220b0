"""8x re-ratio for keys touched in the current round.

Reuses scale_probe's RI-preserving x8 fixture builder, probes only the
keys given on argv, and writes tools/probe_ratios_r{N}_touched.json in
the same shape the judge reads (base / x8 / ratio per key).

Run: python tools/probe_touched.py ROUND KEY [KEY...]
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

BASE = "/root/testdata/sf0.1"


def main() -> None:
    rnd, keys = sys.argv[1], sys.argv[2:]
    out_dir = "/tmp/sf_scale_probe_x8"
    spark = get_spark("probe-touched")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        t0 = time.perf_counter()
        build(spark, BASE, out_dir, 8)
        print(f"built {out_dir} in {time.perf_counter() - t0:.1f}s", flush=True)
    specs = registry.all_specs()

    def run(key: str, sf: str) -> float:
        t0 = time.perf_counter()
        specs[key].fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {}
    for key in keys:
        run(key, BASE)  # warm
        tb = min(run(key, BASE), run(key, BASE))
        ts = min(run(key, out_dir), run(key, out_dir))
        results[key] = {
            "base": round(tb, 2),
            "x8": round(ts, 2),
            "ratio": round(ts / tb, 1),
        }
        print(f"{key}: base {tb:.2f}s x8 {ts:.2f}s ratio {ts / tb:.1f}", flush=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"probe_ratios_r{rnd}_touched.json",
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
