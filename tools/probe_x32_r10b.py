"""Decomposition probes for the three superlinear r10 x32 finds.

`tools/probe_x32_r10.py` measured `dedup_cluster_cc` 153.5,
`dedup_pipeline_e2e` 154.4 and `ann_lsh_cosine` 164.3 on the VERBATIM
x32 fixture. All three are pair-generating keys, so the verbatim
fixture's 32x-duplicated rows inflate TRUE pair mass ~1024x (the r8
documented dup-mass class). This tool separates fixture artifact from
plan defect with dup-mass-free variants, the same way r9 separated
vocabulary growth from dup concentration for text_tfidf:

- ``unique-text x32`` (r9 builder): per-copy token suffixes — zero
  cross-copy duplicate mass; each copy block keeps the base pair
  structure, so TRUE pair mass grows exactly 32x. Probes the two
  dedup keys.
- ``unique-emb x32`` (new): copy i rotates every embedding by 5*i
  positions and sign-flips alternating coordinates with a per-copy
  parity. Rotation + uniform sign flips are orthogonal transforms, so
  WITHIN-copy pairwise cosines are bit-preserved (true pairs x32
  exactly) while cross-copy cosines collapse to noise — the
  "vocabulary x32" analog for vectors. Probes ann_lsh_cosine.

Run: python tools/probe_x32_r10b.py
Writes tools/probe_ratios_r10_x32b.json.
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
DIM = 64


def build_unique_emb(spark, base: str, out: str, n: int) -> None:
    """x32 embeddings with per-copy rotation + alternating sign flips
    (orthogonal per copy => within-copy cosines preserved; cross-copy
    cosines ~0). Other tables symlink to the standard x32 fixture."""
    os.makedirs(out, exist_ok=True)
    df = spark.read.parquet(f"{base}/embeddings.parquet")
    maxid = df.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for i in range(n):
        p = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * maxid))
        if i > 0:
            shift = (5 * i) % DIM
            rot = F.concat(
                F.slice("embedding", shift + 1, DIM - shift),
                F.slice("embedding", 1, shift),
            )
            parity = i % 2
            p = p.withColumn(
                "embedding",
                F.transform(
                    rot,
                    lambda x, j: F.when(
                        (j + F.lit(parity)) % 2 == 0, x
                    ).otherwise(-x),
                ),
            )
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    std = f"/tmp/sf_scale_probe_x{N}"
    uniq = "/tmp/sf_x32_unique_text"
    uemb = "/tmp/sf_x32_unique_emb"
    spark = get_spark("probe-x32-r10b")
    if not os.path.exists(f"{std}/embeddings.parquet"):
        build(spark, BASE, std, N)
    if not os.path.exists(f"{uniq}/documents.parquet"):
        t0 = time.perf_counter()
        build_unique_text(spark, BASE, uniq, N)
        link_missing(uniq, std)
        print(f"built {uniq} in {time.perf_counter() - t0:.1f}s", flush=True)
    if not os.path.exists(f"{uemb}/embeddings.parquet"):
        t0 = time.perf_counter()
        build_unique_emb(spark, BASE, uemb, N)
        link_missing(uemb, std)
        print(f"built {uemb} in {time.perf_counter() - t0:.1f}s", flush=True)

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

    probe("dedup_cluster_cc", uniq, "unique-text")
    probe("dedup_pipeline_e2e", uniq, "unique-text")
    probe("ann_lsh_cosine", uemb, "unique-emb")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_ratios_r10_x32b.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
