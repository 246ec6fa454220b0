"""Round-9 extension of the 32x probe tier (VERDICT r8 next-#9).

Three fixture variants, all derived from sf0.1:

- **standard x32** (``tools/scale_probe.build``): RI-preserving key
  offsets, texts/embeddings repeated verbatim — the r8 tier's fixture.
  Used here for the graph/iterative additions.
- **unique-text x32**: every copy i > 0 suffixes each whitespace token
  with ``xi``, so shingles/terms are DISTINCT across copies — vocabulary
  grows 32x while cross-copy duplicate mass is ZERO. This separates the
  two growth axes the verbatim fixture conflates for text keys
  (text_tfidf's r8 ratio of 12.7 rode on a corpus whose document
  frequencies, not vocabulary, scaled).
- **jittered-value x32**: l_extendedprice/l_quantity offset by i cents
  (and value by i/100 in events) per copy, so numeric VALUES are
  distinct across copies — the grouped-rank family's tie-peer windows
  (AVG over (grp, value)) otherwise see 32x tie mass that no organic
  scale-up produces.

Run: python tools/probe_x32_r9.py
Writes tools/probe_ratios_r9_x32.json (same shape the judge reads).
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

BASE = "/root/testdata/sf0.1"
N = 32

STANDARD_KEYS = [
    # graph / iterative family (r8 tier had only graph_kcore at 2.4)
    "graph_pagerank",
    "graph_label_propagation",
    "dedup_semantic_cluster",   # Lloyd rounds; duplicate VECTORS are fine
    "events_survival_km",
    # grouped-rank family on its natural fixture
    "agg_group_quantiles_exact",
    "curriculum_binning",
    "ml_eval_auc",
    "ml_eval_lift",
    "flows_billing_95th",
]

UNIQUE_TEXT_KEYS = ["text_tfidf"]

JITTERED_KEYS = ["agg_winsorized_mean", "stats_spearman_corr"]


def build_unique_text(spark, base: str, out: str, n: int) -> None:
    """x32 documents with per-copy token suffixes (distinct vocabulary,
    zero cross-copy dup mass); all other tables reuse the standard x32
    fixture via the caller."""
    os.makedirs(out, exist_ok=True)
    df = spark.read.parquet(f"{base}/documents.parquet")
    maxid = df.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(n):
        p = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * maxid))
        if i > 0:
            tag = F.lit(f"x{i}")
            p = p.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, tag),
                    ),
                    " ",
                ),
            )
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/documents.parquet")


def build_jittered(spark, base: str, out: str, n: int) -> None:
    """x32 lineitem/events with per-copy cent offsets on the ranked
    value columns — distinct values per copy, so grouped-rank tie-peer
    windows scale on data, not on synthetic 32x tie mass."""
    os.makedirs(out, exist_ok=True)
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    mx = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    parts = []
    for i in range(n):
        parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * mx))
            .withColumn(
                "l_extendedprice", F.col("l_extendedprice") + F.lit(i) / 100.0
            )
            .withColumn(
                "l_quantity", F.col("l_quantity") + F.lit(i) / 100.0
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")


def link_missing(primary: str, fallback: str) -> None:
    """Symlink any table the variant did not rebuild to the standard x32
    fixture (dims + untouched facts)."""
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        dst = f"{primary}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{fallback}/{t}.parquet", dst)


def main() -> None:
    std = f"/tmp/sf_scale_probe_x{N}"
    uniq = "/tmp/sf_x32_unique_text"
    jitt = "/tmp/sf_x32_jittered"
    spark = get_spark("probe-x32-r9")
    if not os.path.exists(f"{std}/embeddings.parquet"):
        t0 = time.perf_counter()
        build(spark, BASE, std, N)
        print(f"built {std} in {time.perf_counter() - t0:.1f}s", flush=True)
    if not os.path.exists(f"{uniq}/documents.parquet"):
        t0 = time.perf_counter()
        build_unique_text(spark, BASE, uniq, N)
        link_missing(uniq, std)
        print(f"built {uniq} in {time.perf_counter() - t0:.1f}s", flush=True)
    if not os.path.exists(f"{jitt}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_jittered(spark, BASE, jitt, N)
        link_missing(jitt, std)
        print(f"built {jitt} in {time.perf_counter() - t0:.1f}s", flush=True)

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
    for k in JITTERED_KEYS:
        probe(k, jitt, "jittered")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_ratios_r9_x32.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
