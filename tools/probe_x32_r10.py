"""Round-10 extension of the 32x probe tier (VERDICT r9 next-#8).

Targets the heaviest certified shapes the r8/r9 tiers left unprobed
(SCALE_PROBE_r9 residual list): pair-generating graph/dedup keys,
iterative tokenizer training, sampled-pair embedding diagnostics,
windowed-percentile and path/sequence event keys, plus the r10 growth
key. Standard RI-preserving x32 fixture (``tools/scale_probe.build``)
— dup-mass-sensitive text keys already have their unique-text variant
ratios from r9.

Run: python tools/probe_x32_r10.py
Writes tools/probe_ratios_r10_x32.json (same shape the judge reads).
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
N = 32

STANDARD_KEYS = [
    # graph / pair-generating family
    "graph_triangle_count",
    "graph_adamic_adar",
    "dedup_cluster_cc",
    # dedup pipelines & indexes
    "dedup_bloom_screen",
    "dedup_minhash_incremental",
    "dedup_pipeline_e2e",
    "dedup_lsh_scurve",
    # behavioral / sequence keys
    "events_attribution",
    "events_path_ngrams",
    "events_cohort_retention_matrix",
    # ranking eval (ordered-scan shapes)
    "ml_eval_average_precision",
    "ml_eval_ndcg",
    # text corpus keys
    "text_pmi_collocations",
    "text_novelty_curve",
    "text_lm_perplexity_filter",
    # embedding / ANN diagnostics
    "emb_cluster_silhouette",
    "emb_distance_histogram",
    "ann_lsh_cosine",
    "sample_kcenter_coreset",
    # windowed percentile / robust ts
    "win_rolling_median",
    "ts_hampel_outliers",
    # iterative tokenizer training
    "tokenizer_bpe_merges",
    # the r10 growth key (one-scan conditional aggregate)
    "filter_nfdump_extended",
]


def main() -> None:
    std = f"/tmp/sf_scale_probe_x{N}"
    spark = get_spark("probe-x32-r10")
    if not os.path.exists(f"{std}/embeddings.parquet"):
        t0 = time.perf_counter()
        build(spark, BASE, std, N)
        print(f"built {std} in {time.perf_counter() - t0:.1f}s", flush=True)

    specs = registry.all_specs()

    def run(key: str, sf: str) -> float:
        t0 = time.perf_counter()
        specs[key].fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {}
    for key in STANDARD_KEYS:
        run(key, BASE)  # warm
        tb = min(run(key, BASE), run(key, BASE))
        ts = min(run(key, std), run(key, std))
        results[f"{key}@std"] = {
            "base": round(tb, 2),
            "x32": round(ts, 2),
            "ratio": round(ts / tb, 1),
        }
        print(
            f"{key}@std: base {tb:.2f}s x32 {ts:.2f}s ratio {ts / tb:.1f}",
            flush=True,
        )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_ratios_r10_x32.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
