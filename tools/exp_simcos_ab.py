"""Round-12 re-measurement: sim_cosine_centroid fold-vs-revert (VERDICT
r11 next-#5). The r11 change folded ‖centroid‖ into the 10-row broadcast
table; the driver then measured the key 25% SLOWER (0.340 → 0.452 s)
against a claimed noise-level local delta. Interleaved A/B on the final
tree: keep only with a confirming number, else revert.

A = current registered operator (cnorm folded into the broadcast table)
B = r10 formulation (l2_norm(centroid) recomputed per embedding row)

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/exp_simcos_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nfdump2clickhouse_spark.catalog import table  # noqa: E402
from nfdump2clickhouse_spark.functions.similarity import (  # noqa: E402
    as_double,
    dot,
    l2_norm,
)
from nfdump2clickhouse_spark.operators.llm_pipeline import (  # noqa: E402
    sim_cosine_centroid,
)
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "8"))


def r10_formulation(spark, sf_dir):
    """The pre-r11 shape: centroid norm re-aggregated per embedding row."""
    e = table(spark, sf_dir, "embeddings").withColumn("emb", as_double("embedding"))
    ex = e.select("vec_id", "label", F.posexplode("emb").alias("pos", "val"))
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s.cval,
            ).alias("centroid")
        )
    )
    return e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        (
            F.round(
                dot(F.col("emb"), F.col("centroid"))
                / (l2_norm(F.col("emb")) * l2_norm(F.col("centroid"))),
                4,
            )
            + 0
        ).alias("cos_sim"),
    )


def main():
    spark = get_spark("exp-simcos-ab")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cur = lambda: sim_cosine_centroid(spark, SF_DIR)  # noqa: E731
    old = lambda: r10_formulation(spark, SF_DIR)  # noqa: E731

    a = sorted(map(tuple, cur().collect()))
    b = sorted(map(tuple, old().collect()))
    print(f"rows cur={len(a)} r10={len(b)} equal={a == b}", flush=True)

    noop(cur())
    noop(old())
    t_cur, t_old = [], []
    for i in range(REPS):
        order = (
            [("cur", cur, t_cur), ("r10", old, t_old)]
            if i % 2 == 0
            else [("r10", old, t_old), ("cur", cur, t_cur)]
        )
        for tag, fn, acc in order:
            sc.setJobDescription(f"simcos:{tag}:{i}")
            t0 = time.perf_counter()
            noop(fn())
            acc.append(time.perf_counter() - t0)
    import statistics

    print("cur (fold):", [round(x, 3) for x in t_cur], "best", round(min(t_cur), 3), "median", round(statistics.median(t_cur), 3))
    print("r10 (no fold):", [round(x, 3) for x in t_old], "best", round(min(t_old), 3), "median", round(statistics.median(t_old), 3))
    spark.stop()


if __name__ == "__main__":
    main()
