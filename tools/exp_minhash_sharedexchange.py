"""Round-12 experiment: dedup_minhash_pure — replace the corpus-sized
``localCheckpoint`` with a shared doc_id-keyed exchange (VERDICT r11
next-#7).

Current shape: ``sets`` (tokenized shingle arrays) is localCheckpointed
so the signature arm and both verify arms consume one materialization —
an executor-STORAGE copy of a corpus-sized intermediate (guide §5
liability at 100 TB; its eviction under memory pressure silently
recomputes the lineage).

Candidate shape: ``sets.repartition("doc_id")`` — all three arms sit on
byte-identical exchange subtrees with identical column demand
(doc_id, shs), so AQE materializes ONE shuffle (ReusedExchange) into
spill-safe shuffle files instead of the storage pool. Bonus: the verify
joins are keyed on doc_id, the exchange's own key, so the sets side of
each verify join needs no further shuffle.

Interleaved A/B best-of-N + result equality + executed-stage counts.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/exp_minhash_sharedexchange.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nfdump2clickhouse_spark.catalog import table  # noqa: E402
from nfdump2clickhouse_spark.functions.text import shingles, words  # noqa: E402
from nfdump2clickhouse_spark.operators.wave5 import (  # noqa: E402
    _MH_BANDS,
    _MH_HASHES,
    dedup_minhash_pure,
)
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "6"))


def minhash_shared_exchange(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    sets = d.select(
        "doc_id", F.array_distinct(shingles(words(F.col("text")))).alias("shs")
    ).filter(F.size("shs") > 0)
    # shared exchange instead of localCheckpoint: one doc_id-keyed shuffle
    # all three arms (signatures + both verify sides) consume via AQE
    # ReusedExchange
    sets = sets.repartition("doc_id")
    sig = sets.select(
        "doc_id",
        "shs",
        F.transform(
            F.sequence(F.lit(0), F.lit(_MH_HASHES - 1)),
            lambda j: F.array_min(
                F.transform(
                    F.col("shs"),
                    lambda s: F.xxhash64(F.concat(j.cast("string"), F.lit("|"), s)),
                )
            ),
        ).alias("sig"),
    )
    r = _MH_HASHES // _MH_BANDS
    band_cols = [
        F.xxhash64(
            F.concat_ws(
                ",",
                F.lit(str(b)),
                *[
                    F.element_at("sig", b * r + i + 1).cast("string")
                    for i in range(r)
                ],
            )
        ).alias(f"bk{b}")
        for b in range(_MH_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.size("shs").alias("n"), F.array(*band_cols).alias("bks")
    ).select("doc_id", "n", F.explode("bks").alias("bk"))
    buckets = bands.groupBy("bk").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
    )
    buckets = buckets.filter((F.size("ds") >= 2) & (F.size("ds") <= 10_000))
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ds"),
                                i + 2,
                                F.greatest(F.size("ds") - i - 1, F.lit(0)),
                            ),
                            lambda y: F.struct(
                                x["doc_id"].alias("id1"),
                                y["doc_id"].alias("id2"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
    )
    lhs = sets.select(F.col("doc_id").alias("id1"), F.col("shs").alias("shs1"))
    rhs = sets.select(F.col("doc_id").alias("id2"), F.col("shs").alias("shs2"))
    verified = (
        pairs.join(lhs, "id1")
        .join(rhs, "id2")
        .select(
            "id1",
            "id2",
            (
                F.size(F.array_intersect("shs1", "shs2"))
                / (
                    F.size("shs1")
                    + F.size("shs2")
                    - F.size(F.array_intersect("shs1", "shs2"))
                )
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
    )
    return verified.select("id1", "id2", F.round("j", 4).alias("jaccard"))


def main():
    spark = get_spark("exp-minhash-sharedx")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    old = lambda: dedup_minhash_pure(spark, SF_DIR)  # noqa: E731
    new = lambda: minhash_shared_exchange(spark, SF_DIR)  # noqa: E731

    a = sorted(map(tuple, old().collect()))
    b = sorted(map(tuple, new().collect()))
    print(f"rows old={len(a)} new={len(b)} equal={a == b}", flush=True)
    if a != b:
        print("only-old:", list(set(a) - set(b))[:5])
        print("only-new:", list(set(b) - set(a))[:5])
        spark.stop()
        return

    # executed-stage / job evidence for the new shape
    tracker = sc.statusTracker()
    before_jobs = len(tracker.getJobIdsForGroup() or [])
    noop(old())
    noop(new())
    t_old, t_new = [], []
    for i in range(REPS):
        order = (
            [("old", old, t_old), ("new", new, t_new)]
            if i % 2 == 0
            else [("new", new, t_new), ("old", old, t_old)]
        )
        for tag, fn, acc in order:
            sc.setJobDescription(f"minhash:{tag}:{i}")
            t0 = time.perf_counter()
            noop(fn())
            acc.append(time.perf_counter() - t0)
    print("old:", [round(x, 3) for x in t_old], "best", round(min(t_old), 3))
    print("new:", [round(x, 3) for x in t_new], "best", round(min(t_new), 3))
    spark.stop()


if __name__ == "__main__":
    main()
