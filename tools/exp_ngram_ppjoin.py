"""Round-12 experiment: PPJoin-style prefix+positional+length candidate
algebra for dedup_ngram_jaccard (VERDICT r11 next-#3).

Current algebra: full inverted shingle index emits one pair-event per
shared shingle (1.27M events at sf0.1), counts them (1.13M groups),
filters J >= 0.3 (256 survivors).

Candidate algebra here: each doc's shingle set is sorted (plain string
order = the global total order); pair events are generated only from
PREFIX positions (p <= n - ceil(0.3*n) + 1 — every qualifying pair's
FIRST shared shingle lands in both prefixes, because the length filter
gives c >= ceil(0.3*max(n1,n2))), pruned by the positional upper bound
1 + min(n1-p1, n2-p2) >= alpha(n1,n2) = ceil(0.3/1.3*(n1+n2)) and the
length ratio; surviving DISTINCT candidates are verified exactly with
array_intersect against the carried shingle sets.

Interleaved A/B: alternating best-of-N noop-sink reps in one session,
plus a result-equality check (sorted rows old vs new).

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/exp_ngram_ppjoin.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nfdump2clickhouse_spark.catalog import table  # noqa: E402
from nfdump2clickhouse_spark.functions.text import shingles, words  # noqa: E402
from nfdump2clickhouse_spark.operators.dedup_extra import (  # noqa: E402
    _ngram_jaccard_pairs,
)
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "6"))


def ppjoin_pairs(spark, sf_dir, max_df=10_000, threshold=0.3):
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    # sorted shingle set: array position IS the prefix position (plain
    # string sort = the fixed global order; no df pass needed)
    sets = d.select(
        "doc_id",
        F.array_sort(F.array_distinct(shingles(words(F.col("text"))))).alias(
            "shs"
        ),
    ).withColumn("n", F.size("shs"))
    # share the tokenize across the posting arm and both verify arms:
    # one doc_id-keyed exchange all three consume (ReusedExchange)
    sets = sets.repartition("doc_id")
    # prefix postings: p <= n - ceil(t*n) + 1
    preflen = (F.col("n") - F.expr(f"CAST(CEIL({threshold} * n) AS INT)") + 1)
    post = sets.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("shs", 1, F.greatest(preflen, F.lit(0)))).alias(
            "p0", "shingle"
        ),
    ).withColumn("p", F.col("p0") + 1)
    buckets = post.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "n", "p"))).alias("ds")
    )
    buckets = buckets.filter(F.size("ds") <= max_df)
    ev = buckets.select(
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
                            x["n"].alias("n1"),
                            x["p"].alias("p1"),
                            y["doc_id"].alias("id2"),
                            y["n"].alias("n2"),
                            y["p"].alias("p2"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.*")
    # length filter + positional filter (alpha = ceil(t/(1+t)*(n1+n2)))
    ev = ev.filter(
        (F.least("n1", "n2") >= threshold * F.greatest("n1", "n2"))
        & (
            1 + F.least(F.col("n1") - F.col("p1"), F.col("n2") - F.col("p2"))
            >= F.expr("CAST(CEIL(0.3 / 1.3 * (n1 + n2)) AS INT)")
        )
    )
    cand = ev.select("id1", "id2").distinct()
    lhs = sets.select(F.col("doc_id").alias("id1"), F.col("shs").alias("shs1"))
    rhs = sets.select(
        F.col("doc_id").alias("id2"),
        F.col("shs").alias("shs2"),
    )
    v = (
        cand.join(lhs, "id1")
        .join(rhs, "id2")
        .withColumn("c", F.size(F.array_intersect("shs1", "shs2")))
        .withColumn("n1", F.size("shs1"))
        .withColumn("n2", F.size("shs2"))
    )
    jac = F.col("c") / (F.col("n1") + F.col("n2") - F.col("c"))
    return v.filter(jac >= threshold).select(
        "id1", "id2", F.round(jac, 4).alias("jaccard")
    )


def main():
    spark = get_spark("exp-ngram-ppjoin")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    old = lambda: _ngram_jaccard_pairs(spark, SF_DIR)  # noqa: E731
    new = lambda: ppjoin_pairs(spark, SF_DIR)  # noqa: E731

    # equality first
    a = sorted(map(tuple, old().collect()))
    b = sorted(map(tuple, new().collect()))
    print(f"rows old={len(a)} new={len(b)} equal={a == b}", flush=True)
    if a != b:
        onlya = set(a) - set(b)
        onlyb = set(b) - set(a)
        print("only-old:", list(onlya)[:5])
        print("only-new:", list(onlyb)[:5])

    # candidate volume evidence
    from nfdump2clickhouse_spark.operators.dedup_extra import (
        shingle_pair_counts,
    )

    old_counts = shingle_pair_counts(spark, SF_DIR, min_len_ratio=0.3)
    print(
        "old: pair-events into count agg =",
        old_counts.agg(F.sum("c")).collect()[0][0],
        " groups =",
        old_counts.count(),
        flush=True,
    )

    # interleaved timing
    noop(old())
    noop(new())
    t_old, t_new = [], []
    for i in range(REPS):
        for tag, fn, acc in (
            [("old", old, t_old), ("new", new, t_new)]
            if i % 2 == 0
            else [("new", new, t_new), ("old", old, t_old)]
        ):
            spark.sparkContext.setJobDescription(f"ngram:{tag}:{i}")
            t0 = time.perf_counter()
            noop(fn())
            acc.append(time.perf_counter() - t0)
    print("old:", [round(x, 3) for x in t_old], "best", round(min(t_old), 3))
    print("new:", [round(x, 3) for x in t_new], "best", round(min(t_new), 3))
    spark.stop()


if __name__ == "__main__":
    main()
