"""A/B: dedup_ngram_jaccard posting payload packed into one int64.

Hypothesis (r12 ledger "Not yet optimized" #1): the dominant cost is the
groupBy(shingle).collect_list posting build; collecting ONE primitive
long per posting (doc_id<<32 | n) instead of a struct(doc_id BIGINT,
n INT) should shrink the shuffle payload and make both the
ObjectHashAggregate buffers and the per-bucket array_sort primitive.
Safety: lossless iff 0 <= doc_id < 2^31 and n < 2^32; n = F.size() is
int32 by construction, doc_id bounds come from exact INT64 parquet
footer stats (parquet_column_stats) — the production change would gate
on that and fall back to the struct path.

Methodology: equality check first (sorted collect), then interleaved
best-of-8 in one session (the only estimator that survives this box's
steal bursts).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F

from nfdump2clickhouse_spark.catalog import table
from nfdump2clickhouse_spark.functions.text import shingles, words
from nfdump2clickhouse_spark.operators.dedup_extra import _ngram_jaccard_pairs
from nfdump2clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MAX_DF = 10_000
spark = get_spark("exp-ngram-packed")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def packed():
    d = table(spark, SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    sets = d.select(
        "doc_id", F.array_distinct(shingles(words(F.col("text")))).alias("shs")
    )
    # pack (doc_id, n) into one non-negative int64: doc_id in the high 32
    # bits, n in the low 32. array_sort on the packed longs == the struct
    # sort (doc_id unique per bucket, all values non-negative).
    sh = sets.select(
        (F.col("doc_id") * F.lit(4294967296) + F.size("shs")).alias("pk"),
        F.explode("shs").alias("shingle"),
    )
    buckets = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("pk")).alias("ds")
    )
    buckets = buckets.filter(F.size("ds") <= MAX_DF)
    pairs = buckets.select(
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
                        lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    n1 = F.col("p1").bitwiseAND(F.lit(4294967295))
    n2 = F.col("p2").bitwiseAND(F.lit(4294967295))
    pairs = pairs.filter(F.least(n1, n2) >= 0.3 * F.greatest(n1, n2))
    inter = pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("c"))
    n1 = F.col("p1").bitwiseAND(F.lit(4294967295))
    n2 = F.col("p2").bitwiseAND(F.lit(4294967295))
    jac = F.col("c") / (n1 + n2 - F.col("c"))
    return inter.filter(jac >= 0.3).select(
        F.shiftright("p1", 32).alias("id1"),
        F.shiftright("p2", 32).alias("id2"),
        F.round(jac, 4).alias("jaccard"),
    )


old = lambda: _ngram_jaccard_pairs(spark, SF_DIR)
new = packed

a = sorted(map(tuple, old().collect()))
b = sorted(map(tuple, new().collect()))
print(f"equal={a == b} rows old={len(a)} new={len(b)}", flush=True)
if a != b:
    for x, y in list(zip(a, b))[:5]:
        print("  old", x, "new", y)
    spark.stop()
    sys.exit(1)

noop(old())
noop(new())
t_old, t_new = [], []
for i in range(8):
    order = (
        [("old", old, t_old), ("new", new, t_new)]
        if i % 2 == 0
        else [("new", new, t_new), ("old", old, t_old)]
    )
    for tag, fn, acc in order:
        spark.sparkContext.setJobDescription(f"ngram-{tag}-rep{i}")
        t0 = time.perf_counter()
        noop(fn())
        acc.append(time.perf_counter() - t0)
    print(
        f"rep {i}: load={os.getloadavg()[0]:.1f} "
        f"old best={min(t_old):.3f} new best={min(t_new):.3f}",
        flush=True,
    )
print("old(struct):", [round(x, 3) for x in t_old], "best", round(min(t_old), 3))
print("new(packed):", [round(x, 3) for x in t_new], "best", round(min(t_new), 3))
spark.stop()
