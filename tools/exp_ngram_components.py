import os, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from nfdump2clickhouse_spark.catalog import table
from nfdump2clickhouse_spark.functions.text import shingles, words
from nfdump2clickhouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark("exp-ngram-comp")

def noop(df): df.write.format("noop").mode("overwrite").save()

def build(stage):
    d = table(spark, SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    sets = d.select("doc_id", F.array_distinct(shingles(words(F.col("text")))).alias("shs"))
    if stage == "sets": return sets
    sh = sets.select("doc_id", F.size("shs").alias("n"), F.explode("shs").alias("shingle"))
    if stage == "postings": return sh
    buckets = sh.groupBy("shingle").agg(F.array_sort(F.collect_list(F.struct("doc_id","n"))).alias("ds"))
    buckets = buckets.filter(F.size("ds") <= 10000)
    if stage == "buckets": return buckets
    pairs = buckets.select(F.explode(F.flatten(F.transform("ds", lambda x,i: F.transform(
        F.slice(F.col("ds"), i+2, F.greatest(F.size("ds")-i-1, F.lit(0))),
        lambda y: F.struct(x["doc_id"].alias("id1"), x["n"].alias("n1"), y["doc_id"].alias("id2"), y["n"].alias("n2")))))).alias("p")).select("p.*")
    pairs = pairs.filter(F.least("n1","n2") >= 0.3*F.greatest("n1","n2"))
    if stage == "pairs": return pairs
    inter = pairs.groupBy("id1","id2","n1","n2").agg(F.count(F.lit(1)).alias("c"))
    if stage == "counts": return inter
    jac = F.col("c")/(F.col("n1")+F.col("n2")-F.col("c"))
    return inter.filter(jac >= 0.3).select("id1","id2",F.round(jac,4).alias("jaccard"))

stages = ["sets","postings","buckets","pairs","counts","full"]
for s in stages: noop(build(s))  # warm
for s in stages:
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); noop(build(s)); best = min(best, time.perf_counter()-t0)
    print(f"{s}: {best:.3f}s", flush=True)
# stats
d = table(spark, SF_DIR, "documents")
print("docs:", d.count(), "  doc_id type:", dict(d.dtypes)["doc_id"])
sets = build("sets")
print("shingle set sizes:", sets.agg(F.min(F.size("shs")), F.avg(F.size("shs")), F.max(F.size("shs"))).collect())
print("distinct shingles:", build("postings").select("shingle").distinct().count())
bk = build("buckets")
print("bucket size dist:", bk.agg(F.count(F.lit(1)), F.avg(F.size("ds")), F.max(F.size("ds")), F.expr("percentile(size(ds), 0.99)")).collect())
spark.stop()
