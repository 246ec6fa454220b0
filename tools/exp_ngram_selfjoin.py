import os, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from nfdump2clickhouse_spark.catalog import table
from nfdump2clickhouse_spark.functions.text import shingles, words
from nfdump2clickhouse_spark.session import get_spark
from nfdump2clickhouse_spark.operators.dedup_extra import _ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark("exp-ngram-v3")
def noop(df): df.write.format("noop").mode("overwrite").save()

def postings():
    d = table(spark, SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    sets = d.select("doc_id", F.array_distinct(shingles(words(F.col("text")))).alias("shs"))
    return sets.select("doc_id", F.size("shs").alias("n"), F.explode("shs").alias("shingle"))

def selfjoin():
    sh = postings()
    a = sh.select(F.col("doc_id").alias("id1"), F.col("n").alias("n1"), "shingle")
    b = sh.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2"), "shingle")
    pairs = a.join(b, "shingle").filter(
        (F.col("id1") < F.col("id2"))
        & (F.least("n1","n2") >= 0.3*F.greatest("n1","n2")))
    inter = pairs.groupBy("id1","id2","n1","n2").agg(F.count(F.lit(1)).alias("c"))
    jac = F.col("c")/(F.col("n1")+F.col("n2")-F.col("c"))
    return inter.filter(jac >= 0.3).select("id1","id2",F.round(jac,4).alias("jaccard"))

old = lambda: _ngram_jaccard_pairs(spark, SF_DIR)
new = selfjoin
noop(old()); noop(new())
t_old, t_new = [], []
for i in range(8):
    order = [("old",old,t_old),("new",new,t_new)] if i%2==0 else [("new",new,t_new),("old",old,t_old)]
    for tag,fn,acc in order:
        t0=time.perf_counter(); noop(fn()); dt=time.perf_counter()-t0; acc.append(dt)
    print(f"rep {i}: load={os.getloadavg()[0]:.1f} old so far best={min(t_old):.3f} new best={min(t_new):.3f}", flush=True)
print("old:", [round(x,3) for x in t_old], "best", round(min(t_old),3))
print("new(selfjoin):", [round(x,3) for x in t_new], "best", round(min(t_new),3))
spark.stop()
