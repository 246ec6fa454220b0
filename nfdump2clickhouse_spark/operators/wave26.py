"""Wave-26 keys (round 5): filter funnel, skew diagnostics, incremental
near-dup screen, index quality report, cache reuse.

- ``curation_filter_funnel``: the operational attrition report of a
  sequential curation pipeline — how many docs survive each successive
  gate, per source [P — the filter-funnel tables in LLM data papers
  (Gopher, RefinedWeb) report exactly this].
- ``maint_skew_report``: join-key skew diagnostics — the "why is my
  shuffle slow" report that decides salting (`join_skew_salted`) and
  AQE skew-join thresholds before a 100 TB join is launched.
- ``dedup_minhash_incremental``: near-dup screen of a NEW batch against
  the HISTORICAL corpus via MinHash band buckets — the incremental form
  of `dedup_minhash_pure` (batch-global) and the sketch-cost analog of
  `dedup_bloom_screen` (exact n-grams).
- ``ann_recall_report``: recall@k of the IVF index against the
  brute-force baseline, per query — the index-quality report that
  decides nprobe/k' before an index serves traffic.
- ``maint_cache_inmemory``: explicit `.cache()` reuse — two aggregates
  over one cached projection plan a single scan + InMemoryTableScan
  (plan-pinned); the Spark-native materialization tier under
  `maint_compaction`'s on-disk one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# curation_filter_funnel
# ---------------------------------------------------------------------------


@register(
    "curation_filter_funnel",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, text, n_chars,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
             length(text) AS n_len
      FROM documents
    ),
    gates AS (
      SELECT doc_id, source,
             CASE WHEN n_chars BETWEEN 100 AND 10000 THEN 1 ELSE 0 END AS g1,
             CASE WHEN n_alpha * 100 >= n_len * 60 THEN 1 ELSE 0 END   AS g2,
             CASE WHEN text LIKE '% the %' OR text LIKE '% and %'
                    OR text LIKE '% of %' THEN 1 ELSE 0 END            AS g3,
             CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
                  THEN 1 ELSE 0 END                                    AS g4
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                      AS n_docs,
           CAST(SUM(g1) AS BIGINT)                       AS pass_len,
           CAST(SUM(g1 * g2) AS BIGINT)                  AS pass_alpha,
           CAST(SUM(g1 * g2 * g3) AS BIGINT)             AS pass_stopword,
           CAST(SUM(g1 * g2 * g3 * g4) AS BIGINT)        AS pass_dedup,
           CAST(SUM(g1 * g2 * g3 * g4) * 10000 // COUNT(*) AS BIGINT)
                                                          AS keep_bp
    FROM gates GROUP BY source
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential curation funnel per source: length gate -> alpha-ratio
    gate -> stopword-presence gate -> exact-dedup gate, with survivors
    counted at EVERY stage (the attrition table LLM data papers publish
    [P — Gopher/RefinedWeb]; `text_quality_filter_e2e` applies one
    composite gate — this reports where documents die, which is what a
    curation team actually tunes). Gate predicates are row-local
    integer/string arithmetic; the dedup gate is a keep-first over an
    md5 window (one content-key exchange); one bounded per-source
    rollup. Every count is an exact integer — the funnel is
    monotone non-increasing by construction."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("n_alpha"),
        F.length("text").alias("n_len"),
    )
    g4w = Window.partitionBy(F.md5("text"))
    gates = d.select(
        "source",
        F.when(F.col("n_chars").between(100, 10000), 1).otherwise(0).alias("g1"),
        F.when(F.col("n_alpha") * 100 >= F.col("n_len") * 60, 1)
        .otherwise(0)
        .alias("g2"),
        F.when(
            F.col("text").like("% the %")
            | F.col("text").like("% and %")
            | F.col("text").like("% of %"),
            1,
        )
        .otherwise(0)
        .alias("g3"),
        F.when(F.col("doc_id") == F.min("doc_id").over(g4w), 1)
        .otherwise(0)
        .alias("g4"),
    )
    return gates.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("g1").alias("pass_len"),
        F.sum(F.col("g1") * F.col("g2")).alias("pass_alpha"),
        F.sum(F.col("g1") * F.col("g2") * F.col("g3")).alias("pass_stopword"),
        F.sum(F.col("g1") * F.col("g2") * F.col("g3") * F.col("g4")).alias(
            "pass_dedup"
        ),
        F.expr(
            "CAST(SUM(g1 * g2 * g3 * g4) * 10000 DIV COUNT(*) AS BIGINT)"
        ).alias("keep_bp"),
    )


# ---------------------------------------------------------------------------
# maint_skew_report
# ---------------------------------------------------------------------------

_SKEW_BUCKETS = 32


@register(
    "maint_skew_report",
    oracle=f"""
    WITH freq AS (
      SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS f
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(f) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(f) AS BIGINT) AS max_f, CAST(MIN(f) AS BIGINT) AS min_f
      FROM freq
    ),
    topten AS (
      SELECT CAST(SUM(f) AS BIGINT) AS top10_f
      FROM (SELECT f FROM freq ORDER BY f DESC, k LIMIT 10)
    ),
    part AS (
      SELECT CAST(MAX(pf) AS BIGINT) AS max_part,
             CAST(MIN(pf) AS BIGINT) AS min_part
      FROM (SELECT k % {_SKEW_BUCKETS} AS p, SUM(f) AS pf
            FROM freq GROUP BY 1)
    )
    SELECT t.n_rows, t.n_keys, t.max_f, t.min_f,
           CAST(t.max_f * t.n_keys * 10000 // t.n_rows AS BIGINT)
             AS max_over_avg_e4,
           CAST(tt.top10_f * 1000000 // t.n_rows AS BIGINT)
             AS top10_share_e6,
           CAST(p.max_part * 10000 // greatest(p.min_part, 1) AS BIGINT)
             AS bucket_balance_e4
    FROM tot t, topten tt, part p
    """,
)
def maint_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for `lineitem.l_suppkey` — the report
    run BEFORE a 100 TB join to decide whether to salt
    (`join_skew_salted`), bump AQE skew thresholds, or bucket: key
    cardinality, max/avg frequency ratio, top-10 heavy-hitter share,
    and the max/min load ratio across {_SKEW_BUCKETS} modulo buckets (a
    deterministic stand-in for hash-partition balance — cross-engine,
    unlike engine hash functions). One key-frequency aggregation (the
    only data-sized shuffle); everything downstream is arithmetic on
    the key-frequency table; the top-10 is TakeOrderedAndProject; all
    ratios are exact integers."""
    li = table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).alias("f")
    ).localCheckpoint(eager=False)  # three bounded consumers below
    tot = freq.agg(
        F.sum("f").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("f").alias("max_f"),
        F.min("f").alias("min_f"),
    )
    topten = (
        freq.orderBy(F.desc("f"), "k")
        .limit(10)
        .agg(F.sum("f").alias("top10_f"))
    )
    part = (
        freq.groupBy((F.col("k") % _SKEW_BUCKETS).alias("p"))
        .agg(F.sum("f").alias("pf"))
        .agg(F.max("pf").alias("max_part"), F.min("pf").alias("min_part"))
    )
    return (
        tot.crossJoin(F.broadcast(topten))  # 1-row x 1-row
        .crossJoin(F.broadcast(part))
        .select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("max_f").cast("bigint").alias("max_f"),
            F.col("min_f").cast("bigint").alias("min_f"),
            F.expr("CAST(max_f * n_keys * 10000 DIV n_rows AS BIGINT)").alias(
                "max_over_avg_e4"
            ),
            F.expr("CAST(top10_f * 1000000 DIV n_rows AS BIGINT)").alias(
                "top10_share_e6"
            ),
            F.expr(
                "CAST(max_part * 10000 DIV greatest(min_part, 1L) AS BIGINT)"
            ).alias("bucket_balance_e4"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_minhash_incremental
# ---------------------------------------------------------------------------

_MHI_HASHES = 32
_MHI_BANDS = 8  # r = 4 rows/band, same operating point as dedup_minhash_pure


@register("dedup_minhash_incremental")  # rows-only: banding is
# probabilistic and signatures are xxhash64-engine-specific; the
# cross-split recall vs the batch-global key is pinned in tests
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screen: MinHash band buckets of the NEW doc
    batch (doc_id%10 >= 8) probed against the HISTORICAL corpus's band
    buckets (doc_id%10 < 8), candidates verified with EXACT Jaccard —
    `dedup_minhash_pure`'s machinery restricted to cross-split pairs
    (the ingest-time question "is this new doc a near-dup of anything
    we already have?"), and the sketch-cost sibling of
    `dedup_bloom_screen` (which screens exact n-gram containment). At
    100 TB the historical band buckets are a STORED index keyed by
    (band, bucket): each ingest batch computes its own signatures
    row-locally and equi-joins that index — the historical corpus is
    never re-scanned, and precision is 1.0 by construction because
    every candidate is verified on the carried shingle sets.

    One band-key equi-join (new side tiny, AQE broadcasts it;
    co-partitioned hash join at scale), one pair dedup, one verify
    join — all keyed, hot buckets capped like the batch key."""
    from ..functions.text import shingles, words

    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    sets = d.select(
        "doc_id",
        (F.col("doc_id") % 10 >= 8).alias("is_new"),
        F.array_distinct(shingles(words(F.col("text")))).alias("shs"),
    ).filter(F.size("shs") > 0)
    sets = sets.localCheckpoint()  # signatures + both verify arms
    sig = sets.select(
        "doc_id",
        "is_new",
        F.transform(
            F.sequence(F.lit(0), F.lit(_MHI_HASHES - 1)),
            lambda j: F.array_min(
                F.transform(
                    F.col("shs"),
                    lambda s: F.xxhash64(F.concat(j.cast("string"), F.lit("|"), s)),
                )
            ),
        ).alias("sig"),
    )
    r = _MHI_HASHES // _MHI_BANDS
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
        for b in range(_MHI_BANDS)
    ]
    bands = sig.select(
        "doc_id", "is_new", F.array(*band_cols).alias("bks")
    ).select("doc_id", "is_new", F.explode("bks").alias("bk"))
    hist_b = bands.filter(~F.col("is_new")).select(
        F.col("bk"), F.col("doc_id").alias("hist_id")
    )
    new_b = bands.filter("is_new").select(
        F.col("bk"), F.col("doc_id").alias("new_id")
    )
    # cap pathological buckets (boilerplate bands), same guard family
    # as the batch key: a bucket with >10k historical members adds no
    # dedup information and only quadratic join mass
    hist_sizes = hist_b.groupBy("bk").agg(F.count(F.lit(1)).alias("nb"))
    hist_b = hist_b.join(
        hist_sizes.filter(F.col("nb") <= 10_000).select("bk"), "bk"
    )
    cand = (
        new_b.join(hist_b, "bk")
        .select("new_id", "hist_id")
        .distinct()
    )
    lhs = sets.select(F.col("doc_id").alias("new_id"), F.col("shs").alias("shs1"))
    rhs = sets.select(F.col("doc_id").alias("hist_id"), F.col("shs").alias("shs2"))
    inter = F.size(F.array_intersect("shs1", "shs2"))
    verified = (
        cand.join(lhs, "new_id")
        .join(rhs, "hist_id")
        .select(
            "new_id",
            "hist_id",
            (
                inter / (F.size("shs1") + F.size("shs2") - inter)
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
    )
    return verified.select(
        "new_id", "hist_id", F.round("j", 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# ann_recall_report
# ---------------------------------------------------------------------------

_RECALL_K = 5


@register("ann_recall_report")  # rows-only: recall of a probabilistic
# index; the >=0.6-average-recall + exact-overlap-arithmetic contracts
# are pinned in tests
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality report: recall@5 of the IVF index (nprobe=2)
    against the exact brute-force neighbors, per query — the
    measurement that decides nprobe/codebook size BEFORE an index
    serves traffic (`ann_ivf_probe` returns the index's answers; this
    key grades them). Both runs share one decoded embedding frame; the
    overlap is one equi-join on (query, neighbor) of two 50-row
    top-k tables; recall arithmetic is exact integers over k."""
    from .ann import ann_cosine_topk, ann_ivf_probe

    brute = ann_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_brute")
    )
    ivf = ann_ivf_probe(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_ivf")
    )
    hits = brute.join(ivf, ["query_id", "neighbor_id"], "inner")
    per_q = (
        brute.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .fillna(0, ["n_hit"])
        .select(
            "query_id",
            "k",
            "n_hit",
            F.expr("CAST(n_hit * 10000 DIV k AS BIGINT)").alias("recall_bp"),
        )
    )
    return per_q.orderBy("query_id")


# ---------------------------------------------------------------------------
# maint_cache_inmemory
# ---------------------------------------------------------------------------


@register(
    "maint_cache_inmemory",
    oracle="""
    WITH hot AS (
      SELECT o_custkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderstatus <> 'F'
    ),
    a AS (
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM hot GROUP BY 1
    ),
    b AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs FROM hot
    )
    SELECT a.o_orderstatus, a.n, a.revenue, b.n_custs FROM a, b
    """,
)
def maint_cache_inmemory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit `.cache()` reuse: a filtered projection consumed by TWO
    aggregates materializes ONCE in executor memory — both consumers
    plan `InMemoryTableScan` (plan-pinned), the parquet scan runs a
    single time, and the cached columnar batches serve both (Spark's
    in-memory materialization tier; `maint_compaction` is the on-disk
    one, `localCheckpoint` the lineage-cutting one — this key completes
    the triple). The cached blocks are MEMORY_AND_DISK and LRU-evicted
    by the block manager, so repeated runs do not accumulate state. At
    100 TB the same pattern holds per-stage: cache what fans out, size
    it by the PROJECTED columns only (the reason the projection
    precedes the cache)."""
    o = table(spark, sf_dir, "orders")
    hot = (
        o.filter(F.col("o_orderstatus") != "F")
        .select("o_custkey", "o_totalprice", "o_orderstatus")
        .cache()
    )
    a = hot.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    b = hot.agg(F.count_distinct("o_custkey").alias("n_custs"))
    return a.crossJoin(F.broadcast(b))  # bounded x 1-row
