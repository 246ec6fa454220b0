"""Training-data dedup family beyond MinHashLSH: exact-SQL n-gram Jaccard,
SimHash, and embedding-cosine near-dup (driver-mandated extensions).

Scale shape: all three avoid the all-pairs product — Jaccard pairs come
from an inverted shingle index join; SimHash candidates from equal band
keys; cosine near-dup reuses the same bounded pair space as sim_topk_pairs
(swap in LSH/IVF candidates beyond fixture scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions.similarity import as_double, cosine
from ..functions.text import shingles, words
from ..registry import register


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2, ROUND(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
    FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
    WHERE c * 1.0 / (x.n + y.n - c) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup docs by exact word-3-gram Jaccard ≥ 0.3 via an inverted
    shingle index: pair rows are generated only for docs sharing a
    shingle (|shingle| buckets, never |docs|²).

    Two bounded shuffles, no broadcast, no self-join — the shape that
    survives 100 TB (a broadcast of the shingle index would be
    corpus-sized): per-doc shingle sets are dedup'd row-locally with
    `array_distinct` (no global distinct shuffle) and each set's size
    rides along through the explode (no groupBy-count shuffle, no
    size-lookup joins later); shuffle 1 groups postings by shingle;
    candidate pairs are then generated *inside* each bucket with pure
    array ops (sorted bucket × upper-triangle slice); shuffle 2
    partial-aggregates the per-pair intersection counts map-side.

    Scale notes: (a) on Zipfian real-text corpora a stop-shingle with
    df=10⁶ would emit ~5·10¹¹ pairs from one task, so posting lists
    longer than `max_df` are dropped before pair generation (df that
    high adds candidates but near-zero Jaccard mass; PPJoin prefix
    filtering is the lossless alternative — on this fixture's uniform
    31-word vocab a prefix prunes nothing, measured 5× slower, so the
    capped inverted index is the right plan). The default cap is far
    above any fixture df, leaving fixture output byte-identical;
    (b) `collect_list` per shingle bucket is bounded by `max_df`,
    not corpus size."""
    return _ngram_jaccard_pairs(spark, sf_dir)


def _ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, max_df: int = 10_000
) -> DataFrame:
    # PPJoin length filter: J = c/(n1+n2-c) ≤ min(n1,n2)/max(n1,n2), so a
    # pair whose set sizes differ by more than the threshold ratio can
    # never reach J ≥ 0.3 — lossless prune of the pair shuffle
    inter = shingle_pair_counts(spark, sf_dir, max_df, min_len_ratio=0.3)
    jac = F.col("c") / (F.col("n1") + F.col("n2") - F.col("c"))
    return inter.filter(jac >= 0.3).select(
        "id1", "id2", F.round(jac, 4).alias("jaccard")
    )


def shingle_pair_counts(
    spark: SparkSession,
    sf_dir: str,
    max_df: int = 10_000,
    min_len_ratio: float | None = None,
) -> DataFrame:
    """Candidate doc pairs sharing ≥1 word-3-gram with intersection count:
    (id1, id2, n1, n2, c) — the shared core of dedup_ngram_jaccard and
    text_containment (wave4). `min_len_ratio` applies the PPJoin length
    filter map-side (valid for resemblance thresholds, NOT for
    containment — a contained doc is legitimately much smaller)."""
    d = table(spark, sf_dir, "documents")
    # Parallelism gate: parquet scans split on maxPartitionBytes, but a
    # single row group cannot be split, so a small corpus lands in ONE
    # task and the CPU-heavy shingle HOFs serialize (measured 2.16 s at
    # sf0.1). Repartition the RAW doc rows (not the exploded postings —
    # shuffling computed shingle arrays measured 2× slower) only when the
    # scan is narrower than the cluster: at 100 TB the scan is thousands
    # of splits and this is a no-op, costing zero shuffles.
    # inputFiles() is a metadata lookup; df.rdd.getNumPartitions() would
    # trigger a plan-conversion job per call (measured +0.5 s)
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:
        d = d.repartition(par)
    sets = d.select(
        "doc_id", F.array_distinct(shingles(words(F.col("text")))).alias("shs")
    )
    sh = sets.select(
        "doc_id", F.size("shs").alias("n"), F.explode("shs").alias("shingle")
    )
    buckets = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
    )
    # hot-shingle cap: a posting list longer than max_df is a stop-shingle
    # (quadratic pair blowup, near-zero Jaccard mass) — drop it before the
    # upper-triangle expansion (VERDICT r1 wrong-#3)
    buckets = buckets.filter(F.size("ds") <= max_df)
    # upper-triangle pair generation inside each posting list: doc_ids are
    # unique per bucket (array_distinct above) and sorted, so i<j ⇒ id1<id2
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
                        lambda y: F.struct(
                            x["doc_id"].alias("id1"),
                            x["n"].alias("n1"),
                            y["doc_id"].alias("id2"),
                            y["n"].alias("n2"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    if min_len_ratio is not None:
        # same stage as the explode → pruned pairs never enter the shuffle
        pairs = pairs.filter(
            F.least("n1", "n2") >= min_len_ratio * F.greatest("n1", "n2")
        )
    return pairs.groupBy("id1", "id2", "n1", "n2").agg(
        F.count(F.lit(1)).alias("c")
    )


@register(
    "dedup_cluster_cc",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id1, id2
      FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE c * 1.0 / (x.n + y.n - c) >= 0.3
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs
    ),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    near-dup pair graph (each doc labeled with the min doc_id reachable
    from it) — the step every real dedup pipeline runs after pair
    generation, so 'A≈B, B≈C' keeps one representative of {A,B,C}, not
    two.

    Iterative min-label propagation as a driver loop over DataFrames:
    each round joins labels to edges, takes the per-node min, and
    `localCheckpoint` truncates the growing lineage; rounds ≤ graph
    diameter (near-dup clusters are shallow — a handful here). Labels
    only ever decrease under min-propagation, so convergence is
    `sum(label)` reaching a fixpoint — one O(1)-result aggregate per
    round on the already-checkpointed frame, no join against the
    previous round's labels (which doubled per-round work). At massive
    scale swap the propagation step for the two-phase large-star/
    small-star contraction, which bounds rounds by O(log n) independent
    of diameter; the oracle (DuckDB recursive CTE transitive closure)
    is identical either way."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    edges = pairs.union(
        pairs.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
    ).toDF("src", "dst").localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(20):  # diameter guard; converges in ~3 rounds here
        msgs = labels.join(edges, labels.node == edges.src).select(
            F.col("dst").alias("node"), "label"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH b AS (
      SELECT doc_id, text,
             array_to_string(string_split(text, ' ')[1:3], ' ') AS blk,
             length(text) AS len
      FROM documents
    )
    SELECT a.doc_id AS id1, b2.doc_id AS id2,
           levenshtein(a.text, b2.text) AS lev
    FROM b a JOIN b b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
    WHERE levenshtein(a.text, b2.text) <= 0.3 * greatest(a.len, b2.len)
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup: pairs within 30% relative Levenshtein,
    candidates blocked on the first 3 words (a cheap canopy — O(n²)
    string comparison only happens inside a block, and the block join is
    an ordinary shuffled equi-join, no broadcast, no all-pairs). The
    distance itself is `F.levenshtein` — JVM-side, identical semantics
    to the oracle's. At 100 TB, widen recall with multiple block keys
    (prefix, suffix, length bucket) unioned before the distinct.

    Scale path (r6 probe-caught: 70× wall on the 8× dup-mass fixture —
    every verbatim copy pair ran the full O(len²) DP, serialized on the
    scan's few splits). Three semantic no-ops fix it, so the oracle is
    byte-identical: (1) equality fast path — lev(t,t)=0 without DP,
    which is exactly the dup-mass case a dedup operator exists for;
    (2) length-band prefilter — lev ≥ |len1−len2|, so a pair outside
    the 30% length band can never pass the threshold and skips DP;
    (3) the parallelism gate (same rationale as `dedup_ngram_jaccard`
    above) so the CPU-heavy DP stage runs cluster-wide, not on the
    fixture's row-group count. Post-fix probe: 8× wall 77.4 s → 3.6 s,
    ratio 5.5 (was 70.3) — inside the dedup family band."""
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if len(d.inputFiles()) < par:  # metadata-only gate; no-op at scale
        d = d.repartition(par)
    b = d.select(
        "doc_id",
        "text",
        F.concat_ws(" ", F.slice(words(F.col("text")), 1, 3)).alias("blk"),
        F.length("text").alias("len"),
    )
    a = b.select(
        F.col("doc_id").alias("id1"),
        F.col("text").alias("t1"),
        "blk",
        F.col("len").alias("len1"),
    )
    c = b.select(
        F.col("doc_id").alias("id2"),
        F.col("text").alias("t2"),
        "blk",
        F.col("len").alias("len2"),
    )
    # equality fast path: lev(t,t) = 0 — verbatim duplicates (the bulk
    # of any real dup mass) never run the DP
    lev = F.when(F.col("t1") == F.col("t2"), F.lit(0)).otherwise(
        F.levenshtein("t1", "t2")
    )
    return (
        a.join(c, "blk")
        .filter(F.col("id1") < F.col("id2"))
        # band prefilter: lev >= |len1-len2|, so any pair outside the
        # 30% length band fails the threshold without running the DP
        .filter(
            F.abs(F.col("len1") - F.col("len2"))
            <= 0.3 * F.greatest("len1", "len2")
        )
        .withColumn("lev", lev)
        .filter(F.col("lev") <= 0.3 * F.greatest("len1", "len2"))
        .select("id1", "id2", "lev")
    )


@register("dedup_simhash")  # rows-only: xxhash64 family is Spark-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature = sign-aggregated bit votes of
    per-word xxhash64; candidates = equal 16-bit bands (4 bands → Hamming
    ≤ 3 guaranteed recall is probabilistic); the band join is the scale
    path (no all-pairs).

    The word hashes stay JVM-side (`xxhash64`), but the 64 bit votes per
    hash are a vectorized Arrow-batch pandas UDF: the pure-Column
    formulation needs either 64 `aggregate` traversals of the hash array
    or per-word 64-element array allocations, both measured 3–5× slower
    at sf0.1 (3.0 s vs 0.6 s warm) — exactly the 'builtin ops genuinely
    can't express it efficiently' case for a pandas UDF.

    A NULL document has no signature — gated before the UDF (None cells
    crash the numpy bit-vote stack; EDGE_SWEEP_r10 class A)."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .withColumn("ws", words(F.col("text")))
    )
    # one xxhash64 per word, reused by all 64 bit votes
    d = d.withColumn("hs", F.transform("ws", lambda w: F.xxhash64(w)))

    @F.pandas_udf("bigint")
    def simhash64(hs: pd.Series) -> pd.Series:
        bits = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            # votes[b] = #words with bit b set minus #words without it
            votes = (((h[:, None] >> bits) & one).astype(np.int32) * 2 - 1).sum(
                axis=0
            )
            out[i] = np.bitwise_or.reduce(
                np.where(votes > 0, one << bits, np.uint64(0))
            ).astype(np.int64)
        return pd.Series(out)

    sigs = d.select("doc_id", simhash64("hs").alias("simhash"))
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    )
    a = bands.select(F.col("doc_id").alias("id1"), F.col("simhash").alias("s1"), "bk")
    b = bands.select(F.col("doc_id").alias("id2"), F.col("simhash").alias("s2"), "bk")
    cand = (
        a.join(b, ["bk"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .distinct()
    )
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 12)
        .select("id1", "id2", "hamming")
        .orderBy("hamming", "id1", "id2")
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ 0.45 (fixture max is
    ~0.51; real corpora use ~0.95), via the same blocked GEMM as
    sim_topk_pairs with a threshold instead of top-k. NULL embeddings
    are not vectors — gated before the GEMM (mirrored IS NOT NULL in
    the oracle; EDGE_SWEEP_r10 class A)."""
    from ..functions.similarity import blocked_pair_topk

    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", as_double("embedding").alias("emb"))
    )
    return blocked_pair_topk(e, n_blocks=8, per_block_k=None, threshold=0.45).select(
        "id1", "id2", "cos_sim"
    )


@register(
    "dedup_pipeline_e2e",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id1, id2
      FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE c * 1.0 / (x.n + y.n - c) >= 0.3
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs
    ),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    labels AS (SELECT node, MIN(r) AS label FROM reach GROUP BY node),
    dropped AS (SELECT node FROM labels WHERE node <> label)
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
    FROM documents WHERE doc_id NOT IN (SELECT node FROM dropped)
    """,
)
def dedup_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup pipeline a training-data curation run executes:
    shingle → inverted-index Jaccard pairs → connected components →
    keep ONE representative per duplicate cluster (the min doc_id label)
    → surviving-corpus stats. Composes dedup_ngram_jaccard and
    dedup_cluster_cc; the drop step is a broadcast-able anti-join of the
    (small) dropped-id set against the corpus — at 100 TB the drop list
    is duplicates-only, orders of magnitude smaller than the corpus."""
    labels = dedup_cluster_cc(spark, sf_dir)
    dropped = labels.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    d = table(spark, sf_dir, "documents")
    survivors = d.join(F.broadcast(dropped), "doc_id", "left_anti")
    return survivors.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
    )
