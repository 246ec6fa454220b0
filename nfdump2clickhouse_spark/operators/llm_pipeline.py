"""LLM-data-pipeline extensions (SURVEY §2.11): embedding similarity,
near-dedup, TF-IDF, corpus stats.

Scale design: centroid similarity is a broadcast join of a 10×64 table
against the fact side; top-k pairs is brute-force at fixture scale with
the LSH/IVF scale paths in dedup_extra.py / ann.py; TF-IDF's shuffles
carry only (word, count) partials.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.similarity import as_double, cosine
from ..registry import register


@register(
    "sim_cosine_centroid",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ), cent AS (
      SELECT label, pos, AVG(val) AS cval FROM ex GROUP BY label, pos
    ), dots AS (
      SELECT ex.vec_id, ex.label,
             SUM(ex.val * cent.cval)  AS dp,
             SUM(ex.val * ex.val)     AS na,
             SUM(cent.cval * cent.cval) AS nb
      FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
      GROUP BY ex.vec_id, ex.label
    )
    SELECT vec_id, label, ROUND(dp / (sqrt(na) * sqrt(nb)), 4) + 0 AS cos_sim
    FROM dots
    """,
)
def sim_cosine_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each embedding to its label centroid. The centroid table
    (labels × dims) is tiny → broadcast; the embedding side is scanned
    once. All zip_with/aggregate HOFs — no Python.

    r11 (guide §1.2 per-task work): ‖centroid‖ is folded into the
    broadcast table (once per label) instead of re-aggregating the
    64-dim norm for every embedding row — same expression over the
    same values, so the double is bit-identical; only ‖emb‖ and the
    dot product remain per-row."""
    from ..functions.similarity import dot, l2_norm

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
        .withColumn("cnorm", l2_norm(F.col("centroid")))
    )
    return e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        # "+ 0": near-orthogonal cosines can round to -0.0 (SURVEY §8)
        (
            F.round(
                dot(F.col("emb"), F.col("centroid"))
                / (l2_norm(F.col("emb")) * F.col("cnorm")),
                4,
            )
            + 0
        ).alias("cos_sim"),
    )


@register(
    "sim_topk_pairs",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL
    ORDER BY cos_sim DESC, id1, id2
    LIMIT 20
    """,
)
def sim_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar pairs via distributed block matrix
    product (functions.similarity.blocked_pair_topk): each block pair is
    one numpy GEMM on an executor, per-block top-20s shuffle back (a
    global top-20 superset), Spark takes the final top-20. ~40× the naive
    per-pair fold. At 100 TB, block by LSH/IVF cell instead of id%%B.
    Ordering is on the ROUNDED similarity with id tiebreaks so the k-th
    boundary is stable across engines (SURVEY §5.3). NULL embeddings are
    not vectors — gated before the GEMM (mirrored IS NOT NULL in the
    oracle; EDGE_SWEEP_r10 class A)."""
    from ..functions.similarity import blocked_pair_topk

    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", as_double("embedding").alias("emb"))
    )
    return (
        blocked_pair_topk(e, n_blocks=8, per_block_k=20)
        .orderBy(F.col("cos_sim").desc(), "id1", "id2")
        .limit(20)
    )


@register("dedup_near_minhash")  # rows-only: hash family is engine-specific
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate documents via MinHashLSH (MLlib): shingle → binary
    HashingTF vector → banded min-hash → approxSimilarityJoin. The LSH
    band join is the 100 TB dedup path: candidate pairs come from equal
    band buckets, never from an all-pairs product.

    Reference parity: the reference has no dedup at all [P]; this is the
    driver-mandated extension (BASELINE.json:6)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from ..functions.text import shingles, words

    # NULL/short text → NULL/empty shingle array. A size(sh) > 0 filter
    # alone is NOT enough: InferFiltersFromConstraints adds
    # isnotnull(UDF(features)) for the LSH hash UDF and CombineFilters
    # can order that conjunct BEFORE the size gate, so MinHashLSHModel's
    # "at least 1 non zero entry" requirement fires on rows the gate
    # would have dropped (observed under the nullmix fixture). Make the
    # UDF input valid BY CONSTRUCTION instead: degenerate docs get a
    # per-doc sentinel shingle (unique ⇒ zero overlap with any other doc
    # ⇒ Jaccard distance 1 > the 0.7 cut, so no spurious pairs), and the
    # size gate stays only to prune them early when it does run first
    # (EDGE_SWEEP_r10 class A).
    d = table(spark, sf_dir, "documents").withColumn(
        "sh", shingles(words(F.col("text")))
    )
    sentinel = F.array(F.concat(F.lit("\x00empty\x00"), F.col("doc_id").cast("string")))
    d = d.withColumn(
        "sh", F.when(F.size("sh") > 0, F.col("sh")).otherwise(sentinel)
    )
    d = d.filter(~F.col("sh")[0].startswith("\x00empty\x00"))
    tf = HashingTF(inputCol="sh", outputCol="features", binary=True, numFeatures=1 << 18)
    feat = tf.transform(d)
    # 6 tables: OR-amplified candidate recall at the 0.7-distance cut is
    # ~0.88 per boundary pair vs 0.94 at 8 — measured full recall of the
    # exact ≥0.3-Jaccard pair set on this corpus at 22% less cost
    # (tests/test_correctness.py pins that recall contract)
    lsh = MinHashLSH(inputCol="features", outputCol="bands", numHashTables=6, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.7, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id1"),
            F.col("datasetB.doc_id").alias("id2"),
            F.round(1 - F.col("jaccard_dist"), 4).alias("est_jaccard"),
        )
        .orderBy(F.col("est_jaccard").desc(), "id1", "id2")
    )


@register(
    "text_tfidf",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tokens WHERE word <> ''
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 4) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tfidf FROM scored
    QUALIFY ROW_NUMBER() OVER
      (PARTITION BY doc_id ORDER BY tfidf DESC, word) <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document, pure-SQL formulation. The tf→df
    join is deliberately unhinted: at 100 TB the distinct-token table is
    billions of rows (a mandatory broadcast would OOM the executors —
    VERDICT r1 wrong-#2), and `tf` is already hash-partitioned on `word`
    from its aggregation, so AQE broadcasts when df is small and falls
    back to a co-partitioned shuffle join when it is not."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = tokens.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # r11: tf rows are already distinct per (doc_id, word) — a plain
    # count equals the distinct count and skips the two-phase distinct
    # aggregation (one Expand+Exchange less in the plan)
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # driver-side scalar: parquet footer count, O(files)
    scored = tf.join(df, "word").select(
        "doc_id",
        "word",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("doc_id", "word", "tfidf")
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*)                                   AS n_docs,
           ROUND(AVG(n_chars), 4)                     AS avg_chars,
           MIN(n_chars)                               AS min_chars,
           MAX(n_chars)                               AS max_chars,
           COUNT(CASE WHEN n_chars >= 300 THEN 1 END) AS n_long
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang/source corpus stats — the 'what's in my training dump'
    dashboard query."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.count(F.when(F.col("n_chars") >= 300, 1)).alias("n_long"),
    )
