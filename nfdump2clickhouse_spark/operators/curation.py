"""Training-data curation operators beyond dedup: benchmark
decontamination, deterministic train/valid/test splits, and embedding
post-processing (L2 normalization, int8 quantization).

Reference parity: the reference has none of these [P — it is an ETL
bridge, /root/reference/README.md:1-3]; all four are driver-mandated
LLM-pipeline extensions (BASELINE.json:6). Scale shape: decontamination
is a broadcast join of the (small) benchmark shingle set against an
inverted index — never corpus×benchmark pairs; the split and both
embedding ops are scan-local codegen with zero shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions.similarity import as_double, dot, l2_norm
from ..functions.text import shingles, words
from ..registry import register

# Knuth multiplicative hash — shared with reshape.py's samplers so split
# membership is a pure function of the key, reproducible across engines.
_MULT = 2654435761


@register(
    "text_decontaminate",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT doc_id, COUNT(*) AS n_shared
    FROM sh
    WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM bench)
    GROUP BY doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with a held-out benchmark set (docs with doc_id % 97 == 0
    stand in for the benchmark; real pipelines use 13-grams — the
    fixture's short docs make 3-grams the meaningful size).

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus, so it broadcasts; the train side streams through one scan +
    one partial-aggregated groupBy. The corpus is never self-joined and
    the benchmark is never exploded against it — contamination hits are
    bounded by |benchmark shingles| × df, not |corpus|²."""
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(shingles(words(F.col("text"))))).alias("shingle")
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register(
    "sample_train_split",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN (doc_id * {_MULT}) % 4294967296 % 100 < 5  THEN 'test'
                  WHEN (doc_id * {_MULT}) % 4294967296 % 100 < 15 THEN 'valid'
                  ELSE 'train' END AS split,
             n_chars, lang
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
    FROM s GROUP BY split
    """,
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 85/10/5 train/valid/test split by multiplicative
    key hash — membership is a pure function of doc_id, so re-runs,
    backfills, and distributed readers all agree without coordination
    (`df.randomSplit` is partition-layout-dependent and irreproducible
    across engines). Scan-local predicate + one tiny aggregation."""
    d = table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_MULT)) % F.lit(4294967296) % 100
    split = (
        F.when(bucket < 5, "test").when(bucket < 15, "valid").otherwise("train")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        )
    )


@register(
    "emb_normalize",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, emb,
             sqrt(list_aggregate(list_transform(emb, x -> x * x), 'sum')) AS nrm
      FROM e
    )
    SELECT vec_id, ROUND(nrm, 4) AS l2,
           ROUND(emb[1] / nrm, 4) + 0 AS u0,
           ROUND(emb[2] / nrm, 4) + 0 AS u1,
           ROUND(emb[3] / nrm, 4) + 0 AS u2
    FROM n
    """,
)
def emb_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings (the prerequisite for cosine-as-dot ANN
    indexes: normalize once at ingest, then every similarity is a plain
    dot product). Pure zip_with/aggregate HOFs, zero shuffle; the fold
    is sequential so the norm is bit-identical to the oracle's ordered
    list sum."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    nrm = l2_norm(F.col("emb"))
    # "+ 0" canonicalizes -0.0 → 0.0 in both engines (SURVEY §8 recipe)
    return e.select(
        "vec_id",
        F.round(nrm, 4).alias("l2"),
        (F.round(F.get("emb", 0) / nrm, 4) + 0).alias("u0"),
        (F.round(F.get("emb", 1) / nrm, 4) + 0).alias("u1"),
        (F.round(F.get("emb", 2) / nrm, 4) + 0).alias("u2"),
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, emb,
             greatest(list_aggregate(list_transform(emb, x -> abs(x)), 'max'),
                      1e-30) AS scale
      FROM e
    ),
    q AS (
      SELECT vec_id, emb, scale,
             list_transform(emb, x -> CAST(round(127 * x / scale) AS INT)) AS qv
      FROM s
    )
    SELECT vec_id, ROUND(scale, 4) AS scale,
           qv[1] AS q0, qv[2] AS q1, qv[3] AS q2,
           floor(list_aggregate(
                   [pow(emb[i] - qv[i] * scale / 127, 2)
                    for i in generate_series(1, len(emb))],
                   'sum') / len(emb) * 1000000 + 0.5 + 1e-9) / 1000000 AS mse
    FROM q
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (the 4× storage cut every
    100 TB vector corpus takes before indexing): scale = max |x|,
    q = round(127·x/scale), plus the dequantization MSE as the quality
    audit column. All array HOFs in codegen — no Python, no shuffle;
    quantized vectors are emitted as spot-check elements because hashing
    the full int array adds nothing the MSE doesn't already cover."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    # greatest(·, 1e-30): an all-zero embedding would otherwise divide by
    # zero — NaN q-values here, a hard NaN→INT cast error in the oracle
    # (ADVICE r1); with the floor the degenerate vector quantizes to all
    # zeros with mse 0 on both engines
    scale = F.greatest(F.array_max(F.transform("emb", F.abs)), F.lit(1e-30))
    # internal name deliberately differs from the output alias "scale":
    # with identical names, Spark's implicit LATERAL column alias
    # resolution would bind the mse expression below to the ROUNDED
    # output column that precedes it in the select list, silently
    # dequantizing with round(scale, 4) instead of scale
    s = e.select("vec_id", "emb", scale.alias("_scale"))
    q = s.withColumn(
        "qv",
        F.transform("emb", lambda x: F.round(x * 127 / F.col("_scale"), 0).cast("int")),
    )
    err = F.zip_with(
        "emb",
        "qv",
        lambda x, qq: F.pow(x - qq.cast("double") * F.col("_scale") / 127, 2),
    )
    mse = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x) / F.size("emb")
    # epsilon half-up rounding (mse ≥ 0): the quantization error can land
    # exactly on a .5e-6 boundary where engine ulp noise flips the 6th
    # decimal — same recipe as ts_interpolate / text_quality_filter_e2e
    eps_round = F.floor(mse * 1000000 + 0.5 + 1e-9) / 1000000
    return q.select(
        "vec_id",
        F.round("_scale", 4).alias("scale"),
        F.get("qv", 0).alias("q0"),
        F.get("qv", 1).alias("q1"),
        F.get("qv", 2).alias("q2"),
        eps_round.alias("mse"),
    )


@register(
    "doc_chunking",
    oracle="""
    SELECT doc_id,
           CAST((s - 1) / 150 AS BIGINT)       AS chunk_id,
           s                                    AS start_char,
           length(substring(text, s, 200))      AS chunk_len,
           md5(substring(text, s, 200))         AS chunk_md5
    FROM documents, UNNEST(generate_series(1, greatest(n_chars, 1), 150)) AS t(s)
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (200-char windows, 150 stride →
    50-char overlap): the context-window prep step of every training/RAG
    pipeline, with stable chunk ids derived arithmetically from the
    start offset (no ordinality needed, so re-chunking is reproducible
    shard-by-shard). One `sequence` + `explode` per row — scan-local,
    zero shuffle; chunks are verified by md5 so the hash check proves
    byte-exact window placement, not just counts."""
    d = table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n_chars"), F.lit(1)).cast("int"), F.lit(150)
    )
    ch = d.select(
        "doc_id", "text", F.explode(starts).alias("s")
    ).withColumn("chunk", F.expr("substring(text, s, 200)"))
    return ch.select(
        "doc_id",
        ((F.col("s") - 1) / 150).cast("bigint").alias("chunk_id"),
        F.col("s").cast("bigint").alias("start_char"),
        F.length("chunk").cast("bigint").alias("chunk_len"),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_md5"),
    )
