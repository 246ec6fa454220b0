"""Text-analysis extensions for training-data pipelines: quality scoring,
token counting, language ID, document fingerprinting (driver-mandated,
beyond SURVEY §2.11's core set).

Everything is built-in Column expressions (split / HOFs / regexp) — the
whole family runs inside whole-stage codegen, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.text import (
    STOPWORDS,
    avg_word_len,
    positional_fingerprint,
    stopword_count,
    words,
)
from ..registry import register

_SW_SQL = "['" + "','".join(STOPWORDS) + "']"


@register(
    "text_quality_score",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           len(ws)                                          AS n_words,
           len(list_distinct(ws))                           AS n_distinct,
           ROUND(list_aggregate(list_transform(ws, x -> CAST(length(x) AS DOUBLE)),
                                'sum') / len(ws), 4)        AS avg_wlen,
           ROUND(len(list_filter(ws, x -> list_contains({_SW_SQL}, x)))
                 * 1.0 / len(ws), 4)                        AS stopword_ratio,
           ROUND(len(list_distinct(ws)) * 1.0 / len(ws), 4) AS ttr
    FROM w WHERE len(ws) > 0
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc-quality features: length, vocabulary richness
    (type-token ratio), stopword density — the standard pre-training
    filter inputs (C4/Gopher-style rules)."""
    d = table(spark, sf_dir, "documents").withColumn("ws", words(F.col("text")))
    d = d.filter(F.size("ws") > 0)
    return d.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
        F.round(avg_word_len(F.col("ws")), 4).alias("avg_wlen"),
        F.round(stopword_count(F.col("ws")) / F.size("ws"), 4).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct("ws")) / F.size("ws"), 4).alias("ttr"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+'))              AS re_tokens,
           length(text)                                            AS n_chars_exact
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex pass —
    the budget metric of every training-data pipeline."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(words(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)).alias("re_tokens"),
        F.length("text").alias("n_chars_exact"),
    )


@register(
    "text_langid",
    # Data-driven n-gram-style heuristic: profile = top-5 most frequent
    # words per language over the corpus (ties → word asc); a doc's
    # predicted language is the profile with the largest distinct-word
    # overlap (ties → lang asc). Deterministic, so fully SQL-expressible.
    oracle="""
    WITH tokens AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), freq AS (
      SELECT lang, word, COUNT(*) AS c FROM tokens WHERE word <> ''
      GROUP BY lang, word
    ), profile AS (
      SELECT lang AS plang, word FROM freq
      QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, word) <= 5
    ), doc_words AS (
      SELECT DISTINCT doc_id, word FROM tokens WHERE word <> ''
    ), overlap AS (
      SELECT d.doc_id, p.plang, COUNT(*) AS hits
      FROM doc_words d JOIN profile p ON d.word = p.word
      GROUP BY d.doc_id, p.plang
    )
    SELECT o.doc_id, o.plang AS pred_lang, o.hits
    FROM overlap o
    QUALIFY ROW_NUMBER() OVER
      (PARTITION BY o.doc_id ORDER BY o.hits DESC, o.plang) = 1
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by corpus-derived word profiles. The profile (5 langs ×
    5 words) broadcasts; classification is one hash join + top-1 window.
    (Fixture text is synthetic word soup, so accuracy is meaningless —
    the operator shape is what matters.)"""
    d = table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    freq = tokens.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("lang").orderBy(F.col("c").desc(), "word")
    profile = (
        freq.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= 5)
        .select(F.col("lang").alias("plang"), "word")
    )
    doc_words = tokens.select("doc_id", "word").distinct()
    overlap = doc_words.join(F.broadcast(profile), "word").groupBy(
        "doc_id", "plang"
    ).agg(F.count(F.lit(1)).alias("hits"))
    wo = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), "plang")
    return (
        overlap.withColumn("_rn", F.row_number().over(wo))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("plang").alias("pred_lang"), "hits")
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(list_aggregate(
             list_transform(range(1, len(ws) + 1),
               i -> i * (CAST(ascii(ws[i][1]) AS BIGINT) * 31
                         + CAST(length(ws[i]) AS BIGINT))),
             'sum') AS BIGINT) AS fingerprint
    FROM w WHERE len(ws) > 0
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional rolling fingerprint (pure int arithmetic, oracle-exact).
    Identical fingerprints ⇒ candidate exact dups at copy-paste scale."""
    d = table(spark, sf_dir, "documents").withColumn("ws", words(F.col("text")))
    d = d.filter(F.size("ws") > 0)
    return d.select("doc_id", positional_fingerprint(F.col("ws")).alias("fingerprint"))


@register(
    "text_quality_filter_e2e",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    q AS (
      SELECT lang, len(ws) AS n_words,
             len(list_distinct(ws)) * 1.0 / len(ws) AS ttr
      FROM w
      WHERE len(ws) BETWEEN 20 AND 90
        AND len(list_distinct(ws)) * 1.0 / len(ws) >= 0.5
        AND len(list_filter(ws, x -> list_contains({_SW_SQL}, x)))
            * 1.0 / len(ws) <= 0.6
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           floor(AVG(ttr) * 10000 + 0.5 + 1e-9) / 10000 AS avg_ttr
    FROM q GROUP BY lang
    """,
)
def text_quality_filter_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter pass of a curation pipeline, end-to-end:
    Gopher/C4-style rules (token-count bounds, type-token ratio floor,
    stopword-density ceiling) applied in one codegen'd scan, then
    surviving-corpus stats per language. One shuffle total (the final
    tiny groupBy) — the filter itself is embarrassingly parallel, which
    is exactly why rule-based filtering is the first pass at 100 TB.
    avg_ttr uses epsilon half-up rounding (ttr > 0): plain round() flips
    on summation-order ulp noise across engines."""
    d = table(spark, sf_dir, "documents").withColumn("ws", words(F.col("text")))
    ttr = F.size(F.array_distinct("ws")) / F.size("ws")
    sw_ratio = stopword_count(F.col("ws")) / F.size("ws")
    survivors = d.filter(
        F.size("ws").between(20, 90) & (ttr >= 0.5) & (sw_ratio <= 0.6)
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ws")).alias("total_tokens"),
        (F.floor(F.avg(ttr) * 10000 + 0.5 + 1e-9) / 10000).alias("avg_ttr"),
    )


@register("text_fingerprint_xx")  # rows-only: xxhash64 is Spark-specific
def text_fingerprint_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strong 64-bit fingerprint: xxhash64 over the normalized token
    stream — collision-safe exact-dedup key at 100 TB (groupBy this
    instead of the full text: shuffle carries 8 bytes/doc, not the doc)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64(F.concat_ws(" ", words(F.col("text")))).alias("fp64"),
    )


@register(
    "text_pii_scrub",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@mail.example.com or call 555-' ||
             lpad(CAST(doc_id * 7919 % 10000 AS VARCHAR), 4, '0') AS full_text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(full_text,
                '[a-z0-9.]+@[a-z][a-z.]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(full_text,
                '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(full_text,
                '[a-z0-9.]+@[a-z][a-z.]+', '<EMAIL>', 'g'),
                '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
    FROM p
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — a mandatory pass in any training-data pipeline:
    find-and-mask email addresses and phone-shaped tokens, reporting
    per-doc match counts for audit. The fixture corpus contains no PII,
    so a deterministic synthetic contact line (keyed off `doc_id`) is
    appended first; the scrub itself is the operator under test.

    Pure codegen'd Column ops — `regexp_count` + `regexp_replace`
    (global replace is Spark's default; the oracle needs the explicit
    'g' flag) — so the pass is embarrassingly parallel with zero
    shuffle: precisely the shape a 100 TB redaction sweep needs.
    Patterns stay in the POSIX-simple intersection of Java regex and
    RE2 (SURVEY §5.3.5)."""
    d = table(spark, sf_dir, "documents")
    email = r"[a-z0-9.]+@[a-z][a-z.]+"
    phone = r"[0-9]{3}-[0-9]{4}"
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-"),
        F.lpad((F.col("doc_id") * 7919 % 10000).cast("string"), 4, "0"),
    )
    p = d.select("doc_id", full.alias("full_text"))
    return p.select(
        "doc_id",
        F.regexp_count("full_text", F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count("full_text", F.lit(phone)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("full_text", email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("scrubbed"),
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH c AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS n FROM c GROUP BY doc_id, ch)
    SELECT doc_id,
           ROUND(LOG2(SUM(n)) - SUM(n * LOG2(n)) / SUM(n), 4) AS char_entropy
    FROM cnt GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the cheap
    gibberish/boilerplate detector (mojibake and repeated-char spam sit
    far below natural-text entropy; random bytes far above). Same
    H = log2(N) − Σn·log2(n)/N two-level aggregation as agg_entropy;
    the explode is n_chars rows per doc but the first partial agg
    collapses them map-side to ≤ |alphabet| rows per doc before any
    shuffle."""
    d = table(spark, sf_dir, "documents")
    c = d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
    cnt = c.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    n, logn = F.sum("n"), F.sum(F.col("n") * F.log2("n"))
    return cnt.groupBy("doc_id").agg(
        F.round(F.log2(n) - logn / n, 4).alias("char_entropy")
    )
