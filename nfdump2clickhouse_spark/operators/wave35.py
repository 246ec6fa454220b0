"""Wave-35 keys (round 5): volatility bands, sentence segmentation,
embedding-dimension health, conversion latency, compressed-CSV ingest.

- ``ts_bollinger_bands``: rolling mean ± 2σ bands with breakout flags
  [P — Bollinger 1980s; the standard volatility-envelope chart].
- ``doc_sentence_stats``: sentence segmentation statistics per
  language [P — standard corpus profiling].
- ``emb_dimension_variance``: per-dimension moment screen over the
  embedding table [P — dead/dominant-dimension diagnostics before any
  quantization or indexing trusts the space].
- ``events_time_to_convert``: first-touch → first-purchase latency
  distribution [P — standard funnel latency metric].
- ``scan_csv_gzip``: gzip-compressed CSV ingestion with checksum
  verification — the log-delivery format half the world's exports
  actually arrive in.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# ts_bollinger_bands
# ---------------------------------------------------------------------------


@register(
    "ts_bollinger_bands",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS rev_c
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    w AS (
      SELECT day, rev_c,
             COUNT(*) OVER win AS n_days,
             AVG(rev_c) OVER win AS mu,
             STDDEV_SAMP(rev_c) OVER win AS sigma
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND(rev_c / 100.0, 4) AS revenue,
           ROUND(mu / 100.0, 4) AS ma7,
           ROUND((mu + 2 * sigma) / 100.0, 4) AS band_hi,
           ROUND((mu - 2 * sigma) / 100.0, 4) AS band_lo,
           CAST(rev_c > mu + 2 * sigma AS BOOLEAN) AS breakout_hi,
           CAST(rev_c < mu - 2 * sigma AS BOOLEAN) AS breakout_lo
    FROM w WHERE n_days = 7 ORDER BY day
    """,
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily purchase revenue: trailing 7-day mean
    ± 2 sample standard deviations, with breakout flags — the
    volatility envelope that separates 'big day' from 'anomalous day'
    relative to RECENT variance (vs `events_anomaly_zscore`'s global
    z). Sub-window days are suppressed.

    Daily revenue aggregates as INTEGER cents, so the rolling moment
    sums are bit-identical between engines before the final /100
    display division (the all-integer-state lesson from §8's running-
    mean catalog entry); the window is a bounded one-row-per-day frame
    after one combinable daily aggregate."""
    daily = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("rev_c"))
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    w = daily.select(
        "day",
        "rev_c",
        F.count(F.lit(1)).over(win).alias("n_days"),
        F.avg("rev_c").over(win).alias("mu"),
        F.stddev_samp("rev_c").over(win).alias("sigma"),
    )
    mu, sg, rev = F.col("mu"), F.col("sigma"), F.col("rev_c")
    return (
        w.filter(F.col("n_days") == 7)
        .select(
            "day",
            F.round(rev / 100.0, 4).alias("revenue"),
            F.round(mu / 100.0, 4).alias("ma7"),
            F.round((mu + 2 * sg) / 100.0, 4).alias("band_hi"),
            F.round((mu - 2 * sg) / 100.0, 4).alias("band_lo"),
            (rev > mu + 2 * sg).alias("breakout_hi"),
            (rev < mu - 2 * sg).alias("breakout_lo"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# doc_sentence_stats
# ---------------------------------------------------------------------------


@register(
    "doc_sentence_stats",
    oracle="""
    WITH s AS (
      SELECT lang, doc_id,
             len(list_filter(string_split_regex(text, '[.!?]+'),
                             x -> trim(x) <> '')) AS n_sent,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_words
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sent) AS BIGINT) AS n_sentences,
           ROUND(AVG(n_sent), 4) AS sent_per_doc,
           ROUND(SUM(n_words) * 1.0 / SUM(n_sent), 4) AS words_per_sent
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def doc_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation profile per language: split on terminal
    punctuation runs ([.!?]+), count non-empty sentences and words, and
    report sentences/doc and words/sentence — corpus-profiling numbers
    that feed chunking policy (`doc_chunking` wants sentence-shaped
    boundaries) and quality filters (degenerate words-per-sentence is a
    boilerplate tell).

    Splitting is scan-local regexp codegen (identical pattern both
    engines; Spark `split` and DuckDB `string_split_regex` agree on
    the [.!?]+ pattern); one language rollup is the only exchange."""
    d = table(spark, sf_dir, "documents")
    sents = F.size(
        F.filter(
            F.split(F.col("text"), r"[.!?]+"),
            lambda x: F.trim(x) != "",
        )
    )
    words = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    s = d.select("lang", sents.alias("n_sent"), words.alias("n_words"))
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_sent").cast("bigint").alias("n_sentences"),
            F.round(F.avg("n_sent"), 4).alias("sent_per_doc"),
            F.round(F.sum("n_words") * 1.0 / F.sum("n_sent"), 4).alias(
                "words_per_sent"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# emb_dimension_variance
# ---------------------------------------------------------------------------


@register(
    "emb_dimension_variance",
    oracle="""
    WITH d AS (
      SELECT t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS v
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    m AS (
      SELECT dim, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
      FROM d GROUP BY dim
    ),
    stats AS (
      SELECT dim - 1 AS dim,
             s / n AS mean_v,
             (ss - s * s / n) / (n - 1) AS var_v
      FROM m
    ),
    tot AS (SELECT SUM(var_v) AS tv FROM stats)
    SELECT CAST(stats.dim AS INT) AS dim,
           ROUND(mean_v, 4) + 0 AS mean_v,
           ROUND(var_v, 6) AS var_v,
           ROUND(10000 * var_v / tot.tv, 4) AS var_share_bp
    FROM stats CROSS JOIN tot
    ORDER BY dim
    """,
)
def emb_dimension_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moment screen over the embedding space: mean,
    variance, and each dimension's share of total variance in basis
    points — the health check that finds dead dimensions (≈0 variance:
    wasted index bytes) and dominant ones (a few dims carrying the
    space distorts cosine) before `emb_pq_quantize` / `ann_ivf_probe`
    trust the geometry. Complements `emb_whitening`, which FIXES what
    this key diagnoses.

    One posexplode → (dim) aggregate with integer-free but
    expansion-form moments (Σv, Σv² — identical expression both
    engines, the `stats_levene_test` discipline); 64 output rows; the
    total-variance normalizer is a window over the 64-row result, not
    a second scan (`stats_benford_test` lesson)."""
    e = table(spark, sf_dir, "embeddings").select(
        F.posexplode(F.col("embedding")).alias("dim", "v0")
    )
    d = e.select("dim", F.col("v0").cast("double").alias("v"))
    m = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    stats = m.select(
        "dim",
        (s / n).alias("mean_raw"),
        # try_divide: a single vector (n==1) leaves the sample variance
        # undefined -> NULL, matching DuckDB (r7 edge sweep)
        F.try_divide(ss - s * s / n, n - 1).alias("var_raw"),
    )
    wt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stats = stats.withColumn("tv", F.sum("var_raw").over(wt))
    return stats.select(
        F.col("dim").cast("int").alias("dim"),
        (F.round("mean_raw", 4) + F.lit(0)).alias("mean_v"),
        F.round("var_raw", 6).alias("var_v"),
        F.round(F.try_divide(F.lit(10000) * F.col("var_raw"), F.col("tv")), 4).alias(
            "var_share_bp"
        ),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# events_time_to_convert
# ---------------------------------------------------------------------------


@register(
    "events_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_buy
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT (first_buy - first_view) / 3600e6 AS hours
      FROM firsts
      WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
        AND first_buy >= first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(AVG(hours), 4) AS mean_h,
           ROUND(quantile_cont(hours, 0.5), 4) AS p50_h,
           ROUND(quantile_cont(hours, 0.9), 4) AS p90_h,
           ROUND(MIN(hours), 4) AS min_h,
           ROUND(MAX(hours), 4) AS max_h
    FROM conv
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: per user, time from FIRST view to FIRST
    purchase (users whose first purchase precedes any view are
    excluded — they converted through another door), summarized as
    mean / exact p50 / p90 / min / max hours. The funnel-latency
    number product teams steer by; complements `events_funnel`
    (conversion RATE) and `events_survival_km` (censoring-aware form).

    ONE user-keyed conditional-MIN aggregate computes both touchpoints
    (no per-type self-join); the latency distribution is a 1-row
    summary over the converted-user table. Microsecond integers until
    the final hours division (`events_interarrival_stats` lesson)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", t)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("first_buy"),
    )
    conv = (
        firsts.filter(
            F.col("first_view").isNotNull()
            & F.col("first_buy").isNotNull()
            & (F.col("first_buy") >= F.col("first_view"))
        )
        .select(
            ((F.col("first_buy") - F.col("first_view")) / F.lit(3600e6)).alias(
                "hours"
            )
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.avg("hours"), 4).alias("mean_h"),
        F.round(F.expr("percentile(hours, 0.5)"), 4).alias("p50_h"),
        F.round(F.expr("percentile(hours, 0.9)"), 4).alias("p90_h"),
        F.round(F.min("hours"), 4).alias("min_h"),
        F.round(F.max("hours"), 4).alias("max_h"),
    )


# ---------------------------------------------------------------------------
# scan_csv_gzip
# ---------------------------------------------------------------------------


@register(
    "scan_csv_gzip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS value_c
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def scan_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed CSV ingestion — the format scheduled exports
    actually deliver: write the events table as .csv.gz shards, read
    them back through Spark's codec-inferring CSV reader (extension-
    based, no option needed), and aggregate — the oracle recomputes
    the same rollup from the parquet source, so the
    encode → compress → decompress → parse round-trip is
    hash-verified end to end.

    The 100 TB caveat this key documents: a .gz file is NOT
    splittable — one file = one task regardless of size, so compressed
    delivery must arrive sharded (here: one shard per parallelism
    unit; `repartition` before write). Values travel as integer cents
    through the CSV text to dodge float-repr round-trip drift."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100)
        .cast("bigint")
        .alias("value_c"),
    )
    out = os.path.join(tempfile.mkdtemp(prefix="sf_csvgz_"), "events_csv")
    (
        ev.repartition(4)
        .write.mode("overwrite")
        .option("codec", "gzip")
        .option("header", True)
        .csv(out)
    )
    back = spark.read.option("header", True).csv(
        out, schema="event_id long, event_type string, value_c long"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("value_c").cast("bigint").alias("value_c"),
        )
        .orderBy("event_type")
    )
