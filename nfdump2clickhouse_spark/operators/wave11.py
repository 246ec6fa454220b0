"""Wave-11 operators (round 2): deeper LLM-training-pipeline coverage —
Gopher-style repetition filtering, a dataset-card report, lag-feature
engineering, and the point-in-time (leakage-safe) feature join.

Same SURVEY §5.3 conventions as waves 4-10.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.text import words
from ..registry import register

# --- repetition filtering (Gopher rule family) -------------------------------


@register(
    "text_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, n_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, n_chars, len(ws) AS n_words,
             ws[i] || ' ' || ws[i+1] AS bg
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
    ),
    r AS (
      SELECT doc_id, n_chars, n_words,
             COUNT(*) AS n_bigrams,
             COUNT(DISTINCT bg) AS n_distinct
      FROM g GROUP BY doc_id, n_chars, n_words
    )
    SELECT doc_id, n_words,
           ROUND((n_bigrams - n_distinct) * 1.0 / n_bigrams, 4) AS dup_frac,
           (n_bigrams - n_distinct) * 1.0 / n_bigrams > 0.2 AS is_repetitive
    FROM r WHERE n_bigrams > 0
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring — the Gopher/RefinedWeb rule
    the quality family was missing: the fraction of duplicate word
    bigrams inside each doc (boilerplate, keyword stuffing, and
    generation loops all spike it; `text_quality_score` sees none of
    them because its signals are length/charset shaped). Docs above 20%
    duplicate bigrams get the `is_repetitive` flag the filter pipeline
    consumes.

    Entirely row-local: the bigram multiset and its distinct count are
    array HOFs on the already-split word array — no explode, no
    shuffle, one codegen'd scan at any corpus size (contrast
    `dedup_ngram_jaccard`, which must shuffle because its duplicates
    are ACROSS documents)."""
    d = table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = d.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct"),
    ).filter(F.col("n_bigrams") > 0)
    dup = (F.col("n_bigrams") - F.col("n_distinct")) / F.col("n_bigrams")
    return base.select(
        "doc_id",
        "n_words",
        F.round(dup, 4).alias("dup_frac"),
        (dup > 0.2).alias("is_repetitive"),
    )


# --- dataset-card report -----------------------------------------------------


@register(
    "corpus_report_e2e",
    oracle="""
    WITH t AS (
      SELECT source, lang, n_chars,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS tokens,
             md5(text) AS fp
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dups
    FROM t GROUP BY source
    """,
)
def corpus_report_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics per source: doc and token counts, length,
    language spread, and exact-duplicate counts — the summary table
    every corpus release ships (and the first thing reviewed before a
    training run).

    ONE scan: tokens and fingerprints are row-local, then a single
    source-keyed partial+final agg; the distinct-counts ride the same
    Expand as `data_profile`. At 100 TB this is deliberately NOT a
    composition of the other keys re-run per metric — the report costs
    one pass, which is the difference between a dataset card that gets
    generated per release and one that doesn't."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(words(F.col("text"))).alias("tokens"),
        F.md5("text").alias("fp"),
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
    )


# --- lag-feature engineering -------------------------------------------------


@register(
    "events_lag_features",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value, 4) AS v,
           ROUND(LAG(value, 1) OVER w, 4) AS v_lag1,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) AS v_rollmean3,
           CAST(epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS BIGINT)
             AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal feature engineering for model training: per-user lag,
    trailing mean, and inter-event gap — the feature-store transform
    that turns raw event logs into training rows. The frame ends at
    1 PRECEDING, never CURRENT ROW: the rolling mean must not see the
    row being predicted (same leakage discipline as
    `features_pit_join`).

    ONE user-keyed sort serves all three features (lag, rolling mean,
    gap share the window spec), so the corpus shuffles once; output is
    row-per-event, ready to join against labels."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(-3, -1)
    us = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("v"),
        F.round(F.lag("value", 1).over(w), 4).alias("v_lag1"),
        F.round(F.avg("value").over(wr), 4).alias("v_rollmean3"),
        (us - F.lag(us, 1).over(w)).cast("bigint").alias("us_since_prev"),
    )


# --- point-in-time feature join ----------------------------------------------


@register(
    "features_pit_join",
    oracle="""
    WITH labels AS (
      SELECT event_id AS label_id, user_id, ts AS label_ts
      FROM events WHERE event_type = 'purchase'
    ),
    snapshots AS (
      -- all-integer arithmetic: a cumulative float AVG (and even an
      -- int-sum / float-count division) hits round-4 ulp boundaries
      -- that the two engines resolve differently (seen at sf0.01);
      -- round-half-up integer division (2s+n) DIV 2n is exact
      SELECT user_id, ts AS feat_ts, event_id AS feat_id,
             SUM(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
             COUNT(*)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
      FROM events
    ),
    ranked AS (
      SELECT l.label_id, l.user_id,
             CAST((2 * s.s + s.n) // (2 * s.n) AS BIGINT)
               AS lifetime_avg_cents,
             ROW_NUMBER() OVER (PARTITION BY l.label_id
               ORDER BY s.feat_ts DESC, s.feat_id DESC) AS rn
      FROM labels l JOIN snapshots s
        ON l.user_id = s.user_id AND s.feat_ts < l.label_ts
    )
    SELECT label_id, user_id, lifetime_avg_cents FROM ranked WHERE rn = 1
    """,
)
def features_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join — the leakage-safe training join: each
    label (purchase) is enriched with the LATEST feature snapshot
    STRICTLY BEFORE the label timestamp, never after (joining on the
    nearest snapshot regardless of direction trains on the future; the
    classic silent model-quality bug). This is `join_asof`'s semantics
    promoted to the feature-store contract: per-entity, per-label-time,
    strict inequality.

    Shape: snapshots carry a running feature (one user-keyed window),
    then a user-keyed join + per-label latest-snapshot window. Both
    shuffles key on user_id, so AQE can reuse the partitioning; at
    feature-store scale the snapshot side is pre-bucketed by entity and
    the join is exchange-free on that side."""
    e = table(spark, sf_dir, "events")
    labels = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.col("ts").alias("label_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # all-integer running state (see oracle comment): exact cross-engine
    cents = F.round(F.col("value") * 100).cast("bigint")
    snapshots = e.select(
        "user_id",
        F.col("ts").alias("feat_ts"),
        F.col("event_id").alias("feat_id"),
        F.sum(cents).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    j = labels.join(snapshots, "user_id").filter(
        F.col("feat_ts") < F.col("label_ts")
    )
    wl = Window.partitionBy("label_id").orderBy(
        F.desc("feat_ts"), F.desc("feat_id")
    )
    # DIV, not `/`: Spark's `/` promotes integers to double, which is
    # the exact boundary problem this formulation removes
    avg_cents = F.expr("CAST((2 * s + n) DIV (2 * n) AS BIGINT)")
    return (
        j.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select(
            "label_id", "user_id", avg_cents.alias("lifetime_avg_cents")
        )
    )
