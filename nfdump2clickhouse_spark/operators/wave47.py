"""Wave-47 keys (round 5): readability, flow asymmetry, deseasonalized
anomalies, capture–recapture, proportion trend.

- ``text_flesch_reading_ease``: Flesch reading-ease scoring with the
  vowel-group syllable heuristic [P — Flesch 1948; the readability
  filter layer in text curation].
- ``flows_unidirectional_ratio``: one-way-traffic share per source
  [P — unanswered flows are the scan/spoof/backscatter signal].
- ``events_anomaly_deseasonalized``: weekday-adjusted daily anomaly
  z-scores [P — deseasonalize BEFORE thresholding, or every Monday is
  an anomaly].
- ``stats_capture_recapture``: Lincoln–Petersen population estimate
  [P — Petersen 1896; used in analytics to estimate the UNSEEN
  population: total users/defects/duplicates beyond those observed].
- ``stats_cochran_armitage``: Cochran–Armitage trend-in-proportions
  test over ordered days [P — Cochran 1954, Armitage 1955; 'is the
  conversion RATE trending?' with binary outcomes].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# text_flesch_reading_ease
# ---------------------------------------------------------------------------


@register(
    "text_flesch_reading_ease",
    oracle="""
    WITH d AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_words,
             greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                      x -> trim(x) <> '')), 1) AS n_sents,
             greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS n_syll
      FROM documents
    ),
    scored AS (
      SELECT lang,
             206.835 - 1.015 * (n_words * 1.0 / n_sents)
                     - 84.6 * (n_syll * 1.0 / n_words) AS fre
      FROM d WHERE n_words > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(fre), 4) AS mean_fre,
           ROUND(MIN(fre), 4) AS min_fre,
           ROUND(MAX(fre), 4) AS max_fre,
           CAST(count_if(fre < 30) AS BIGINT) AS n_very_hard
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def text_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per language: 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words), with syllables approximated
    by vowel-group runs ([aeiouy]+ — the standard cheap heuristic) —
    the readability layer of a text-quality stack (`doc_sentence_stats`
    supplies the structure, this scores it; docs under 30 are
    'very hard' — academic/legalese/garbled). The heuristic's bias is
    uniform across a corpus, which is all a FILTER needs.

    All three counts are scan-local regexp/split codegen with the same
    patterns both engines; one language rollup. Sentence and syllable
    floors of 1 keep degenerate docs finite identically."""
    d = table(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).alias(
            "n_words"
        ),
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x) != ""
                )
            ),
            F.lit(1),
        ).alias("n_sents"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
            F.lit(1),
        ).alias("n_syll"),
    )
    fre = (
        F.lit(206.835)
        - 1.015 * (F.col("n_words") * 1.0 / F.col("n_sents"))
        - 84.6 * (F.col("n_syll") * 1.0 / F.col("n_words"))
    )
    scored = d.filter(F.col("n_words") > 0).select("lang", fre.alias("fre"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("fre"), 4).alias("mean_fre"),
            F.round(F.min("fre"), 4).alias("min_fre"),
            F.round(F.max("fre"), 4).alias("max_fre"),
            F.count_if(F.col("fre") < 30).cast("bigint").alias("n_very_hard"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# flows_unidirectional_ratio
# ---------------------------------------------------------------------------


@register(
    "flows_unidirectional_ratio",
    oracle="""
    WITH f AS (
      SELECT DISTINCT
             '10.0.' || CAST(user_id % 50 AS VARCHAR) AS sa,
             '10.0.' || CAST((user_id + event_id) % 50 AS VARCHAR) AS da
      FROM events
      WHERE user_id % 50 <> (user_id + event_id) % 50
    ),
    tagged AS (
      SELECT a.sa, a.da,
             EXISTS (SELECT 1 FROM f b
                     WHERE b.sa = a.da AND b.da = a.sa) AS answered
      FROM f a
    )
    SELECT sa,
           CAST(COUNT(*) AS BIGINT) AS n_peers,
           CAST(count_if(NOT answered) AS BIGINT) AS n_unanswered,
           CAST(10000 * count_if(NOT answered) // COUNT(*) AS BIGINT)
             AS unanswered_bp
    FROM tagged GROUP BY sa
    HAVING count_if(NOT answered) > 0
    ORDER BY sa
    """,
)
def flows_unidirectional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way-traffic audit: for every source, the share of peer
    directions that were never ANSWERED (no flow in the reverse
    direction anywhere in the window) — unanswered traffic is the
    scan / spoofed-source / backscatter signal, and a source whose
    peers are mostly silent is probing, not conversing. The
    per-source asymmetry view of what `flows_biflow` aggregates into
    per-pair direction counters.

    The reverse-existence check is a LEFT SEMI self-join of the
    distinct direction table on the swapped key — the distinct table
    is |active pairs| (far below flow count), both sides hash on the
    same pair domain, and no EXISTS subquery runs per row (the
    oracle's EXISTS is the spec, the semi-join is the plan)."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id")
    f = (
        e.select(
            F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias(
                "sa"
            ),
            F.concat(
                F.lit("10.0."),
                ((F.col("user_id") + F.col("event_id")) % 50).cast("string"),
            ).alias("da"),
        )
        .filter(F.col("sa") != F.col("da"))
        .distinct()
        .localCheckpoint()  # forward and reverse sides share one compute
    )
    rev = f.select(F.col("sa").alias("da"), F.col("da").alias("sa"))
    answered = f.join(rev, ["sa", "da"], "left_semi").withColumn(
        "answered", F.lit(True)
    )
    tagged = f.join(answered, ["sa", "da"], "left").na.fill(
        {"answered": False}
    )
    un = ~F.col("answered")
    return (
        tagged.groupBy("sa")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_peers"),
            F.count_if(un).cast("bigint").alias("n_unanswered"),
            F.expr(
                "10000 * count_if(NOT answered) DIV count(1)"
            )
            .cast("bigint")
            .alias("unanswered_bp"),
        )
        .filter(F.col("n_unanswered") > 0)
        .orderBy("sa")
    )


# ---------------------------------------------------------------------------
# events_anomaly_deseasonalized
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_deseasonalized",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    dows AS (
      SELECT day, rev, dayofweek(day) AS dow FROM daily
    ),
    adj AS (
      SELECT day, rev, dow,
             rev - AVG(rev) OVER (PARTITION BY dow) AS resid
      FROM dows
    ),
    m AS (
      SELECT day, resid,
             AVG(resid) OVER () AS mu,
             STDDEV_SAMP(resid) OVER () AS sigma
      FROM adj
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND((resid - mu) / sigma, 4) + 0 AS z,
           CAST(ABS((resid - mu) / sigma) > 2.5 AS BOOLEAN) AS is_anomaly
    FROM m ORDER BY day
    """,
)
def events_anomaly_deseasonalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted anomaly scores: subtract each day's
    day-of-week mean from daily revenue FIRST, then z-score the
    residuals — without the adjustment every weekend is an 'anomaly'
    and real weekday incidents hide inside the weekly swing (the
    deseasonalize-then-threshold discipline `events_anomaly_zscore`
    skips and `ts_hampel_outliers` sidesteps with robustness).

    One day-grain aggregate; the weekday means, residual moments and
    z-scores are all windows over the bounded day table. dow numbering
    is 0=Sunday in both engines at this call pattern (the
    `ts_seasonal_decompose` precedent)."""
    daily = (
        table(spark, sf_dir, "events")
        # two-sided gate: a dateless event has no weekday (r8 nullmix)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
    )
    dows = daily.select("day", "rev", (F.dayofweek("day") - 1).alias("dow"))
    adj = dows.withColumn(
        "resid", F.col("rev") - F.avg("rev").over(Window.partitionBy("dow"))
    )
    wt = Window.partitionBy()
    m = adj.withColumn("mu", F.avg("resid").over(wt)).withColumn(
        "sigma", F.stddev_samp("resid").over(wt)
    )
    # try_divide: sigma degenerates to 0 on a tiny/uniform day table —
    # NULL z on both engines (DuckDB x/0 is NULL), not an ANSI crash
    z = F.try_divide(F.col("resid") - F.col("mu"), F.col("sigma"))
    return m.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.round(z, 4) + F.lit(0)).alias("z"),
        (F.abs(z) > 2.5).alias("is_anomaly"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# stats_capture_recapture
# ---------------------------------------------------------------------------


@register(
    "stats_capture_recapture",
    oracle="""
    WITH caps AS (
      SELECT user_id,
             count_if(event_id % 2 = 0) > 0 AS in_a,
             count_if(event_id % 2 = 1) > 0 AS in_b
      FROM events GROUP BY user_id
    ),
    c AS (
      -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
      SELECT COALESCE(count_if(in_a), 0) AS n1,
             COALESCE(count_if(in_b), 0) AS n2,
             COALESCE(count_if(in_a AND in_b), 0) AS m,
             COUNT(*) AS true_n
      FROM caps
    )
    SELECT CAST(n1 AS BIGINT) AS capture_1,
           CAST(n2 AS BIGINT) AS capture_2,
           CAST(m AS BIGINT) AS recaptured,
           ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1, 4)
             AS chapman_estimate,
           CAST(true_n AS BIGINT) AS observed_union
    FROM c
    """,
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen capture–recapture (Chapman's bias-corrected
    form): treat even and odd event_ids as two independent 'capture'
    occasions of users; N̂ = (n1+1)(n2+1)/(m+1) − 1 estimates the
    TOTAL population including users neither capture saw — the
    estimator analytics borrows from ecology to answer 'how many
    duplicates/defects/users exist beyond the ones my two imperfect
    detectors found?' (e.g. two dedup methods' overlap →
    `dedup_method_overlap` feeds exactly this). Here both captures see
    nearly everyone, so N̂ ≈ the observed union — the suite pins that
    consistency check.

    One user-keyed conditional rollup + a 1-row cell count — the
    `stats_mcnemar` shape with an estimator on top."""
    caps = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (F.count_if(F.col("event_id") % 2 == 0) > 0).alias("in_a"),
            (F.count_if(F.col("event_id") % 2 == 1) > 0).alias("in_b"),
        )
    )
    a, b = F.col("in_a"), F.col("in_b")
    c = caps.agg(
        F.count_if(a).alias("n1"),
        F.count_if(b).alias("n2"),
        F.count_if(a & b).alias("m"),
        F.count(F.lit(1)).alias("true_n"),
    )
    return c.select(
        F.col("n1").cast("bigint").alias("capture_1"),
        F.col("n2").cast("bigint").alias("capture_2"),
        F.col("m").cast("bigint").alias("recaptured"),
        F.round(
            (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1, 4
        ).alias("chapman_estimate"),
        F.col("true_n").cast("bigint").alias("observed_union"),
    )


# ---------------------------------------------------------------------------
# stats_cochran_armitage
# ---------------------------------------------------------------------------


@register(
    "stats_cochran_armitage",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             count_if(event_type = 'purchase') AS k,
             COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT k, n,
             ROW_NUMBER() OVER (ORDER BY day) - 1 AS t
      FROM daily
    ),
    m AS (
      SELECT SUM(n) AS nn, SUM(k) AS kk,
             SUM(n * t) AS snt, SUM(k * t) AS skt,
             SUM(n * t * t) AS sntt
      FROM idx
    )
    SELECT CAST(nn AS BIGINT) AS n_events,
           CAST(kk AS BIGINT) AS n_hits,
           ROUND((skt - kk * 1.0 * snt / nn)
                 / SQRT((kk * 1.0 / nn) * (1 - kk * 1.0 / nn)
                        * (sntt - snt * 1.0 * snt / nn)), 4) + 0 AS z,
           ROUND(kk * 1.0 / nn, 4) AS overall_rate
    FROM m
    """,
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: is the purchase PROPORTION
    trending across ordered days? z = (Σk·t − K·Σn·t/N) /
    √(p̄(1−p̄)(Σn·t² − (Σn·t)²/N)) with t the day index — the
    binary-outcome trend test (`ts_mann_kendall` handles continuous
    levels; a proportion needs its binomial variance). The standard
    dose-response / conversion-drift statistic.

    One daily (k, n) aggregate, day indices from a window over the
    bounded day table, then a 1-row moment pass — integer counts feed
    every sum, so both engines assemble identical doubles."""
    daily = (
        table(spark, sf_dir, "events")
        # two-sided gate: a dateless event has no dose index — and under
        # mixed NULLs Spark indexes the NULL day t=0 where DuckDB gives
        # it the max t, flipping the trend sign (r8 nullmix sweep)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count_if(F.col("event_type") == "purchase").alias("k"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    idx = daily.select(
        "k", "n", (F.row_number().over(Window.orderBy("day")) - 1).alias("t")
    )
    k, n, t = F.col("k"), F.col("n"), F.col("t")
    m = idx.agg(
        F.sum(n).alias("nn"),
        F.sum(k).alias("kk"),
        F.sum(n * t).alias("snt"),
        F.sum(k * t).alias("skt"),
        F.sum(n * t * t).alias("sntt"),
    )
    nn, kk = F.col("nn"), F.col("kk")
    p = kk * 1.0 / nn
    # try_divide: a single day (zero time spread) or an all/none hit rate
    # leaves z undefined -> NULL, matching DuckDB (r7 edge sweep)
    z = F.try_divide(
        F.col("skt") - kk * 1.0 * F.col("snt") / nn,
        F.sqrt(
            p * (1 - p) * (F.col("sntt") - F.col("snt") * 1.0 * F.col("snt") / nn)
        ),
    )
    return m.select(
        nn.cast("bigint").alias("n_events"),
        kk.cast("bigint").alias("n_hits"),
        (F.round(z, 4) + F.lit(0)).alias("z"),
        F.round(p, 4).alias("overall_rate"),
    )
