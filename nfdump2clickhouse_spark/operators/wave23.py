"""Wave-23 keys (round 5): spatial join, forecast backtest, sketch
intersection, grouped splits, vocab economics.

- ``join_spatial_grid``: points-within-radius spatial join — Spark has
  no spatial join operator, so the engine uses the same discipline as
  the interval-join family: bucket to 1° grid cells, explode the SMALL
  side onto its 3×3 neighborhood, equi-join on the cell, exact
  haversine residual. [P — the standard grid/geohash blocking used by
  every distributed geo system.]
- ``events_forecast_backtest``: rolling-origin backtest of naive vs
  seasonal-naive daily forecasters — the baseline every forecast model
  (incl. `ts_holt_winters`) must beat, as an integer-exact report.
- ``agg_hll_intersection``: distinct-intersection estimate via
  inclusion–exclusion over mergeable HLL sketches — completes sketch
  algebra next to `agg_hll_sketch_merge` (union) and
  `agg_hll_sliding_union` (windowed reuse).
- ``sample_group_shuffle_split``: entity-grouped train/val/test split —
  all of a user's events land in ONE split (the leakage-safe protocol
  for behavioral data [P — scikit-learn GroupShuffleSplit semantics]);
  the report quantifies the leakage a row-level split WOULD have had.
- ``tokenizer_vocab_coverage``: vocabulary-economics report — what a
  top-K word vocab + byte fallback costs per corpus source (tokens per
  word, OOV share). The pricing step before committing to a tokenizer;
  `tokenizer_bpe_apply` does real sub-word encoding, this prices the
  fallback tail relationally.

All five hash-oracled (the HLL key rows-only: sketch estimates are
implementation-defined; its ≤5%-of-exact contract is pinned in tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

_MULT = 2654435761
_RADIUS_KM = 100.0


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH sites AS (
      SELECT n_nationkey AS site_id,
             -40.0 + (n_nationkey * 7.0) % 80 + 0.5   AS slat,
             -150.0 + (n_nationkey * 13.0) % 300 + 0.5 AS slon
      FROM nation
    ),
    pings AS (
      SELECT event_id,
             -40.0 + (user_id % 800) / 10.0 + 0.05     AS plat,
             -150.0 + ((user_id * 7 + event_id) % 3000) / 10.0 + 0.05
                                                       AS plon
      FROM events
    ),
    cells AS (  -- 3x3 neighborhood of each site's 1-degree cell
      SELECT s.*, CAST(FLOOR(slat) AS BIGINT) + dy AS cy,
             CAST(FLOOR(slon) AS BIGINT) + dx AS cx
      FROM sites s,
           (SELECT unnest([-1, 0, 1]) AS dy) a,
           (SELECT unnest([-1, 0, 1]) AS dx) b
    ),
    cand AS (
      SELECT c.site_id, c.slat, c.slon, p.event_id, p.plat, p.plon
      FROM cells c JOIN pings p
        ON CAST(FLOOR(p.plat) AS BIGINT) = c.cy
       AND CAST(FLOOR(p.plon) AS BIGINT) = c.cx
    ),
    hit AS (
      SELECT site_id, event_id,
             ROUND(2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(slat - plat) / 2), 2)
               + cos(radians(plat)) * cos(radians(slat))
                 * pow(sin(radians(slon - plon) / 2), 2)
             )), 4) AS d
      FROM cand
    )
    SELECT site_id,
           CAST(COUNT(*) AS BIGINT)                   AS n_within,
           CAST(SUM(CAST(FLOOR(d * 1000) AS BIGINT)) AS BIGINT)
                                                      AS dist_m_sum
    FROM hit WHERE d <= {_RADIUS_KM}
    GROUP BY site_id
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-within-radius spatial join: pings within 100 km of each
    site. The naive form is a cross join with a haversine theta — a
    BroadcastNestedLoopJoin that dies when neither side fits. The
    engine buckets both sides to 1° grid cells (~111 km, chosen ≥ the
    radius so a 3×3 neighborhood is a complete candidate cover),
    explodes the SMALL side (sites) onto its 9 neighbor cells,
    equi-joins on the cell — Catalyst broadcasts the 9×|sites| table —
    and applies the exact haversine residual to candidates only. Same
    bucket-equi-join-residual discipline as `join_interval_overlap`;
    at planetary scale swap 1° cells for geohash/S2 levels, same plan.

    Distances round before both the radius compare and the integer
    mass sum (the `geo_haversine` ulp discipline); coordinates are
    synthesized inside ±40/±150 so cells never straddle the poles or
    the antimeridian (real deployments wrap cx modulo 360)."""
    n = table(spark, sf_dir, "nation")
    e = table(spark, sf_dir, "events")
    sites = n.select(
        F.col("n_nationkey").alias("site_id"),
        (-40.0 + (F.col("n_nationkey") * 7.0) % 80 + 0.5).alias("slat"),
        (-150.0 + (F.col("n_nationkey") * 13.0) % 300 + 0.5).alias("slon"),
    )
    pings = e.select(
        "event_id",
        (-40.0 + (F.col("user_id") % 800) / 10.0 + 0.05).alias("plat"),
        (
            -150.0 + ((F.col("user_id") * 7 + F.col("event_id")) % 3000) / 10.0
            + 0.05
        ).alias("plon"),
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    cells = (
        sites.withColumn("dy", off)
        .withColumn("dx", off)
        .select(
            "site_id", "slat", "slon",
            (F.floor("slat").cast("bigint") + F.col("dy")).alias("cy"),
            (F.floor("slon").cast("bigint") + F.col("dx")).alias("cx"),
        )
    )
    cand = cells.join(
        pings,
        (F.floor(F.col("plat")).cast("bigint") == F.col("cy"))
        & (F.floor(F.col("plon")).cast("bigint") == F.col("cx")),
    )
    plat, slat = F.col("plat"), F.col("slat")
    h = (
        F.pow(F.sin(F.radians(slat - plat) / 2), 2)
        + F.cos(F.radians(plat))
        * F.cos(F.radians(slat))
        * F.pow(F.sin(F.radians(F.col("slon") - F.col("plon")) / 2), 2)
    )
    hit = cand.select(
        "site_id",
        "event_id",
        F.round(2 * 6371.0088 * F.asin(F.sqrt(h)), 4).alias("d"),
    )
    return (
        hit.filter(F.col("d") <= _RADIUS_KM)
        .groupBy("site_id")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.sum(F.floor(F.col("d") * 1000).cast("bigint")).alias("dist_m_sum"),
        )
    )


@register(
    "events_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT *,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS p1,
             LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS p7
      FROM daily
    ),
    ev AS (
      SELECT event_type, n, p1, p7 FROM lagged
      WHERE p1 IS NOT NULL AND p7 IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)            AS n_eval,
           CAST(SUM(ABS(n - p1)) AS BIGINT)    AS abs_err_naive,
           CAST(SUM(ABS(n - p7)) AS BIGINT)    AS abs_err_snaive,
           CAST(SUM((ABS(n - p1) * 10000) // n) AS BIGINT)
                                               AS mape_naive_e4_sum,
           CAST(SUM((ABS(n - p7) * 10000) // n) AS BIGINT)
                                               AS mape_snaive_e4_sum
    FROM ev GROUP BY event_type
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the two canonical baseline
    forecasters on per-type daily volumes: naive (yesterday's value)
    vs seasonal-naive (same weekday last week). Every forecasting
    model — including `ts_holt_winters` — is judged against these
    baselines; a model that can't beat seasonal-naive on MAE/MAPE is
    noise. Evaluation is the standard rolling origin: each day is
    predicted from strictly prior data only (the `features_pit_join`
    leakage discipline applied to time).

    Corpus-sized work is the ONE (type, day) aggregation; both lag
    forecasts ride a single per-type sort window on the tiny day
    table; errors accumulate as exact integers (per-day MAPE terms via
    integer DIV) — no float summation anywhere."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    ev = (
        daily.withColumn("p1", F.lag("n", 1).over(w))
        .withColumn("p7", F.lag("n", 7).over(w))
        .filter(F.col("p1").isNotNull() & F.col("p7").isNotNull())
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("n") - F.col("p1"))).alias("abs_err_naive"),
        F.sum(F.abs(F.col("n") - F.col("p7"))).alias("abs_err_snaive"),
        F.sum(
            F.expr("(ABS(n - p1) * 10000) DIV n")
        ).alias("mape_naive_e4_sum"),
        F.sum(
            F.expr("(ABS(n - p7) * 10000) DIV n")
        ).alias("mape_snaive_e4_sum"),
    )


@register("agg_hll_intersection")  # rows-only: sketch estimates are
# implementation-defined; the ≤5%-of-exact contract is pinned in tests
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set intersection from mergeable sketches by
    inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where A/B
    are the user populations of two event types. Completes the sketch
    algebra story: `agg_hll_sketch_merge` holds unions,
    `agg_hll_sliding_union` reuses daily sketches across windows, and
    this derives the one operation HLL cannot answer directly — at
    100 TB, audience-overlap questions (saw-X ∩ bought-Y) run on
    KB-sized stored sketches instead of two corpus scans + a join.

    One pass builds BOTH cohort sketches (conditional sketch aggs in
    a single aggregate); the union merges the same two states — the
    corpus is touched once. The demo cohorts are id-arithmetic
    segments engineered to overlap by ~1/3 (the fixture's users are
    uniformly active, so behavioral cohorts like saw-X/bought-Y
    degenerate to identical sets — a cohort DEFINITION stand-in, not a
    mechanism change). Error compounds through subtraction (three
    ±1.6% estimates), so the pinned contract is 5% of the EXACT
    intersection, computed alongside for the demo."""
    e = table(spark, sf_dir, "events")
    seg = F.col("user_id") % 3  # cohort A: seg != 2; cohort B: seg != 0
    ab = e.select(
        "user_id",
        F.when(seg != 2, F.col("user_id")).alias("a_u"),
        F.when(seg != 0, F.col("user_id")).alias("b_u"),
    )
    sk = ab.agg(
        F.hll_sketch_agg("a_u").alias("ska"),
        F.hll_sketch_agg("b_u").alias("skb"),
    ).select(
        F.hll_sketch_estimate("ska").cast("bigint").alias("est_a"),
        F.hll_sketch_estimate("skb").cast("bigint").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("ska", "skb")
        ).cast("bigint").alias("est_union"),
    )
    exact = (
        e.filter(F.col("user_id") % 3 == 1)  # the A∩B stratum
        .agg(F.count_distinct("user_id").alias("exact_both"))
    )
    return sk.crossJoin(exact).select(  # 1-row × 1-row
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersection"
        ),
        "exact_both",
    )


@register(
    "sample_group_shuffle_split",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             (user_id * {_MULT}) % 4294967296 % 10 AS bucket
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT *,
             CASE WHEN bucket < 8 THEN 'train'
                  WHEN bucket = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM u
    ),
    naive AS (  -- what a ROW-level split would do: users whose events
                -- hash into >1 split are leaked entities
      SELECT COUNT(*) AS n_leaky FROM (
        SELECT user_id
        FROM (
          SELECT user_id,
                 (event_id * {_MULT}) % 4294967296 % 10 AS eb
          FROM events
        )
        GROUP BY user_id
        HAVING COUNT(DISTINCT CASE WHEN eb < 8 THEN 0
                                   WHEN eb = 8 THEN 1 ELSE 2 END) > 1
      )
    )
    SELECT t.split,
           CAST(COUNT(*) AS BIGINT)        AS n_users,
           CAST(SUM(t.n_events) AS BIGINT) AS n_events,
           CAST(n.n_leaky AS BIGINT)       AS naive_leaky_users
    FROM tagged t, naive n
    GROUP BY t.split, n.n_leaky
    """,
)
def sample_group_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-grouped 80/10/10 train/val/test split: the split is a
    pure function of the USER hash, so every event of a user lands in
    exactly one split — the leakage-safe protocol for behavioral data
    (GroupShuffleSplit semantics [P]; `sample_train_split` is the
    row-level form for independent documents). The report also counts
    how many users a ROW-level hash split would have scattered across
    splits — the leaked-entity count that silently inflates validation
    scores.

    One user-keyed agg (split assignment rides it row-locally), one
    bounded rollup; the naive-leakage audit is a second agg on the
    same user key. Reproducible by construction: membership is
    arithmetic on ids, no RNG state."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    bucket = (F.col("user_id") * _MULT) % 4294967296 % 10
    tagged = u.withColumn(
        "split",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test"),
    )
    eb = (F.col("event_id") * _MULT) % 4294967296 % 10
    naive = (
        e.select(
            "user_id",
            F.when(eb < 8, 0).when(eb == 8, 1).otherwise(2).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.count_distinct("s").alias("k"))
        .agg(F.count_if(F.col("k") > 1).alias("n_leaky"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
        .crossJoin(F.broadcast(naive))  # 3 rows × 1 row
        .withColumnRenamed("n_leaky", "naive_leaky_users")
    )


_VOCAB_K = 100


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH words AS (
      SELECT d.source, w AS word
      FROM documents d,
           LATERAL (SELECT unnest(string_split_regex(lower(d.text),
                                                     '[^a-z0-9]+')) AS w) t
      WHERE w <> ''
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word)
               AS rnk
        FROM words GROUP BY word
      ) WHERE rnk <= {_VOCAB_K}
    ),
    scored AS (
      SELECT w.source,
             CASE WHEN v.word IS NOT NULL THEN 1
                  ELSE length(w.word) END AS n_tok,
             CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
      FROM words w LEFT JOIN vocab v ON w.word = v.word
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)      AS n_words,
           CAST(SUM(n_tok) AS BIGINT)    AS n_tokens,
           CAST(SUM(oov) AS BIGINT)      AS n_oov_words,
           CAST(SUM(n_tok) * 10000 // COUNT(*) AS BIGINT)
                                         AS tokens_per_word_e4
    FROM scored GROUP BY source
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-economics report: price a top-K word vocabulary with
    byte/char fallback against each corpus source — in-vocab words
    cost 1 token, OOV words fall back to one token per character (the
    worst-case fallback every real tokenizer bounds). tokens/word per
    source is THE number that decides vocab size and flags sources
    (code, non-Latin, noisy OCR) that will blow the token budget;
    `tokenizer_bpe_apply` then prices actual sub-word merges for the
    tail this report exposes.

    The vocab is derived IN-QUERY (top-K by corpus frequency, ties by
    word — fully deterministic, so the oracle derives the identical
    vocab): one word-frequency agg, then ``orderBy().limit(K)`` so
    Catalyst plans TakeOrderedAndProject — per-partition top-K merged
    on the driver, never a global sort of the distinct-word table
    (which grows with the corpus, Heaps' law); the K-row vocab
    broadcasts back into the word stream join; one per-source rollup.
    Integer token accounting throughout."""
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "source",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(_VOCAB_K)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    scored = words.join(F.broadcast(vocab), "word", "left").select(
        "source",
        F.when(F.col("in_vocab").isNotNull(), 1)
        .otherwise(F.length("word"))
        .alias("n_tok"),
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("oov").alias("n_oov_words"),
        F.expr("CAST(SUM(n_tok) * 10000 DIV COUNT(*) AS BIGINT)").alias(
            "tokens_per_word_e4"
        ),
    )
