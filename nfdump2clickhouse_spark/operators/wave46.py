"""Wave-46 keys (round 5): send-time optimization, portmanteau
testing, long-memory estimation, overlap duration, paired binary
testing.

- ``events_best_send_hour``: per-user modal activity hour and its
  population distribution [P — the CRM send-time-optimization
  primitive].
- ``stats_ljung_box``: Ljung–Box portmanteau test on daily revenue
  [P — Ljung & Box 1978; the 'is there ANY autocorrelation left?'
  residual diagnostic].
- ``agg_hurst_exponent``: rescaled-range (R/S) Hurst exponent
  [P — Hurst 1951; H>0.5 = long memory/trending, H<0.5 = mean
  reversion].
- ``join_interval_overlap_duration``: duration-weighted interval
  overlap [P — the SLA/billing variant of the overlap join: not how
  many intervals intersect, but for HOW LONG].
- ``stats_mcnemar``: McNemar's test on paired binary outcomes
  [P — McNemar 1947; the same-subjects before/after comparison].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# events_best_send_hour
# ---------------------------------------------------------------------------


@register(
    "events_best_send_hour",
    oracle="""
    WITH uh AS (
      SELECT user_id, EXTRACT(hour FROM ts) AS hour, COUNT(*) AS c
      FROM events GROUP BY user_id, hour
    ),
    best AS (
      SELECT user_id, hour, c,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY c DESC, hour) AS rn
      FROM uh
    )
    SELECT CAST(hour AS INT) AS best_hour,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(c), 4) AS mean_events_at_best
    FROM best WHERE rn = 1
    GROUP BY hour ORDER BY best_hour
    """,
)
def events_best_send_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Send-time optimization: each user's MODAL activity hour
    (count argmax, earliest-hour tiebreak) and how the user base
    distributes over those best hours — the CRM primitive behind
    'notify each user when THEY are active' instead of one global
    blast hour; the per-user personalization of what
    `events_heatmap_hour_dow` shows in aggregate.

    One (user, hour) rollup, a per-user argmax window on the ≤24-row
    user partitions (literal rn=1 bound → WindowGroupLimit), then a
    ≤24-group summary."""
    uh = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.hour("ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), "hour")
    best = uh.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.groupBy(F.col("hour").cast("int").alias("best_hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg("c"), 4).alias("mean_events_at_best"),
        )
        .orderBy("best_hour")
    )


# ---------------------------------------------------------------------------
# stats_ljung_box
# ---------------------------------------------------------------------------


@register(
    "stats_ljung_box",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM daily_src GROUP BY 1
    ),
    mu AS (SELECT COUNT(*) AS n, AVG(rev) AS m FROM daily),
    lagged AS (
      SELECT rev,
             LAG(rev, 1) OVER (ORDER BY day) AS l1,
             LAG(rev, 2) OVER (ORDER BY day) AS l2,
             LAG(rev, 3) OVER (ORDER BY day) AS l3,
             LAG(rev, 4) OVER (ORDER BY day) AS l4,
             LAG(rev, 5) OVER (ORDER BY day) AS l5
      FROM daily
    ),
    acf AS (
      SELECT mu.n,
             SUM((l.rev - mu.m) * (l.rev - mu.m)) AS s0,
             SUM((l.rev - mu.m) * (l.l1 - mu.m)) AS s1,
             SUM((l.rev - mu.m) * (l.l2 - mu.m)) AS s2,
             SUM((l.rev - mu.m) * (l.l3 - mu.m)) AS s3,
             SUM((l.rev - mu.m) * (l.l4 - mu.m)) AS s4,
             SUM((l.rev - mu.m) * (l.l5 - mu.m)) AS s5
      FROM lagged l CROSS JOIN mu
      GROUP BY mu.n
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(s1 / s0, 4) + 0 AS rho1,
           ROUND(n * (n + 2.0) * (POW(s1 / s0, 2) / (n - 1)
                 + POW(s2 / s0, 2) / (n - 2)
                 + POW(s3 / s0, 2) / (n - 3)
                 + POW(s4 / s0, 2) / (n - 4)
                 + POW(s5 / s0, 2) / (n - 5)), 4) AS lb_stat,
           CAST(5 AS BIGINT) AS df
    FROM acf
    """.replace("daily_src", "events"),
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test at lags 1–5 on daily revenue:
    Q = n(n+2)·Σ ρ²_k/(n−k) ~ χ²(5) under 'no autocorrelation at ANY
    of these lags' — the omnibus diagnostic run on forecast residuals
    (`ts_holt_winters`, `events_forecast_backtest`) where `ts_autocorr`
    eyeballs one lag at a time and `stats_runs_test` only sees signs.

    ACF numerators for all five lags assemble in ONE aggregate over
    the lag-projected day table (the NULL rows that lag-k loses drop
    out of s_k exactly as the estimator requires); the mean rides a
    1-row cross join; the day table is bounded so every step after the
    day-grain aggregate is trivial. Same-denominator s0 (the standard
    ACF estimator) keeps both engines on identical float paths."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .localCheckpoint()  # mean pass + lag pass share one compute
    )
    mu = daily.agg(F.count(F.lit(1)).alias("n"), F.avg("rev").alias("m"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev", *[F.lag("rev", k).over(w).alias(f"l{k}") for k in range(1, 6)]
    )
    l = lagged.crossJoin(F.broadcast(mu))
    m = F.col("m")
    acf = l.groupBy("n").agg(
        F.sum((F.col("rev") - m) * (F.col("rev") - m)).alias("s0"),
        *[
            F.sum((F.col("rev") - m) * (F.col(f"l{k}") - m)).alias(f"s{k}")
            for k in range(1, 6)
        ],
    )
    n = F.col("n")
    q = (
        n
        * (n + 2.0)
        * sum(
            F.pow(F.col(f"s{k}") / F.col("s0"), 2) / (n - k) for k in range(1, 6)
        )
    )
    return acf.select(
        n.cast("bigint").alias("n_days"),
        (F.round(F.col("s1") / F.col("s0"), 4) + F.lit(0)).alias("rho1"),
        F.round(q, 4).alias("lb_stat"),
        F.lit(5).cast("bigint").alias("df"),
    )


# ---------------------------------------------------------------------------
# agg_hurst_exponent
# ---------------------------------------------------------------------------


@register(
    "agg_hurst_exponent",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev,
             ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    sizes(sz) AS (VALUES (5), (10), (15)),
    chunked AS (
      SELECT sizes.sz, daily.i // sizes.sz AS chunk, daily.i, daily.rev
      FROM daily CROSS JOIN sizes
    ),
    stats AS (
      -- HUGEINT squares: daily cents grow with corpus volume and the
      -- BIGINT product overflows ~32x beyond sf0.1 (r9 scale probe);
      -- exact wide-integer sums, one double conversion at the division
      -- (the stats_anova_f discipline)
      SELECT sz, chunk, COUNT(*) AS n, AVG(rev) AS mu,
             SQRT((SUM(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT))
                   - CAST(SUM(rev) AS HUGEINT) * CAST(SUM(rev) AS HUGEINT)
                     * 1.0 / COUNT(*))
                  / COUNT(*)) AS s
      FROM chunked GROUP BY sz, chunk
    ),
    dev AS (
      SELECT c.sz, c.chunk,
             SUM(c.rev - st.mu)
               OVER (PARTITION BY c.sz, c.chunk ORDER BY c.i) AS cumdev,
             st.n, st.s
      FROM chunked c JOIN stats st ON c.sz = st.sz AND c.chunk = st.chunk
    ),
    rs AS (
      SELECT sz, chunk, MAX(n) AS n, MAX(s) AS s,
             MAX(cumdev) - MIN(cumdev) AS r
      FROM dev GROUP BY sz, chunk
    ),
    valid AS (
      SELECT sz, AVG(r / s) AS mean_rs, COUNT(*) AS n_chunks
      FROM rs WHERE n = sz AND s > 0 GROUP BY sz
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           ROUND(regr_slope(LN(mean_rs), LN(CAST(sz AS DOUBLE))), 4)
             AS hurst,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks_used
    FROM valid
    """,
)
def agg_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range Hurst exponent of daily revenue: split the series
    into chunks of 5/10/15 days, compute each chunk's rescaled range
    R/S (range of cumulative mean-deviations over the population SD),
    and H is the log-log slope of mean(R/S) against chunk size —
    H ≈ 0.5 is a random walk, H > 0.5 long memory (trends persist),
    H < 0.5 mean reversion. The long-memory diagnostic that says
    whether `ts_holt_winters`-class models should even try.

    Everything after the one day-grain aggregate runs on the bounded
    day table: chunking is integer division on the day index, the
    cumulative deviation is a per-(size, chunk) window, and the final
    regression is `regr_slope` over ≤3 points. Incomplete tail chunks
    and zero-variance chunks are excluded identically on both
    engines."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .withColumn("i", F.row_number().over(Window.orderBy("day")) - 1)
        .localCheckpoint()  # chunk passes + n_days share one compute
    )
    n_days = daily.count()
    sizes = spark.createDataFrame([(5,), (10,), (15,)], "sz int")
    chunked = daily.crossJoin(F.broadcast(sizes)).select(
        "sz", (F.col("i") / F.col("sz")).cast("int").alias("chunk"), "i", "rev"
    )
    # decimal(19,0) squares (exact in decimal38): daily cents grow with
    # corpus volume and the BIGINT product overflows ~32x beyond sf0.1
    # (r9 scale probe, ARITHMETIC_OVERFLOW under ANSI); exact integer
    # sums until the one double conversion at the division — the
    # stats_anova_f discipline, mirrored HUGEINT-side in the oracle
    r19 = F.col("rev").cast("decimal(19,0)")
    stats = chunked.groupBy("sz", "chunk").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rev").alias("mu"),
        F.sqrt(
            (F.sum(r19 * r19)
             - F.sum("rev").cast("decimal(19,0)")
               * F.sum("rev").cast("decimal(19,0)")
               * 1.0
               / F.count(F.lit(1)))
            / F.count(F.lit(1))
        ).alias("s"),
    )
    dev = chunked.join(stats, ["sz", "chunk"]).withColumn(
        "cumdev",
        F.sum(F.col("rev") - F.col("mu")).over(
            Window.partitionBy("sz", "chunk").orderBy("i")
        ),
    )
    rs = dev.groupBy("sz", "chunk").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        (F.max("cumdev") - F.min("cumdev")).alias("r"),
    )
    valid = (
        rs.filter((F.col("n") == F.col("sz")) & (F.col("s") > 0))
        .groupBy("sz")
        .agg(
            F.avg(F.col("r") / F.col("s")).alias("mean_rs"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )
    return valid.agg(
        F.lit(n_days).cast("bigint").alias("n_days"),
        F.round(
            F.regr_slope(F.log("mean_rs"), F.log(F.col("sz").cast("double"))), 4
        ).alias("hurst"),
        F.sum("n_chunks").cast("bigint").alias("n_chunks_used"),
    )


# ---------------------------------------------------------------------------
# join_interval_overlap_duration
# ---------------------------------------------------------------------------


@register(
    "join_interval_overlap_duration",
    oracle="""
    WITH sess AS (  -- user activity intervals: first to last event per day
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
      FROM events GROUP BY user_id, CAST(ts AS DATE)
      HAVING MIN(epoch_us(ts)) < MAX(epoch_us(ts))
    ),
    windows AS (  -- maintenance windows: hours 3-5 and 14-16 daily
      SELECT DISTINCT day,
             epoch_us(CAST(day AS TIMESTAMP)) + h * 3600e6 AS w0,
             epoch_us(CAST(day AS TIMESTAMP)) + (h + 2) * 3600e6 AS w1
      FROM sess, (SELECT UNNEST([3, 14]) AS h) AS hh
    ),
    ovl AS (
      SELECT s.user_id, s.day,
             GREATEST(0, LEAST(s.t1, w.w1) - GREATEST(s.t0, w.w0))
               AS ov_us
      FROM sess s JOIN windows w ON s.day = w.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(count_if(ov_us > 0) AS BIGINT) AS n_overlapping,
           ROUND(SUM(ov_us) / 3600e6, 4) AS overlap_hours
    FROM ovl GROUP BY day ORDER BY day
    """,
)
def join_interval_overlap_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted interval overlap: user activity spans (first→
    last event per day) against two fixed daily maintenance windows
    (03–05h, 14–16h), reporting per day how many user-spans intersect
    a window and the TOTAL overlap hours — the SLA/billing variant of
    `join_interval_overlap`, which counts intersections but can't say
    'users were exposed to maintenance for 41.2 hours'.

    Overlap length is the closed form max(0, min(end)−max(start)) —
    scan-local integer-µs arithmetic inside the join (no
    event-at-a-time expansion); the join keys on `day`, so it's an
    equi-join whose per-day windows are a 2-row broadcast side.
    Degenerate (single-event) spans are excluded identically by the
    HAVING on both engines."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"), F.unix_micros("ts").alias("t")
    )
    sess = (
        ev.groupBy("user_id", "day")
        .agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
        .filter(F.col("t0") < F.col("t1"))
        .localCheckpoint()  # the day grid derives from the same compute
    )
    hours = spark.createDataFrame([(3,), (14,)], "h int")
    days = sess.select("day").distinct()
    windows = days.crossJoin(F.broadcast(hours)).select(
        "day",
        (
            F.unix_micros(F.col("day").cast("timestamp"))
            + F.col("h").cast("bigint") * F.lit(3600000000)
        ).alias("w0"),
        (
            F.unix_micros(F.col("day").cast("timestamp"))
            + (F.col("h") + 2).cast("bigint") * F.lit(3600000000)
        ).alias("w1"),
    )
    ov = sess.join(F.broadcast(windows), "day").select(
        "day",
        F.greatest(
            F.lit(0),
            F.least(F.col("t1"), F.col("w1")) - F.greatest(F.col("t0"), F.col("w0")),
        ).alias("ov_us"),
    )
    return (
        ov.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.count_if(F.col("ov_us") > 0).cast("bigint").alias("n_overlapping"),
            F.round(F.sum("ov_us") / F.lit(3600e6), 4).alias("overlap_hours"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# stats_mcnemar
# ---------------------------------------------------------------------------


@register(
    "stats_mcnemar",
    oracle="""
    WITH halves AS (
      SELECT user_id,
             count_if(event_type = 'purchase'
                      AND event_id % 2 = 0) > 0 AS buy_a,
             count_if(event_type = 'purchase'
                      AND event_id % 2 = 1) > 0 AS buy_b
      FROM events GROUP BY user_id
    ),
    cells AS (
      -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
      SELECT COALESCE(count_if(buy_a AND buy_b), 0) AS both_,
             COALESCE(count_if(buy_a AND NOT buy_b), 0) AS only_a,
             COALESCE(count_if(NOT buy_a AND buy_b), 0) AS only_b,
             COALESCE(count_if(NOT buy_a AND NOT buy_b), 0) AS neither,
             COUNT(*) AS n
      FROM halves
    )
    SELECT CAST(n AS BIGINT) AS n_subjects,
           CAST(both_ AS BIGINT) AS both_halves,
           CAST(only_a AS BIGINT) AS only_a,
           CAST(only_b AS BIGINT) AS only_b,
           CAST(neither AS BIGINT) AS neither,
           ROUND(CASE WHEN only_a + only_b = 0 THEN 0
                 ELSE POW(ABS(only_a - only_b) - 1, 2)
                      / (only_a + only_b) END, 4) AS mcnemar_chi2
    FROM cells
    """,
)
def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired binary outcomes: did each user purchase
    under condition A (even event_ids) vs condition B (odd)? Only the
    DISCORDANT cells matter — χ² = (|b−c|−1)²/(b+c) with continuity
    correction, df=1 — the paired-binary member of the test family
    (`stats_wilcoxon_signed_rank` is its continuous sibling; the
    unpaired χ² is `stats_g_test`/`stats_chi2_srm`). The 2×2 paired
    table is reported in full so the discordant asymmetry is visible,
    not just the statistic.

    One user-keyed conditional rollup + a 1-row cell count —
    all-integer until the single final division."""
    halves = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.count_if(
                    (F.col("event_type") == "purchase")
                    & (F.col("event_id") % 2 == 0)
                )
                > 0
            ).alias("buy_a"),
            (
                F.count_if(
                    (F.col("event_type") == "purchase")
                    & (F.col("event_id") % 2 == 1)
                )
                > 0
            ).alias("buy_b"),
        )
    )
    a, b = F.col("buy_a"), F.col("buy_b")
    cells = halves.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(a & b).alias("both_"),
        F.count_if(a & ~b).alias("only_a"),
        F.count_if(~a & b).alias("only_b"),
        F.count_if(~a & ~b).alias("neither"),
    )
    oa, ob = F.col("only_a"), F.col("only_b")
    return cells.select(
        F.col("n").cast("bigint").alias("n_subjects"),
        F.col("both_").cast("bigint").alias("both_halves"),
        oa.cast("bigint").alias("only_a"),
        ob.cast("bigint").alias("only_b"),
        F.col("neither").cast("bigint").alias("neither"),
        F.round(
            F.when(oa + ob == 0, F.lit(0.0)).otherwise(
                F.pow(F.abs(oa - ob) - 1, 2) / (oa + ob)
            ),
            4,
        ).alias("mcnemar_chi2"),
    )
