"""Wave-48 keys (round 5): robust location & slope, systematic
sampling, trimmed means, dose-response.

- ``stats_hodges_lehmann``: Hodges–Lehmann pseudo-median (median of
  pairwise means) [P — Hodges & Lehmann 1963; the estimator behind the
  Wilcoxon test's confidence interval].
- ``sample_systematic``: systematic (every k-th) sampling with a
  deterministic start [P — survey design's cheapest spread-out
  sample].
- ``agg_trimmed_mean``: exact 10% trimmed mean per group
  [P — the drop-the-tails sibling of `agg_winsorized_mean`'s
  clamp-the-tails].
- ``ts_theil_sen``: Theil–Sen robust trend slope (median of pairwise
  slopes) [P — Theil 1950, Sen 1968; the slope estimator that pairs
  with `ts_mann_kendall`'s trend verdict].
- ``events_dose_response``: conversion rate by activity-exposure
  decile [P — the dose-response curve of engagement analytics].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_hodges_lehmann
# ---------------------------------------------------------------------------


@register(
    "stats_hodges_lehmann",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT (a.rev + b.rev) / 2.0 AS walsh
      FROM daily a JOIN daily b ON a.day <= b.day
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_walsh,
           ROUND(quantile_cont(walsh, 0.5) / 100.0, 4) AS hl_estimate,
           ROUND((SELECT AVG(rev) FROM daily) / 100.0, 4) AS plain_mean,
           ROUND((SELECT quantile_cont(rev, 0.5) FROM daily) / 100.0, 4)
             AS plain_median
    FROM pairs
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann pseudo-median of daily revenue: the median of
    all Walsh averages (xᵢ+xⱼ)/2 over i ≤ j — more efficient than the
    median under near-symmetric noise, still 29%-breakdown robust
    where the mean has none; it is THE point estimate that accompanies
    a Wilcoxon interval (`stats_wilcoxon_signed_rank`). Mean and
    median reported alongside — the three disagreeing is itself the
    skew/outlier signal.

    Walsh averages are a self-join of the BOUNDED daily table
    (n(n+1)/2 pairs of one-row-per-day — ~66k pairs even for a year);
    the corpus-sized work is the one day-grain integer aggregate; the
    final percentile is exact over the pair table."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .localCheckpoint()  # pair sides + scalars share one compute
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("rev").alias("mean_c"),
        F.expr("percentile(rev, 0.5)").alias("med_c"),
    ).collect()[0]
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("da") <= F.col("db")).select(
        ((F.col("ra") + F.col("rb")) / 2.0).alias("walsh")
    )
    return pairs.agg(
        F.lit(stats["n_days"]).cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_walsh"),
        F.round(F.expr("percentile(walsh, 0.5)") / 100.0, 4).alias("hl_estimate"),
        F.round(F.lit(stats["mean_c"]) / 100.0, 4).alias("plain_mean"),
        F.round(F.lit(stats["med_c"]) / 100.0, 4).alias("plain_median"),
    )


# ---------------------------------------------------------------------------
# sample_systematic
# ---------------------------------------------------------------------------


@register(
    "sample_systematic",
    oracle="""
    WITH r AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    ),
    picked AS (
      SELECT * FROM r WHERE (rn - 1) % 100 = 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           ROUND(AVG(o_totalprice), 4) AS sample_mean,
           ROUND((SELECT AVG(o_totalprice) FROM orders), 4) AS pop_mean
    FROM picked
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-100 sampling: order by key, take every 100th row
    starting at offset 7 (the deterministic 'random start') — survey
    design's cheapest evenly-spread sample, unbiased when the frame
    order is unrelated to the measure, PERIODICALLY BIASED when it
    isn't (the caveat every textbook prints). Sample mean reported
    against the population mean; the id checksum pins exact
    membership. Completes the design-sampling family: simple
    (`sample_hash_bucket`), stratified, PPS, balanced, reservoir,
    systematic.

    The row numbering runs through
    `functions.distributed.binned_global_rank` (VERDICT r5 wrong-#1:
    the draft used a single unpartitioned window; r12, VERDICT r11
    next-#4: the sampler machinery's repartitionByRange sample +
    localCheckpoint + count collect collapses to ONE executed job —
    bin-id literals from the parquet-footer [min,max] of o_orderkey,
    offsets from the bounded nbins-row window + broadcast join) — with
    bounded per-task work at any scale. Selection arithmetic is
    integer modulo; the population mean is a sibling 1-row aggregate
    that now rides a broadcast cross-join instead of a driver
    collect."""
    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_global_rank

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    pop = o.agg(F.avg("o_totalprice").alias("_pm"))
    stats = parquet_column_stats(sf_dir, "orders", "o_orderkey")
    lo = hi = None  # stats-less footer: in-plan broadcast bounds
    if stats is not None and stats[0] is not None and stats[1] is not None:
        lo, hi = stats[0], stats[1]
    r = binned_global_rank(o, "o_orderkey", [], rank_col="rn", lo=lo, hi=hi)
    picked = r.filter((F.col("rn") - 1) % 100 == 7)
    return (
        picked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
            F.round(F.avg("o_totalprice"), 4).alias("sample_mean"),
        )
        .join(F.broadcast(pop))
        .select(
            "n_sampled",
            "key_checksum",
            "sample_mean",
            F.round(F.col("_pm"), 4).alias("pop_mean"),
        )
    )


# ---------------------------------------------------------------------------
# agg_trimmed_mean
# ---------------------------------------------------------------------------


@register(
    "agg_trimmed_mean",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.1) AS lo,
             quantile_cont(value, 0.9) AS hi,
             AVG(value) AS plain
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    t AS (
      SELECT e.event_type, e.value, b.plain
      FROM events e JOIN b USING (event_type)
      WHERE e.value IS NOT NULL AND e.value >= b.lo AND e.value <= b.hi
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(AVG(value), 4) AS trimmed_mean,
           ROUND(MAX(plain), 4) AS plain_mean
    FROM t GROUP BY event_type ORDER BY event_type
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean per event type: DROP values outside
    the exact [p10, p90] band and average the rest — the
    discard-the-tails sibling of `agg_winsorized_mean` (which CLAMPS
    them); trimming is the right call when tail values are suspected
    garbage, winsorizing when they are real but extreme. Plain mean
    alongside: the gap is the tail influence.

    The fit/transform split (`features_scaling` shape): one exact-
    percentile aggregate (k rows) broadcasts the band back onto the
    scan; quantile-boundary values stay IN (>=/<=) identically on both
    engines."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.1)").alias("lo"),
        F.expr("percentile(value, 0.9)").alias("hi"),
        F.avg("value").alias("plain"),
    )
    t = ev.join(F.broadcast(b), "event_type").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(F.avg("value"), 4).alias("trimmed_mean"),
            F.round(F.max("plain"), 4).alias("plain_mean"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ts_theil_sen
# ---------------------------------------------------------------------------


@register(
    "ts_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev,
             ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS i
      FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
    ),
    slopes AS (
      SELECT (b.rev - a.rev) * 1.0 / (b.i - a.i) AS slope
      FROM daily a JOIN daily b ON a.i < b.i
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_slopes,
           ROUND(quantile_cont(slope, 0.5) / 100.0, 4) + 0
             AS theil_sen_slope,
           ROUND((SELECT regr_slope(rev * 1.0, i * 1.0) FROM daily)
                 / 100.0, 4) + 0 AS ols_slope
    FROM slopes
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope of daily revenue: the MEDIAN of
    all pairwise slopes (xⱼ−xᵢ)/(j−i) — up to 29% of days can be
    corrupted before the estimate moves, where one bad day owns the
    OLS slope (reported alongside; their gap is the outlier-influence
    signal). The slope companion to `ts_mann_kendall`'s trend verdict:
    MK says WHETHER it trends, Theil–Sen says HOW FAST, robustly.

    Pairwise slopes are a self-join of the BOUNDED checkpointed daily
    table (n(n−1)/2 of one-row-per-day); integer day indices and
    integer cents make each slope a ratio of exact integers; the
    median is an exact percentile over the pair table."""
    daily = (
        table(spark, sf_dir, "events")
        # two-sided gate: dateless events are not series points (r8 nullmix)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .withColumn("i", F.row_number().over(Window.orderBy("day")))
        .localCheckpoint()  # pair sides + OLS sibling share one compute
    )
    n_days = daily.count()
    ols = daily.agg(
        F.regr_slope(F.col("rev") * 1.0, F.col("i").cast("double")).alias("s")
    ).collect()[0]["s"]
    a = daily.select(F.col("i").alias("ia"), F.col("rev").alias("ra"))
    b = daily.select(F.col("i").alias("ib"), F.col("rev").alias("rb"))
    slopes = a.join(b, F.col("ia") < F.col("ib")).select(
        ((F.col("rb") - F.col("ra")) * 1.0 / (F.col("ib") - F.col("ia"))).alias(
            "slope"
        )
    )
    return slopes.agg(
        F.lit(n_days).cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_slopes"),
        (F.round(F.expr("percentile(slope, 0.5)") / 100.0, 4) + F.lit(0)).alias(
            "theil_sen_slope"
        ),
        (F.round(F.lit(ols) / 100.0, 4) + F.lit(0)).alias("ols_slope"),
    )


# ---------------------------------------------------------------------------
# events_dose_response
# ---------------------------------------------------------------------------


@register(
    "events_dose_response",
    oracle="""
    WITH u AS (
      SELECT user_id, COUNT(*) AS n_events,
             count_if(event_type = 'purchase') > 0 AS converted
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT *, NTILE(10) OVER (ORDER BY n_events, user_id) AS decile
      FROM u
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(n_events), 4) AS mean_exposure,
           CAST(count_if(converted) AS BIGINT) AS n_converted,
           CAST(10000 * count_if(converted) // COUNT(*) AS BIGINT)
             AS conversion_bp
    FROM d GROUP BY decile ORDER BY decile
    """,
)
def events_dose_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement dose-response curve: users ranked into activity
    deciles (total events = the 'dose'), conversion rate per decile —
    monotone-increasing response is the correlational backbone of
    every 'engagement drives conversion' claim, and a FLAT curve kills
    it (causality then needs `stats_nn_matching`/`events_cuped_adjust`
    to say more). Exposure and response both from ONE user rollup.

    Decile assignment uses `functions.distributed.binned_exact_ntile`
    (the `ml_eval_lift` discipline: no single-task ntile sort; r12,
    VERDICT r11 next-#4: ONE executed job — n_events is a DERIVED
    dose, so the bin bounds come from the helper's in-plan broadcast
    min/max arm, which shares the user-rollup exchange via
    ReusedExchange); the response table is 10 rows, all-integer bp
    rates."""
    from ..functions.distributed import binned_exact_ntile

    u = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.count_if(F.col("event_type") == "purchase") > 0).alias("converted"),
        )
    )
    d = binned_exact_ntile(u, 10, "n_events", ["user_id"], "decile")
    return (
        d.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg("n_events"), 4).alias("mean_exposure"),
            F.count_if(F.col("converted")).cast("bigint").alias("n_converted"),
            F.expr("10000 * count_if(converted) DIV count(1)")
            .cast("bigint")
            .alias("conversion_bp"),
        )
        .orderBy("decile")
    )
