"""Wave-30 keys (round 5): rank correlation, regression-model eval,
feature scaling, circular time-of-day statistics, Zipf law fit.

- ``stats_spearman_corr``: Spearman rank correlation with proper
  tie handling (average ranks) [P — Spearman 1904; the fractional-rank
  form is the standard tie correction] — the robust complement to the
  Pearson ``stats_corr_matrix``.
- ``ml_eval_regression``: regression-model evaluation (RMSE / MAE /
  R² / MAPE) of a train-split baseline predictor against a held-out
  test split [P — standard regression metrics].
- ``features_scaling``: the three standard feature-scaling recipes
  (min-max, z-score, robust median/IQR) summarized per group
  [P — sklearn's MinMaxScaler / StandardScaler / RobustScaler
  contract], computed as exact one-pass group moments.
- ``agg_circular_stats``: circular mean / resultant length / circular
  variance of event time-of-day [P — Fisher, Statistical Analysis of
  Circular Data 1993] — the correct way to average "what hour do
  errors happen", where the naive mean of 23h and 1h is 12h.
- ``text_zipf_slope``: Zipf's-law exponent per language via log-log
  OLS on the top-100 rank/frequency table [P — Zipf 1949; standard
  corpus-statistics diagnostic for generated-vs-natural text].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_spearman_corr
# ---------------------------------------------------------------------------


@register(
    "stats_spearman_corr",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS grp,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
               AS rq,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
               AS rp
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        AND l_extendedprice IS NOT NULL
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(rq, rp), 4) AS spearman_rho
    FROM r GROUP BY grp ORDER BY grp
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price
    per return flag, with the standard average-rank tie correction:
    fractional rank = min-rank + (ties-1)/2, then Pearson correlation
    of the two rank columns. Monotone-but-nonlinear relationships that
    Pearson understates show up here at full strength.

    `l_returnflag` has THREE values, so a plain
    `Window.partitionBy(grp)` rank funnels a third of the corpus
    through one task each — the 8× scale probe measured that shape at
    7.2 (near data-linear on fixed cores). Ranks therefore come from
    `functions.distributed.binned_grouped_rank` (r12, VERDICT r11
    next-#4: the sampler `grouped_rank` ran a localCheckpoint +
    boundary sample + P·G offset collect per call — 6 serial driver
    jobs for the two ranks; the in-plan binned form is ONE executed
    job, bin-id literals from the parquet-footer [min,max] of each
    rank's leading measure, per-(bin,grp) offsets from a bounded
    window + broadcast join), and
    the average-rank tie correction falls out for free: the MEAN of
    the tied rows' row-numbers IS the fractional rank whatever their
    internal order, computed as one AVG window over (grp, value) —
    a high-cardinality partition key that spreads across the cluster.
    The correlation is the builtin covar_samp/stddev co-moment pair
    divided with try_divide — the builtin `corr` aggregate THROWS under
    ANSI when a rank column is constant (all-tied group), where
    DuckDB's corr returns NULL (r7 edge sweep, const mode)."""
    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_grouped_rank

    # NULL group keys and NULL measurements have no rank: Spark and
    # DuckDB place NULLs at opposite ends of an ASC rank ordering, so
    # every downstream fractional rank would shift — pinned out
    # two-sided (EDGE_SWEEP_r10 class C)
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_returnflag").isNotNull()
            & F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .select(F.col("l_returnflag").alias("grp"), "l_quantity", "l_extendedprice")
    )
    def _bounds(col: str):
        st = parquet_column_stats(sf_dir, "lineitem", col)
        if st is None or st[0] is None or st[1] is None:
            return None, None  # stats-less footer: in-plan bounds
        return st[0], st[1]

    lo_q, hi_q = _bounds("l_quantity")
    lo_p, hi_p = _bounds("l_extendedprice")
    r1 = binned_grouped_rank(li, ["grp"], ["l_quantity"], lo_q, hi_q, "rn_q")
    r2 = binned_grouped_rank(
        r1, ["grp"], ["l_extendedprice"], lo_p, hi_p, "rn_p"
    )
    rq = F.avg("rn_q").over(Window.partitionBy("grp", "l_quantity"))
    rp = F.avg("rn_p").over(Window.partitionBy("grp", "l_extendedprice"))
    ranked = r2.select("grp", rq.alias("rq"), rp.alias("rp"))
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            # corr as try_divide(covar, sx*sy): Spark's builtin corr
            # THROWS under ANSI when either rank column is constant
            # (all-tied values), where DuckDB's corr returns NULL (r7
            # edge sweep const mode); the co-moment form is the same
            # Welford state, divided NULL-tolerantly
            F.round(
                F.try_divide(
                    F.covar_samp("rq", "rp"),
                    F.stddev_samp("rq") * F.stddev_samp("rp"),
                ),
                4,
            ).alias("spearman_rho"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# ml_eval_regression
# ---------------------------------------------------------------------------


@register(
    "ml_eval_regression",
    oracle="""
    WITH train AS (
      SELECT event_type, AVG(value) AS pred
      FROM events WHERE value IS NOT NULL AND value <> 0 AND event_id % 2 = 0
      GROUP BY event_type
    ),
    test AS (
      SELECT e.event_type, e.value AS a, t.pred AS p
      FROM events e JOIN train t USING (event_type)
      WHERE e.value IS NOT NULL AND e.value <> 0 AND e.event_id % 2 = 1
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM((a - p) * (a - p)) AS ss_res,
             SUM(a) AS sa, SUM(a * a) AS saa,
             SUM(ABS(a - p)) AS sad,
             SUM(ABS((a - p) / a)) AS sape
      FROM test GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_test,
           ROUND(SQRT(ss_res / n), 4) AS rmse,
           ROUND(sad / n, 4) AS mae,
           ROUND(1 - ss_res / (saa - sa * sa / n), 4) + 0 AS r2,
           ROUND(100.0 * sape / n, 4) AS mape_pct
    FROM m ORDER BY event_type
    """,
)
def ml_eval_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-metric evaluation of the classic per-group-mean
    baseline: train = even event_ids (per-type mean value), test = odd
    event_ids; report RMSE, MAE, R² (1 - SS_res/SS_tot on the test
    actuals) and MAPE per event_type. The baseline's R² ≈ 0 by
    construction — this key is the METRIC plumbing (the same plumbing
    scores any model's prediction column), exact to the formula.

    All four metrics come from one pass of map-side-combinable sums
    (ss_res, Σ|a-p|, Σa, Σa², Σ|Δ/a|) after a broadcast join of the
    k-row train means — no per-row Python, two exchanges total
    (train agg + test agg; the join is broadcast, plan-pinned).
    Zero-valued targets are excluded (both splits, both engines):
    MAPE is undefined at a = 0 and ANSI mode correctly faults the
    division rather than poisoning the aggregate."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull() & (F.col("value") != 0))
    )
    train = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.avg("value").alias("pred"))
    )
    test = ev.filter(F.col("event_id") % 2 == 1).join(
        F.broadcast(train), "event_type"
    )
    a, p = F.col("value"), F.col("pred")
    m = test.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((a - p) * (a - p)).alias("ss_res"),
        F.sum(a).alias("sa"),
        F.sum(a * a).alias("saa"),
        F.sum(F.abs(a - p)).alias("sad"),
        F.sum(F.abs((a - p) / a)).alias("sape"),
    )
    n = F.col("n")
    return m.select(
        "event_type",
        n.cast("bigint").alias("n_test"),
        F.round(F.sqrt(F.col("ss_res") / n), 4).alias("rmse"),
        F.round(F.col("sad") / n, 4).alias("mae"),
        # "+ 0" canonicalizes -0.0 → 0.0 (SURVEY §8 recipe): the
        # mean-baseline r2 rounds to ±0.0 depending on the engine.
        # try_divide (r9 edge batch): a constant test target (constk)
        # zeroes SS_tot — R² is undefined, DuckDB x/0 is NULL, ANSI threw
        (
            F.round(
                F.lit(1)
                - F.try_divide(
                    F.col("ss_res"),
                    F.col("saa") - F.col("sa") * F.col("sa") / n,
                ),
                4,
            )
            + F.lit(0)
        ).alias("r2"),
        F.round(F.lit(100.0) * F.col("sape") / n, 4).alias("mape_pct"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# features_scaling
# ---------------------------------------------------------------------------


@register(
    "features_scaling",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             MIN(value) AS vmin, MAX(value) AS vmax,
             AVG(value) AS mu, STDDEV_SAMP(value) AS sigma,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.50) AS med,
             quantile_cont(value, 0.75) AS q3
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    sc AS (
      SELECT e.event_type,
             (e.value - s.vmin) / (s.vmax - s.vmin) AS mm,
             ABS((e.value - s.mu) / s.sigma) AS az,
             ABS((e.value - s.med) / (s.q3 - s.q1)) AS ar
      FROM events e JOIN s USING (event_type)
      WHERE e.value IS NOT NULL
    )
    SELECT s.event_type,
           CAST(s.n AS BIGINT) AS n,
           ROUND(s.vmin, 4) AS vmin, ROUND(s.vmax, 4) AS vmax,
           ROUND(s.mu, 4) AS mean, ROUND(s.sigma, 4) AS stddev,
           ROUND(s.med, 4) AS median, ROUND(s.q3 - s.q1, 4) AS iqr,
           ROUND(AVG(sc.mm), 4) AS minmax_mean,
           ROUND(AVG(sc.az), 4) AS z_abs_mean,
           ROUND(AVG(sc.ar), 4) AS robust_abs_mean
    FROM s JOIN sc ON s.event_type = sc.event_type
    GROUP BY s.event_type, s.n, s.vmin, s.vmax, s.mu, s.sigma, s.med, s.q3, s.q1
    ORDER BY s.event_type
    """,
)
def features_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three standard feature-scaling recipes as exact group
    statistics: min-max (MinMaxScaler), z-score (StandardScaler) and
    robust median/IQR (RobustScaler), each summarized by the mean of
    the scaled (absolute, for the centered ones) values so the whole
    transform is hash-checkable without emitting N rows. `percentile`
    is Spark's EXACT linear-interpolation percentile — the same
    definition as DuckDB's `quantile_cont` (the `agg_quantile`
    precedent).

    Two passes over the group: a moments+quantiles aggregate (k rows),
    then the k-row recipe table broadcast back onto the events for the
    scaled-value means — the sklearn fit/transform split, distributed.
    At 100 TB the exact quantile is the expensive term; the
    `agg_percentile_approx` key is the documented sketch alternative."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.50)").alias("med"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    # try_divide throughout: a constant group (range 0, IQR 0, sigma 0)
    # leaves that recipe's scaled mean NULL, matching DuckDB's
    # NULL-on-zero-divisor division (r7 edge sweep — ANSI `/` raised)
    sc = ev.join(F.broadcast(s), "event_type").select(
        "event_type",
        F.try_divide(
            F.col("value") - F.col("vmin"), F.col("vmax") - F.col("vmin")
        ).alias("mm"),
        F.abs(F.try_divide(F.col("value") - F.col("mu"), F.col("sigma"))).alias(
            "az"
        ),
        F.abs(
            F.try_divide(F.col("value") - F.col("med"), F.col("q3") - F.col("q1"))
        ).alias("ar"),
    )
    means = sc.groupBy("event_type").agg(
        F.avg("mm").alias("minmax_mean_raw"),
        F.avg("az").alias("z_abs_mean_raw"),
        F.avg("ar").alias("robust_abs_mean_raw"),
    )
    return (
        s.join(means, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.round("vmin", 4).alias("vmin"),
            F.round("vmax", 4).alias("vmax"),
            F.round("mu", 4).alias("mean"),
            F.round("sigma", 4).alias("stddev"),
            F.round("med", 4).alias("median"),
            F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            F.round("minmax_mean_raw", 4).alias("minmax_mean"),
            F.round("z_abs_mean_raw", 4).alias("z_abs_mean"),
            F.round("robust_abs_mean_raw", 4).alias("robust_abs_mean"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# agg_circular_stats
# ---------------------------------------------------------------------------


@register(
    "agg_circular_stats",
    oracle="""
    WITH a AS (
      SELECT event_type,
             2 * pi() * (EXTRACT(hour FROM ts) * 3600
                         + EXTRACT(minute FROM ts) * 60
                         + EXTRACT(second FROM ts)) / 86400.0 AS theta
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             AVG(SIN(theta)) AS s, AVG(COS(theta)) AS c
      FROM a GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND(SQRT(s * s + c * c), 4) AS resultant_len,
           ROUND(
             (CASE WHEN ATAN2(s, c) < 0 THEN ATAN2(s, c) + 2 * pi()
                   ELSE ATAN2(s, c) END) / (2 * pi()) * 24, 4
           ) AS mean_hour,
           ROUND(1 - SQRT(s * s + c * c), 4) AS circ_variance
    FROM m ORDER BY event_type
    """,
)
def agg_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event time-of-day per event type: map
    each timestamp to an angle θ = 2π·(seconds-into-day)/86400, then
    resultant length R = |mean unit vector|, circular mean hour from
    atan2 of the mean components, and circular variance 1−R. The naive
    arithmetic mean of 23:00 and 01:00 is 12:00; the circular mean is
    00:00 — this operator is how hour-of-day seasonality is averaged
    correctly.

    One map-side-combinable aggregate (avg sin, avg cos) per group —
    a single exchange on `event_type`; sin/cos/atan2 are JVM
    intrinsics inside whole-stage codegen. DuckDB extracts seconds
    with fractional microseconds truncated to match Spark's integer
    `second()` — both engines see identical integer seconds because
    the generator emits whole-second timestamps."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    theta = (
        F.lit(2)
        * F.lit(3.141592653589793)
        * (
            F.hour("ts") * F.lit(3600)
            + F.minute("ts") * F.lit(60)
            + F.second("ts")
        )
        / F.lit(86400.0)
    )
    m = (
        ev.select("event_type", theta.alias("theta"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.sin("theta")).alias("s"),
            F.avg(F.cos("theta")).alias("c"),
        )
    )
    s, c = F.col("s"), F.col("c")
    two_pi = F.lit(2 * 3.141592653589793)
    ang = F.atan2(s, c)
    ang_pos = F.when(ang < 0, ang + two_pi).otherwise(ang)
    r_len = F.sqrt(s * s + c * c)
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(r_len, 4).alias("resultant_len"),
        F.round(ang_pos / two_pi * F.lit(24), 4).alias("mean_hour"),
        F.round(F.lit(1) - r_len, 4).alias("circ_variance"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# text_zipf_slope
# ---------------------------------------------------------------------------


@register(
    "text_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT lang, t.w AS word
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(w)
      WHERE t.w <> ''
    ),
    cnt AS (
      SELECT lang, word, COUNT(*) AS freq FROM tok GROUP BY lang, word
    ),
    vocab AS (SELECT lang, COUNT(*) AS n_vocab FROM cnt GROUP BY lang),
    ranked AS (
      SELECT lang, freq,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY freq DESC, word) AS rnk
      FROM cnt
    ),
    fit AS (
      SELECT lang,
             regr_slope(LN(freq), LN(rnk)) AS slope,
             regr_r2(LN(freq), LN(rnk)) AS r2
      FROM ranked WHERE rnk <= 100 GROUP BY lang
    )
    SELECT v.lang,
           CAST(v.n_vocab AS BIGINT) AS n_vocab,
           ROUND(f.slope, 4) AS zipf_slope,
           ROUND(f.r2, 4) AS fit_r2
    FROM vocab v JOIN fit f USING (lang) ORDER BY v.lang
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: word frequencies from whitespace
    tokens, rank the vocabulary by (freq desc, word) and OLS-fit
    ln(freq) against ln(rank) over the top 100 ranks. Natural text has
    slope ≈ −1 with high R²; a far-off slope is a standard
    generated/degenerate-corpus diagnostic in pre-training curation.

    The (lang, word) count is one map-side-combinable aggregate; the
    top-100-per-lang filter on `row_number` is rewritten by Catalyst
    into WindowGroupLimit (map-side partial top-k — plan-pinned), so
    no lang's full vocabulary is ever sorted on one reducer; the
    regression is Spark's built-in `regr_slope`/`regr_r2` over ≤100·L
    rows; vocabulary size joins in from a sibling aggregate of the
    same counts."""
    tok = (
        table(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    cnt = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("freq"))
    vocab = cnt.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_vocab"))
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), "word")
    ranked = cnt.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 100)
    fit = ranked.groupBy("lang").agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rnk")), 4).alias("fit_r2"),
    )
    return vocab.join(fit, "lang").select(
        "lang", "n_vocab", "zipf_slope", "fit_r2"
    ).orderBy("lang")
