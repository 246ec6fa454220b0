"""Wave-40 keys (round 5): recency weighting, minimal generalization,
Pareto concentration, median-of-means, normality testing.

- ``events_recency_weighted_score``: exponential time-decay engagement
  scoring [P — standard recsys/CRM recency weighting].
- ``privacy_generalization_ladder``: minimal k-anonymous
  generalization level per partition [P — Sweeney 2002's
  generalization hierarchies; pick the COARSEST-necessary, not a fixed
  bucket].
- ``agg_pareto_8020``: smallest user share covering 80% of revenue
  [P — the Pareto concentration headline next to Lorenz/Gini curves].
- ``agg_median_of_means``: median-of-means robust mean estimator
  [P — Nemirovsky & Yudin 1983; THE distributed robust estimator —
  bucket means are map-side partials, the median is over k numbers].
- ``stats_jarque_bera``: Jarque–Bera normality test from skewness and
  kurtosis [P — Jarque & Bera 1980] — the gate before normal-theory
  intervals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# events_recency_weighted_score
# ---------------------------------------------------------------------------


@register(
    "events_recency_weighted_score",
    oracle="""
    WITH anchor AS (SELECT MAX(epoch_us(ts)) AS t_max FROM events),
    s AS (
      SELECT e.user_id,
             SUM(COALESCE(e.value, 0)
                 * EXP(-0.1 * CAST(anchor.t_max - epoch_us(e.ts) AS DOUBLE)
                       / 86400e6)) AS score,
             COUNT(*) AS n_events
      FROM events e CROSS JOIN anchor
      GROUP BY e.user_id
    ),
    r AS (
      SELECT user_id, ROUND(score, 4) AS score, n_events,
             ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, user_id) AS rn
      FROM s
    )
    SELECT user_id, score, CAST(n_events AS BIGINT) AS n_events
    FROM r WHERE rn <= 100 ORDER BY score DESC, user_id
    """,
)
def events_recency_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential recency-weighted engagement scoring: each event
    contributes value·e^(−0.1·age_days) against the corpus max
    timestamp, summed per user; top-100 reported. The standard
    recsys/CRM recency weighting — yesterday's purchase outranks last
    month's — with the decay rate as the single tunable.

    The anchor is a 1-row MAX broadcast (never driver wall-clock — the
    score must be a pure function of the DATA for reruns to agree);
    ages are µs integers until one exp() per row in codegen; one
    user-keyed combinable aggregate; top-100 is TakeOrderedAndProject
    on the rounded score + id tiebreak (boundary-ulp discipline)."""
    ev = table(spark, sf_dir, "events").select("user_id", "value", "ts")
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("t_max"))
    s = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.coalesce(F.col("value"), F.lit(0))
                * F.exp(
                    F.lit(-0.1)
                    * (F.col("t_max") - F.unix_micros("ts")).cast("double")
                    / F.lit(86400e6)
                )
            ).alias("score_raw"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        s.select(
            "user_id",
            F.round("score_raw", 4).alias("score"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy(F.desc("score"), "user_id")
        .limit(100)
        .orderBy(F.desc("score"), "user_id")
    )


# ---------------------------------------------------------------------------
# privacy_generalization_ladder
# ---------------------------------------------------------------------------


@register(
    "privacy_generalization_ladder",
    oracle="""
    WITH lv(level, width) AS (VALUES (0, 50), (1, 100), (2, 200), (3, 400)),
    g AS (
      SELECT lv.level, strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
             CAST(FLOOR(COALESCE(e.value, -1000) / lv.width) AS BIGINT) AS vb,
             COUNT(*) AS k
      FROM events e CROSS JOIN lv
      GROUP BY 1, 2, 3
    ),
    mins AS (
      SELECT level, day, MIN(k) AS min_k, COUNT(*) AS n_groups
      FROM g GROUP BY level, day
    ),
    chosen AS (
      SELECT day, MIN(level) AS level
      FROM mins WHERE min_k >= 10 GROUP BY day
    )
    SELECT m.day, CAST(m.level AS INT) AS chosen_level,
           CAST(m.min_k AS BIGINT) AS min_group_size,
           CAST(m.n_groups AS BIGINT) AS n_groups
    FROM mins m JOIN chosen c ON m.day = c.day AND m.level = c.level
    ORDER BY m.day
    """,
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal k-anonymous generalization: per day, walk the value-
    bucket generalization ladder (width 50 → 100 → 200 → 400) and pick
    the FINEST level whose smallest quasi-identifier group already has
    k ≥ 10 — Sweeney's generalization hierarchies as an optimization,
    not a fixed policy: coarsen exactly as much as required and no
    more (utility), never less (privacy). Completes the privacy family
    as the REMEDIATION step after `privacy_k_anonymity` finds
    violations.

    All four ladder levels ride ONE scan via a 4-row broadcast level
    grid (the `privacy_l_diversity` threshold-grid shape); group sizes
    are one (level, day, bucket) rollup; the per-day argmin level is a
    bounded aggregate over the per-level minima."""
    lv = spark.createDataFrame(
        [(0, 50), (1, 100), (2, 200), (3, 400)], "level int, width int"
    )
    ev = table(spark, sf_dir, "events").select(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("value"), F.lit(-1000)).alias("v"),
    )
    g = (
        ev.crossJoin(F.broadcast(lv))
        .groupBy(
            "level",
            "day",
            F.floor(F.col("v") / F.col("width")).cast("bigint").alias("vb"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
    )
    mins = g.groupBy("level", "day").agg(
        F.min("k").alias("min_k"), F.count(F.lit(1)).alias("n_groups")
    )
    # per-day argmin level via a window over the bounded 4×days mins
    # table — a filter+groupBy+join re-derives the whole pipeline
    # (the `events_cohort_retention_matrix` lesson)
    wd = Window.partitionBy("day")
    mins = mins.withColumn(
        "chosen",
        F.min(F.when(F.col("min_k") >= 10, F.col("level"))).over(wd),
    )
    return (
        mins.filter(F.col("level") == F.col("chosen"))
        .select(
            "day",
            F.col("level").cast("int").alias("chosen_level"),
            F.col("min_k").cast("bigint").alias("min_group_size"),
            F.col("n_groups").cast("bigint").alias("n_groups"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# agg_pareto_8020
# ---------------------------------------------------------------------------


@register(
    "agg_pareto_8020",
    oracle="""
    WITH u AS (
      SELECT user_id,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    r AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC, user_id) AS rn,
             SUM(rev) OVER (ORDER BY rev DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS total,
             COUNT(*) OVER () AS n_users
      FROM u
    )
    SELECT CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(MAX(total) AS BIGINT) AS total_rev_c,
           CAST(MIN(CASE WHEN cum * 10 >= total * 8 THEN rn END)
                AS BIGINT) AS users_for_80pct,
           CAST(10000 * MIN(CASE WHEN cum * 10 >= total * 8 THEN rn END)
                // MAX(n_users) AS BIGINT) AS user_share_bp
    FROM r
    """,
)
def agg_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto headline: how many top-revenue users cover 80% of
    purchase revenue, and what share of the user base that is — the
    single number executives quote from the `agg_lorenz_deciles` curve
    (and the concentration twin of `agg_gini_concentration`).

    Revenue is integer cents; the cutoff comparison cross-multiplies
    (cum·10 ≥ total·8) so no float decides the crossing row. Users are
    data-sized at 100 TB, so the cumulative-revenue scan runs through
    ``functions.distributed.binned_prefix_sums`` over (−rev, user_id)
    (r12, VERDICT r11 next-#4: the sampler `prefix_sums` ran FOUR
    serial driver jobs; the in-plan binned scan is ONE executed job —
    −rev is a DERIVED ranking key with no parquet footer, so the bin
    bounds come from the helper's in-plan broadcast min/max arm, which
    shares the per-user rollup's exchange via ReusedExchange); the
    grand total and user count ride the offsets broadcast as columns,
    and the empty-input case falls out as the same one all-NULL row
    the old driver branch fabricated (ungrouped agg over zero rows)."""
    from ..functions.distributed import binned_prefix_sums

    u = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .withColumn("negrev", -F.col("rev"))
        .withColumn("one", F.lit(1))
    )
    # asc over (−rev, user_id) == (rev DESC, user_id): inclusive cum
    # revenue (_ps_rev) and 1-based rank (_ps_one) in one two-phase pass
    r = binned_prefix_sums(
        u, ["negrev", "user_id"], ["rev", "one"], totals=["rev", "one"]
    )
    # totals are BIGINT columns, so the ×8 cross-multiply cannot hit
    # the int-literal ANSI overflow the old driver-literal fold guarded
    hit = F.when(
        F.col("_ps_rev") * 10 >= F.col("_ps_tot_rev") * 8,
        F.col("_ps_one"),
    )
    return r.agg(
        F.min(hit).cast("bigint").alias("users_for_80pct"),
        F.max("_ps_tot_one").cast("bigint").alias("n_users"),
        F.max("_ps_tot_rev").cast("bigint").alias("total_rev_c"),
    ).select(
        "n_users",
        "total_rev_c",
        "users_for_80pct",
        F.expr("(10000 * users_for_80pct) DIV n_users")
        .cast("bigint")
        .alias("user_share_bp"),
    )


# ---------------------------------------------------------------------------
# agg_median_of_means
# ---------------------------------------------------------------------------

_MOM_MULT = 2654435761


@register(
    "agg_median_of_means",
    oracle=f"""
    WITH b AS (
      SELECT (o_orderkey * {_MOM_MULT}) % 4294967296 % 16 AS bucket,
             AVG(o_totalprice) AS m, COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(quantile_cont(m, 0.5), 4) AS median_of_means,
           ROUND(SUM(m * n) / SUM(n), 4) AS plain_mean,
           ROUND(MIN(m), 4) AS min_bucket_mean,
           ROUND(MAX(m), 4) AS max_bucket_mean
    FROM b
    """,
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means: hash rows into 16 buckets, average each, take
    the MEDIAN of the 16 means — the estimator with exponential
    concentration under heavy tails, where the plain mean has only
    Chebyshev (one adversarial outlier moves the mean by x/n but can
    poison at most ONE bucket here). THE distributed robust location
    estimator: bucket means are ordinary map-side partials and the
    median is over k scalars — contrast the exact median, which needs
    a full distributed quantile.

    Deterministic multiplicative-hash bucketing (reruns/engines agree);
    one 16-group combinable aggregate, then 16-row arithmetic. Both
    estimators reported side by side — their gap IS the tail signal."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = o.groupBy(
        ((F.col("o_orderkey") * F.lit(_MOM_MULT)) % F.lit(4294967296) % 16).alias(
            "bucket"
        )
    ).agg(F.avg("o_totalprice").alias("m"), F.count(F.lit(1)).alias("n"))
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.round(F.expr("percentile(m, 0.5)"), 4).alias("median_of_means"),
        F.round(F.sum(F.col("m") * F.col("n")) / F.sum("n"), 4).alias("plain_mean"),
        F.round(F.min("m"), 4).alias("min_bucket_mean"),
        F.round(F.max("m"), 4).alias("max_bucket_mean"),
    )


# ---------------------------------------------------------------------------
# stats_jarque_bera
# ---------------------------------------------------------------------------


@register(
    "stats_jarque_bera",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS mu,
             SUM(value) AS s1, SUM(value * value) AS s2,
             SUM(value * value * value) AS s3,
             SUM(value * value * value * value) AS s4
      FROM events WHERE value IS NOT NULL GROUP BY event_type
      HAVING MIN(value) <> MAX(value)
    ),
    c AS (
      SELECT event_type, n,
             (s2 - s1 * s1 / n) / n AS m2,
             (s3 - 3 * mu * s2 + 3 * mu * mu * s1 - n * mu * mu * mu) / n
               AS m3,
             (s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 4 * mu * mu * mu * s1
              + n * mu * mu * mu * mu) / n AS m4
      FROM m
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND(m3 / POW(m2, 1.5), 4) + 0 AS skewness,
           ROUND(m4 / (m2 * m2) - 3, 4) AS excess_kurtosis,
           ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
                 + POW(m4 / (m2 * m2) - 3, 2) / 4), 4) AS jb_stat
    FROM c ORDER BY event_type
    """,
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test per event type: JB = n/6·(S² + K²/4)
    from the population skewness S and excess kurtosis K — the gate
    before any normal-theory machinery (`stats_binomial_ci_wilson`
    aside, every z/t interval in §2 assumes approximate normality;
    this key says when that's a lie). JB ~ χ²(2) under the null.

    One pass of raw power sums (Σx…Σx⁴, map-side combinable); central
    moments expand binomially from them with the SAME expression both
    engines (the `stats_levene_test` discipline — engine-native skew/
    kurtosis aggregates differ in estimator convention, so neither is
    used). `+ 0` canonicalizes a symmetric distribution's −0.0 skew.

    Constant groups are gated out two-sided with the EXACT predicate
    `min(value) <> max(value)` (engine filter + oracle HAVING): S and K
    are undefined at zero variance, and the power-sum m2 there is 1-ulp
    cancellation residue that skew/kurt amplify astronomically (r7 edge
    class 7) — an exact constancy test removes the row identically on
    both engines instead of comparing amplified noise. No-op at real
    SFs (every event_type group has distinct values)."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("mu"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    ).filter(F.col("vmin") != F.col("vmax"))
    n, mu = F.col("n"), F.col("mu")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    c = m.select(
        "event_type",
        n,
        ((s2 - s1 * s1 / n) / n).alias("m2"),
        ((s3 - 3 * mu * s2 + 3 * mu * mu * s1 - n * mu * mu * mu) / n).alias("m3"),
        (
            (
                s4
                - 4 * mu * s3
                + 6 * mu * mu * s2
                - 4 * mu * mu * mu * s1
                + n * mu * mu * mu * mu
            )
            / n
        ).alias("m4"),
    )
    # try_divide: a constant group (m2 == 0) leaves S/K undefined -> NULL,
    # matching DuckDB's NULL-on-zero-divisor division (r7 edge sweep)
    skew = F.try_divide(F.col("m3"), F.pow(F.col("m2"), 1.5))
    kurt = F.try_divide(F.col("m4"), F.col("m2") * F.col("m2")) - 3
    return c.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.round(skew, 4) + F.lit(0)).alias("skewness"),
        F.round(kurt, 4).alias("excess_kurtosis"),
        F.round(F.col("n") / 6.0 * (F.pow(skew, 2) + F.pow(kurt, 2) / 4), 4).alias(
            "jb_stat"
        ),
    ).orderBy("event_type")
