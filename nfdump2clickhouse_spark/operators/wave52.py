"""Wave-52 keys (round 5): Tukey fences, MASE, one-sample t,
embedding anisotropy, lateral column aliases.

- ``agg_tukey_fences``: boxplot outlier fences (Q1−1.5·IQR,
  Q3+1.5·IQR) per group [P — Tukey 1977; THE boxplot rule].
- ``ts_forecast_mase``: mean absolute scaled error of a seasonal-naive
  forecast [P — Hyndman & Koehler 2006; the scale-free forecast metric
  that, unlike MAPE, survives zeros and comparisons across series].
- ``stats_one_sample_t``: one-sample t vs a fixed benchmark
  [P — Student 1908; the 'did we beat the target?' test].
- ``emb_anisotropy``: average pairwise cosine of the embedding space
  via the exact sum-vector identity [P — Ethayarajh 2019; anisotropic
  ('cone-shaped') embedding spaces break cosine similarity, the
  famous LLM-embedding pathology].
- ``sql_lateral_alias``: lateral column alias references — using a
  SELECT-list alias later in the SAME select [P — Spark 3.4 SQL
  surface; saves a subquery per derived column].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# agg_tukey_fences
# ---------------------------------------------------------------------------


@register(
    "agg_tukey_fences",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    t AS (
      SELECT e.event_type, e.value, b.q1, b.q3,
             b.q1 - 1.5 * (b.q3 - b.q1) AS lo,
             b.q3 + 1.5 * (b.q3 - b.q1) AS hi
      FROM events e JOIN b USING (event_type)
      WHERE e.value IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(lo), 4) AS fence_lo,
           ROUND(MAX(hi), 4) AS fence_hi,
           CAST(count_if(value < lo) AS BIGINT) AS n_low_outliers,
           CAST(count_if(value > hi) AS BIGINT) AS n_high_outliers,
           CAST(10000 * count_if(value < lo OR value > hi) // COUNT(*)
                AS BIGINT) AS outlier_bp
    FROM t GROUP BY event_type ORDER BY event_type
    """,
)
def agg_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's boxplot fences per event type: values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] are the boxplot's whisker outliers —
    THE default outlier rule of exploratory analysis, quartile-based
    where `agg_mad_outliers` is median-based and `ts_hampel_outliers`
    is rolling. Low/high counted separately (asymmetry is itself a
    tail signal) with the share in integer bp.

    The fit/transform split again: one exact-quartile aggregate
    (k rows) broadcasts the fences back onto the scan; strict
    inequalities on both engines."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    t = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        "value",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    v = F.col("value")
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("lo"), 4).alias("fence_lo"),
            F.round(F.max("hi"), 4).alias("fence_hi"),
            F.count_if(v < F.col("lo")).cast("bigint").alias("n_low_outliers"),
            F.count_if(v > F.col("hi")).cast("bigint").alias("n_high_outliers"),
            F.expr(
                "10000 * count_if(value < lo OR value > hi) DIV count(1)"
            )
            .cast("bigint")
            .alias("outlier_bp"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ts_forecast_mase
# ---------------------------------------------------------------------------


@register(
    "ts_forecast_mase",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT rev,
             LAG(rev, 7) OVER (ORDER BY day) AS snaive,
             LAG(rev, 1) OVER (ORDER BY day) AS naive
      FROM daily
    )
    -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
    SELECT CAST(COALESCE(count_if(snaive IS NOT NULL), 0) AS BIGINT) AS n_scored,
           ROUND(AVG(CASE WHEN snaive IS NOT NULL
                     THEN ABS(rev - snaive) / 100.0 END), 4)
             AS mae_snaive,
           ROUND(AVG(CASE WHEN naive IS NOT NULL
                     THEN ABS(rev - naive) / 100.0 END), 4) AS mae_naive,
           ROUND(AVG(CASE WHEN snaive IS NOT NULL
                     THEN ABS(rev - snaive) * 1.0 END)
                 / AVG(CASE WHEN naive IS NOT NULL
                       THEN ABS(rev - naive) * 1.0 END), 4) AS mase
    FROM lagged
    """,
)
def ts_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE for the seasonal-naive (same weekday last week) forecast of
    daily revenue, scaled by the one-step naive error: MASE < 1 means
    the weekly pattern genuinely predicts (beat the naive in-sample
    benchmark), > 1 means it doesn't — the scale-free forecast metric
    that survives zero days and cross-series comparison where MAPE
    (`events_forecast_backtest`'s family) divides by zero and favors
    under-forecasts [Hyndman & Koehler 2006].

    Both forecasts are lag windows over the bounded day table; integer
    cents keep every |error| exact before the two display divisions."""
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev",
        F.lag("rev", 7).over(w).alias("snaive"),
        F.lag("rev", 1).over(w).alias("naive"),
    )
    s_ok = F.col("snaive").isNotNull()
    n_ok = F.col("naive").isNotNull()
    abs_s = F.abs(F.col("rev") - F.col("snaive"))
    abs_n = F.abs(F.col("rev") - F.col("naive"))
    return lagged.agg(
        F.count_if(s_ok).cast("bigint").alias("n_scored"),
        F.round(F.avg(F.when(s_ok, abs_s / 100.0)), 4).alias("mae_snaive"),
        F.round(F.avg(F.when(n_ok, abs_n / 100.0)), 4).alias("mae_naive"),
        F.round(
            # try_divide: a constant series (naive MAE 0) leaves MASE
            # undefined -> NULL, matching DuckDB (r7 edge sweep)
            F.try_divide(
                F.avg(F.when(s_ok, abs_s * 1.0)), F.avg(F.when(n_ok, abs_n * 1.0))
            ),
            4,
        ).alias("mase"),
    )


# ---------------------------------------------------------------------------
# stats_one_sample_t
# ---------------------------------------------------------------------------


@register(
    "stats_one_sample_t",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 4) AS sample_mean,
           ROUND((AVG(value) - 100.0)
                 / (STDDEV_SAMP(value) / SQRT(COUNT(*))), 4) + 0 AS t_stat,
           CAST(COUNT(*) - 1 AS BIGINT) AS df
    FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
    """,
)
def stats_one_sample_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample t-test of mean purchase value against the fixed
    benchmark μ₀ = 100: t = (x̄ − μ₀)/(s/√n) — the 'did we beat the
    target?' test that anchors the t-family (`agg_welch_ttest` compares
    two groups; this compares one group to a NUMBER: an SLA, a plan, a
    contract). Reported with df for the caller's table lookup.

    One 1-row moment aggregate — the simplest member of the family,
    and deliberately so: the full inferential ladder from this to
    Welch/Wilcoxon/sign/SPRT shares the same combinable-moments
    machinery."""
    p = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("value")
    )
    n = F.count(F.lit(1))
    return p.agg(
        n.cast("bigint").alias("n"),
        F.round(F.avg("value"), 4).alias("sample_mean"),
        (
            F.round(
                (F.avg("value") - 100.0)
                / (F.stddev_samp("value") / F.sqrt(n)),
                4,
            )
            + F.lit(0)
        ).alias("t_stat"),
        (n - 1).cast("bigint").alias("df"),
    )


# ---------------------------------------------------------------------------
# emb_anisotropy
# ---------------------------------------------------------------------------


@register(
    "emb_anisotropy",
    oracle="""
    WITH norm AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_sum(list_transform(
                 CAST(embedding AS DOUBLE[]), y -> y * y)))) AS u
      FROM embeddings
    ),
    dims AS (
      SELECT t.i AS dim, SUM(u[t.i]) AS s, COUNT(*) AS n
      FROM norm, UNNEST(generate_series(1, len(u))) AS t(i)
      GROUP BY t.i
    ),
    agg AS (
      SELECT SUM(s * s) AS ss, MAX(n) AS n FROM dims
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           ROUND((ss - n) / (n * (n - 1.0)), 4) + 0 AS mean_pairwise_cosine,
           ROUND(SQRT(ss) / n, 4) AS mean_vector_norm
    FROM agg
    """,
)
def emb_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy: the average pairwise cosine over ALL
    n(n−1) vector pairs, computed WITHOUT any pair join via the exact
    identity Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − n for unit vectors — one pass,
    one 64-float sum. Near-0 is isotropic (directions spread — cosine
    similarity is meaningful); near-1 is the cone-shaped pathology
    famous in LLM embeddings [Ethayarajh 2019], where everything is
    'similar' to everything and `dedup_embedding_cosine` thresholds
    stop discriminating. ‖mean vector‖ reported as the equivalent
    geometric read.

    THE showcase of algebra-over-shuffle: the naive form is an n²
    pair join (`emb_distance_histogram` samples it); the identity
    computes the exact all-pairs mean with a posexplode aggregate —
    at 100 TB this is the difference between impossible and one scan."""
    norm_u = F.transform(
        F.col("emb"),
        lambda x: x
        / F.sqrt(F.aggregate(F.col("emb"), F.lit(0.0), lambda a, y: a + y * y)),
    )
    e = (
        table(spark, sf_dir, "embeddings")
        .select(F.col("embedding").cast("array<double>").alias("emb"))
        .select(F.posexplode(norm_u).alias("dim", "u"))
    )
    dims = e.groupBy("dim").agg(
        F.sum("u").alias("s"), F.count(F.lit(1)).alias("n")
    )
    agg = dims.agg(
        F.sum(F.col("s") * F.col("s")).alias("ss"), F.max("n").alias("n")
    )
    n = F.col("n")
    return agg.select(
        n.cast("bigint").alias("n_vectors"),
        # try_divide: a single vector (n==1) has no pairs -> NULL,
        # matching DuckDB's NULL-on-zero-divisor division (r7 edge sweep)
        (F.round(F.try_divide(F.col("ss") - n, n * (n - 1.0)), 4) + F.lit(0)).alias(
            "mean_pairwise_cosine"
        ),
        F.round(F.sqrt(F.col("ss")) / n, 4).alias("mean_vector_norm"),
    )


# ---------------------------------------------------------------------------
# sql_lateral_alias
# ---------------------------------------------------------------------------


@register(
    "sql_lateral_alias",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net,
           ROUND(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 / COUNT(*), 4) AS net_per_item,
           ROUND(ROUND(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       / COUNT(*), 4) * 1.1, 4) AS net_per_item_taxed
    FROM lineitem GROUP BY l_returnflag ORDER BY flag
    """,
)
def sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases — referencing a SELECT-list alias later
    in the SAME select (`net` → `net_per_item` → `net_per_item_taxed`):
    the Spark 3.4+ SQL surface that kills the nested-subquery-per-
    derived-column pattern ETL SQL used to need. The oracle spells the
    chain out expanded (DuckDB resolves the aliases the same way; the
    expansion proves the SEMANTICS: each step sees the previous alias's
    already-rounded value, not a re-derivation).

    Analysis-time sugar: the chain folds into one projection over one
    partial+final aggregate — the plan is identical to the hand-
    expanded form (single Exchange pinned)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sf_lat_li")
    return spark.sql(
        """
        SELECT l_returnflag AS flag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net,
               ROUND(net / COUNT(*), 4) AS net_per_item,
               ROUND(net_per_item * 1.1, 4) AS net_per_item_taxed
        FROM sf_lat_li GROUP BY l_returnflag ORDER BY flag
        """
    )
