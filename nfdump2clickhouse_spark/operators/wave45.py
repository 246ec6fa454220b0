"""Wave-45 keys (round 5): embedding drift, heteroscedasticity gate,
scan taxonomy, seasonality strength, concentration trend.

- ``emb_centroid_drift``: per-cluster centroid shift between data
  halves [P — embedding-space drift monitoring; the vector sibling of
  scalar PSI].
- ``stats_breusch_pagan``: Breusch–Pagan heteroscedasticity test on
  the `agg_linreg` regression [P — Breusch & Pagan 1979; the validity
  gate under OLS standard errors].
- ``flows_scan_taxonomy``: vertical vs horizontal port-scan
  classification [P — the standard scan taxonomy: one host/many ports
  vs one port/many hosts].
- ``ts_seasonality_strength``: trend and seasonality strength from the
  classical decomposition [P — Hyndman's F_T/F_S strength measures].
- ``agg_gini_daily_trend``: daily Gini of user revenue — concentration
  as a time series [P — 'is revenue concentrating?' longitudinally].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# emb_centroid_drift
# ---------------------------------------------------------------------------


@register(
    "emb_centroid_drift",
    oracle="""
    WITH halves AS (
      SELECT label, (vec_id % 2 = 0) AS half_a,
             t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    cents AS (
      SELECT label, half_a, dim, AVG(v) AS c
      FROM halves GROUP BY label, half_a, dim
    ),
    paired AS (
      SELECT a.label, a.dim, a.c AS ca, b.c AS cb
      FROM cents a JOIN cents b
        ON a.label = b.label AND a.dim = b.dim
       AND a.half_a AND NOT b.half_a
    ),
    sums AS (
      SELECT label,
             SUM(ca * cb) AS dot,
             SQRT(SUM(ca * ca)) AS na,
             SQRT(SUM(cb * cb)) AS nb,
             SQRT(SUM((ca - cb) * (ca - cb))) AS l2
      FROM paired GROUP BY label
    )
    SELECT CAST(label AS INT) AS label,
           ROUND(dot / (na * nb), 4) AS centroid_cosine,
           ROUND(l2, 4) AS centroid_l2_shift
    FROM sums ORDER BY label
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift: split each cluster's vectors into two
    deterministic halves (vec_id parity — in production, two time
    windows), compute both centroids, and report their cosine and L2
    shift per label. Cosine ≈ 1 means the cluster is stable; a drop
    says the region MOVED — retrain the IVF/PQ index, recheck SemDeDup
    assignments. The vector-space sibling of `drift_psi` (scalar
    distributions) and `emb_dimension_variance` (static geometry).

    One posexplode → (label, half, dim) mean — a single combinable
    aggregate whose output is 2·k·64 rows — then the half-pairing and
    norms are arithmetic on that bounded table. The corpus is touched
    once."""
    e = table(spark, sf_dir, "embeddings").select(
        "label", (F.col("vec_id") % 2 == 0).alias("half_a"),
        F.posexplode(F.col("embedding")).alias("dim", "v0"),
    )
    cents = (
        e.select("label", "half_a", "dim", F.col("v0").cast("double").alias("v"))
        .groupBy("label", "half_a", "dim")
        .agg(F.avg("v").alias("c"))
    )
    a = cents.filter(F.col("half_a")).select(
        "label", "dim", F.col("c").alias("ca")
    )
    b = cents.filter(~F.col("half_a")).select(
        "label", "dim", F.col("c").alias("cb")
    )
    paired = a.join(b, ["label", "dim"])
    sums = paired.groupBy("label").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("dot"),
        F.sqrt(F.sum(F.col("ca") * F.col("ca"))).alias("na"),
        F.sqrt(F.sum(F.col("cb") * F.col("cb"))).alias("nb"),
        F.sqrt(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
        ).alias("l2"),
    )
    return sums.select(
        F.col("label").cast("int").alias("label"),
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias(
            "centroid_cosine"
        ),
        F.round("l2", 4).alias("centroid_l2_shift"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# stats_breusch_pagan
# ---------------------------------------------------------------------------


@register(
    "stats_breusch_pagan",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n, SUM(l_quantity) AS sx,
             SUM(l_extendedprice) AS sy,
             SUM(l_quantity * l_quantity) AS sxx,
             SUM(l_quantity * l_extendedprice) AS sxy
      FROM lineitem
    ),
    beta AS (
      SELECT n,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b1,
             sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n AS b0
      FROM m
    ),
    resid AS (
      SELECT l.l_quantity AS x,
             POW(l.l_extendedprice - beta.b0 - beta.b1 * l.l_quantity, 2)
               AS e2
      FROM lineitem l CROSS JOIN beta
    ),
    aux AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(e2) AS sy,
             SUM(x * x) AS sxx, SUM(x * e2) AS sxy,
             SUM(e2 * e2) AS syy
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(POW(sxy - sx * sy / n, 2)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 4)
             AS aux_r2,
           ROUND(n * POW(sxy - sx * sy / n, 2)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 4)
             AS bp_stat,
           CAST(1 AS BIGINT) AS df
    FROM aux
    """,
)
def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan heteroscedasticity test on the price~quantity
    regression: fit OLS, regress the SQUARED residuals on the
    regressor, and BP = n·R² of that auxiliary fit ~ χ²(1) — large BP
    means the error variance moves with x, so `agg_linreg`'s
    constant-variance standard errors are lies (this fixture's
    price~quantity errors turn out near-homoscedastic — BP correctly
    stays quiet, which is as informative as firing). The validity
    gate completing the regression ladder: fit (`agg_linreg`,
    `stats_ols_two_vars`) → normality (`stats_jarque_bera`) →
    homoscedasticity (this).

    Two moment passes: betas from a 1-row aggregate broadcast back,
    then the auxiliary regression's moments in a second 1-row pass —
    the aux R² assembles from centered sums in the same expansion form
    both engines share (single-predictor R² = corr², via the
    `stats_levene_test` discipline)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    x, y = F.col("x"), F.col("y")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    # try_divide: a constant regressor (zero x-variance, e.g. n==1)
    # leaves the fit undefined -> NULL, matching DuckDB (r7 edge sweep)
    b1 = F.try_divide(
        F.col("sxy") - F.col("sx") * F.col("sy") / n,
        F.col("sxx") - F.col("sx") * F.col("sx") / n,
    )
    beta = m.select(
        b1.alias("b1"), (F.col("sy") / n - b1 * F.col("sx") / n).alias("b0")
    )
    resid = li.crossJoin(F.broadcast(beta)).select(
        "x",
        F.pow(y - F.col("b0") - F.col("b1") * x, 2).alias("e2"),
    )
    e2 = F.col("e2")
    aux = resid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(e2).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * e2).alias("sxy"),
        F.sum(e2 * e2).alias("syy"),
    )
    num = F.pow(F.col("sxy") - F.col("sx") * F.col("sy") / n, 2)
    den = (F.col("sxx") - F.col("sx") * F.col("sx") / n) * (
        F.col("syy") - F.col("sy") * F.col("sy") / n
    )
    return aux.select(
        n.cast("bigint").alias("n"),
        F.round(F.try_divide(num, den), 4).alias("aux_r2"),
        F.round(F.try_divide(n * num, den), 4).alias("bp_stat"),
        F.lit(1).cast("bigint").alias("df"),
    )


# ---------------------------------------------------------------------------
# flows_scan_taxonomy
# ---------------------------------------------------------------------------


@register(
    "flows_scan_taxonomy",
    oracle="""
    WITH f AS (
      SELECT '10.0.' || CAST(user_id % 50 AS VARCHAR) AS sa,
             '10.0.' || CAST((user_id + event_id) % 50 AS VARCHAR) AS da,
             CAST(event_id % 1024 AS INT) AS dp,
             date_trunc('hour', ts) AS hr
      FROM events
    ),
    vertical AS (  -- one source, one target, many ports
      SELECT sa, hr, da, COUNT(DISTINCT dp) AS n_ports
      FROM f GROUP BY sa, hr, da HAVING COUNT(DISTINCT dp) >= 8
    ),
    horizontal AS (  -- one source, one port, many targets
      SELECT sa, hr, dp, COUNT(DISTINCT da) AS n_hosts
      FROM f GROUP BY sa, hr, dp HAVING COUNT(DISTINCT da) >= 8
    )
    SELECT CAST((SELECT COUNT(*) FROM vertical) AS BIGINT)
             AS n_vertical_incidents,
           CAST((SELECT COUNT(DISTINCT sa) FROM vertical) AS BIGINT)
             AS n_vertical_scanners,
           CAST((SELECT COALESCE(MAX(n_ports), 0) FROM vertical) AS BIGINT)
             AS max_ports_hit,
           CAST((SELECT COUNT(*) FROM horizontal) AS BIGINT)
             AS n_horizontal_incidents,
           CAST((SELECT COUNT(DISTINCT sa) FROM horizontal) AS BIGINT)
             AS n_horizontal_scanners,
           CAST((SELECT COALESCE(MAX(n_hosts), 0) FROM horizontal) AS BIGINT)
             AS max_hosts_hit
    """,
)
def flows_scan_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard scan taxonomy, both axes: VERTICAL scans (one
    source probing many PORTS on one target — service discovery
    against a victim) and HORIZONTAL scans (one source probing one
    PORT across many targets — worm/exploit sweep for a known
    vulnerability), each at the ≥8-distinct-in-an-hour threshold.
    `flows_portscan` counts ports per source regardless of target —
    this key separates the two behaviors a SOC triages differently.

    Two distinct-count aggregates over the same scan (vertical keys on
    (sa, hr, da), horizontal on (sa, hr, dp)) — each plans as the
    two-phase dedup-then-count shape with the HAVING on the aggregated
    side; the 1-row summary joins six bounded scalars."""
    f = table(spark, sf_dir, "events").select(
        F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias("sa"),
        F.concat(
            F.lit("10.0."), ((F.col("user_id") + F.col("event_id")) % 50).cast("string")
        ).alias("da"),
        (F.col("event_id") % 1024).cast("int").alias("dp"),
        F.date_trunc("hour", "ts").alias("hr"),
    ).localCheckpoint()  # both taxonomy passes share one synthesis
    vertical = (
        f.groupBy("sa", "hr", "da")
        .agg(F.count_distinct(F.col("dp")).alias("n_ports"))
        .filter(F.col("n_ports") >= 8)
    )
    horizontal = (
        f.groupBy("sa", "hr", "dp")
        .agg(F.count_distinct(F.col("da")).alias("n_hosts"))
        .filter(F.col("n_hosts") >= 8)
    )
    v = vertical.agg(
        F.count(F.lit(1)).alias("n_vertical_incidents"),
        F.count_distinct(F.col("sa")).alias("n_vertical_scanners"),
        F.coalesce(F.max("n_ports"), F.lit(0)).alias("max_ports_hit"),
    )
    h = horizontal.agg(
        F.count(F.lit(1)).alias("n_horizontal_incidents"),
        F.count_distinct(F.col("sa")).alias("n_horizontal_scanners"),
        F.coalesce(F.max("n_hosts"), F.lit(0)).alias("max_hosts_hit"),
    )
    return v.crossJoin(F.broadcast(h)).select(
        F.col("n_vertical_incidents").cast("bigint").alias("n_vertical_incidents"),
        F.col("n_vertical_scanners").cast("bigint").alias("n_vertical_scanners"),
        F.col("max_ports_hit").cast("bigint").alias("max_ports_hit"),
        F.col("n_horizontal_incidents")
        .cast("bigint")
        .alias("n_horizontal_incidents"),
        F.col("n_horizontal_scanners")
        .cast("bigint")
        .alias("n_horizontal_scanners"),
        F.col("max_hosts_hit").cast("bigint").alias("max_hosts_hit"),
    )


# ---------------------------------------------------------------------------
# ts_seasonality_strength
# ---------------------------------------------------------------------------


@register(
    "ts_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS rev
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT day, rev,
             AVG(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS trend,
             COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS n_win
      FROM daily
    ),
    det AS (
      SELECT day, rev, trend, rev - trend AS detr,
             dayofweek(day) AS dow
      FROM t WHERE n_win = 7
    ),
    seas AS (
      SELECT det.*, AVG(detr) OVER (PARTITION BY dow) AS seasonal
      FROM det
    ),
    parts AS (
      SELECT rev, trend, seasonal, rev - trend - seasonal AS resid
      FROM seas
    ),
    v AS (
      SELECT COUNT(*) AS n,
             (SUM(resid * resid) - SUM(resid) * SUM(resid) / COUNT(*))
               AS ss_r,
             (SUM((seasonal + resid) * (seasonal + resid))
              - SUM(seasonal + resid) * SUM(seasonal + resid) / COUNT(*))
               AS ss_sr,
             (SUM((trend + resid) * (trend + resid))
              - SUM(trend + resid) * SUM(trend + resid) / COUNT(*)) AS ss_tr
      FROM parts
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(GREATEST(0, 1 - ss_r / ss_tr), 4) AS trend_strength,
           ROUND(GREATEST(0, 1 - ss_r / ss_sr), 4) AS seasonal_strength
    FROM v
    """,
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's decomposition-strength measures on daily order
    revenue: F_T = max(0, 1 − Var(R)/Var(T+R)) and
    F_S = max(0, 1 − Var(R)/Var(S+R)) from the same classical
    decomposition as `ts_seasonal_decompose` (centered 7-day trend,
    day-of-week seasonal of the detrended series) — the two scalars
    that decide whether a forecaster needs a trend term, a seasonal
    term, both or neither, before anyone eyeballs the decomposition
    plot.

    Corpus work is the one day-grain aggregate; decomposition windows
    and the variance pass run over the bounded day table; the dow
    numbering is 0=Sunday in BOTH engines at this call pattern (the
    `ts_seasonal_decompose` precedent)."""
    o = table(spark, sf_dir, "orders")
    # two-sided gate: a dateless order is not a time-series point, and
    # under mixed NULLs Spark's ASC window sorts the NULL day FIRST
    # where DuckDB sorts it LAST — the 7-row trend frames would differ
    # (r8 nullmix sweep)
    daily = (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "rev",
        F.avg("rev").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    ).filter(F.col("n_win") == 7)
    det = t.select(
        "rev",
        "trend",
        (F.col("rev") - F.col("trend")).alias("detr"),
        (F.dayofweek("day") - 1).alias("dow"),
    )
    seas = det.withColumn(
        "seasonal", F.avg("detr").over(Window.partitionBy("dow"))
    )
    parts = seas.select(
        "rev",
        "trend",
        "seasonal",
        (F.col("rev") - F.col("trend") - F.col("seasonal")).alias("resid"),
    )
    r, s, tr = F.col("resid"), F.col("seasonal"), F.col("trend")
    nn = F.count(F.lit(1))
    v = parts.agg(
        nn.alias("n"),
        (F.sum(r * r) - F.sum(r) * F.sum(r) / nn).alias("ss_r"),
        (
            F.sum((s + r) * (s + r)) - F.sum(s + r) * F.sum(s + r) / nn
        ).alias("ss_sr"),
        (
            F.sum((tr + r) * (tr + r)) - F.sum(tr + r) * F.sum(tr + r) / nn
        ).alias("ss_tr"),
    )
    return v.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1 - F.col("ss_r") / F.col("ss_tr")), 4).alias(
            "trend_strength"
        ),
        F.round(
            F.greatest(F.lit(0.0), 1 - F.col("ss_r") / F.col("ss_sr")), 4
        ).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# agg_gini_daily_trend
# ---------------------------------------------------------------------------


@register(
    "agg_gini_daily_trend",
    oracle="""
    WITH u AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    r AS (
      SELECT day, rev,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY rev, user_id) AS i,
             COUNT(*) OVER (PARTITION BY day) AS n,
             SUM(rev) OVER (PARTITION BY day) AS s
      FROM u
    )
    SELECT day,
           CAST(MAX(n) AS BIGINT) AS n_buyers,
           ROUND(2.0 * SUM(CAST(i AS DOUBLE) * rev) / (MAX(n) * MAX(s))
                 - (MAX(n) + 1.0) / MAX(n), 4) + 0 AS gini
    FROM r GROUP BY day ORDER BY day
    """,
)
def agg_gini_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration as a time series: the Gini coefficient of
    per-buyer purchase revenue computed PER DAY via the rank closed
    form G = 2Σi·xᵢ/(nΣx) − (n+1)/n — 'is revenue concentrating into
    fewer wallets?' is a trend question, and `agg_gini_concentration`'s
    single corpus-wide number can stay flat while every individual day
    polarizes.

    The rank window partitions by DAY — hundreds of partitions that
    spread across the cluster (the healthy case of the window pattern;
    contrast `stats_spearman_corr`'s 3-value key, which needed
    grouped_rank); integer-cents revenue makes ranks and sums exact;
    unique (rev, user_id) tiebreak keeps i engine-stable."""
    u = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
    )
    wd = Window.partitionBy("day")
    wr = wd.orderBy("rev", "user_id")
    r = u.select(
        "day",
        "rev",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wd).alias("n"),
        F.sum("rev").over(wd).alias("s"),
    )
    return (
        r.groupBy("day")
        .agg(
            F.max("n").cast("bigint").alias("n_buyers"),
            (
                F.round(
                    2.0 * F.sum(F.col("i").cast("double") * F.col("rev"))
                    / (F.max("n") * F.max("s"))
                    - (F.max("n") + 1.0) / F.max("n"),
                    4,
                )
                + F.lit(0)
            ).alias("gini"),
        )
        .orderBy("day")
    )
