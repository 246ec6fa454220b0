"""Wave-37 keys (round 5): audience overlap, G-test, partial
autocorrelation, consistent pseudonymization, effect sizes.

- ``events_audience_overlap``: day-over-day active-user Jaccard
  [P — standard audience-churn diagnostic].
- ``stats_g_test``: G-test of independence (log-likelihood-ratio χ²
  alternative) [P — Sokal & Rohlf; additive across partitions, which
  Pearson's χ² is not].
- ``ts_pacf``: partial autocorrelation via Durbin–Levinson
  [P — Durbin 1960] — the AR-order picker next to `ts_autocorr`.
- ``privacy_pseudonymize``: consistent keyed pseudonymization with a
  referential-integrity audit [P — GDPR-style pseudonymization:
  deterministic keyed hashing preserves joinability without storing
  the identifier].
- ``stats_cohens_d``: standardized effect sizes (Cohen's d, Hedges' g)
  between event-type value distributions [P — Cohen 1988] — the
  'is the significant difference MEANINGFUL?' number next to
  `agg_welch_ttest`'s p-value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# events_audience_overlap
# ---------------------------------------------------------------------------


@register(
    "events_audience_overlap",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id
      FROM events
    ),
    pairs AS (
      SELECT a.day AS day, b.day AS prev_day,
             COUNT(*) AS both_active
      FROM ud a JOIN ud b
        ON a.user_id = b.user_id
       AND CAST(a.day AS DATE) = CAST(b.day AS DATE) + INTERVAL 1 DAY
      GROUP BY 1, 2
    ),
    sizes AS (SELECT day, COUNT(*) AS n FROM ud GROUP BY day)
    SELECT p.day,
           CAST(p.both_active AS BIGINT) AS both_active,
           CAST(sa.n AS BIGINT) AS n_today,
           CAST(sb.n AS BIGINT) AS n_yesterday,
           ROUND(p.both_active * 1.0
                 / (sa.n + sb.n - p.both_active), 4) AS jaccard,
           ROUND(p.both_active * 1.0 / sb.n, 4) AS retention
    FROM pairs p
    JOIN sizes sa ON p.day = sa.day
    JOIN sizes sb ON p.prev_day = sb.day
    ORDER BY p.day
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience overlap: Jaccard and next-day retention of
    the active-user sets of consecutive days — the churn pulse a DAU
    chart hides (DAU can be flat while the audience fully rotates).
    Pairs with `events_dau_wau` (sizes) and `events_retention`
    (cohort-anchored form).

    One (day, user) distinct (checkpointed — its three consumers share
    one compute instead of re-scanning the corpus), then the overlap
    falls out of a LAG over each user's sorted day list: a user counts
    toward (day, day−1) overlap exactly when lag(day) == day−1 — no
    self-join, the shuffle carries the distinct-activity table once.
    Day sizes come from a bounded sibling rollup of the same
    checkpoint and broadcast back onto the ≤#days-row overlap table."""
    ud = (
        table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    prev = ud.withColumn("prev_d", F.lag("d").over(w))
    pairs = (
        prev.filter(F.col("d") == F.date_add(F.col("prev_d"), 1))
        .groupBy(F.col("d").alias("day_d"), "prev_d")
        .agg(F.count(F.lit(1)).alias("both_active"))
    )
    sizes = ud.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("d").alias("day_d"), F.col("n").alias("n_today"))
    sb = sizes.select(F.col("d").alias("prev_d"), F.col("n").alias("n_yesterday"))
    ba = F.col("both_active")
    return (
        pairs.join(F.broadcast(sa), "day_d")
        .join(F.broadcast(sb), "prev_d")
        .select(
            F.date_format("day_d", "yyyy-MM-dd").alias("day"),
            ba.cast("bigint").alias("both_active"),
            F.col("n_today").cast("bigint").alias("n_today"),
            F.col("n_yesterday").cast("bigint").alias("n_yesterday"),
            F.round(
                ba * 1.0 / (F.col("n_today") + F.col("n_yesterday") - ba), 4
            ).alias("jaccard"),
            F.round(ba * 1.0 / F.col("n_yesterday"), 4).alias("retention"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# stats_g_test
# ---------------------------------------------------------------------------


@register(
    "stats_g_test",
    oracle="""
    WITH half AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT h.event_type, h.grp, h.o,
             SUM(h.o) OVER (PARTITION BY h.event_type) AS row_t,
             SUM(h.o) OVER (PARTITION BY h.grp) AS col_t,
             SUM(h.o) OVER () AS nn
      FROM half h
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(nn) AS BIGINT) AS n,
           ROUND(2 * SUM(o * LN(o / (row_t * col_t / nn))), 4) AS g_stat,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT grp) - 1) AS BIGINT) AS df
    FROM margins
    """,
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence between event type and a user-parity
    split: G = 2·Σ O·ln(O/E) over the contingency cells with
    E = row·col/N — the log-likelihood-ratio alternative to Pearson's
    χ² (`stats_chi2_srm`), preferred when counts are small or when
    tests must ADD across data partitions (G is additive; χ² is not —
    the property that matters when each executor tests its shard and
    the driver sums).

    One contingency aggregate (≤ types×2 cells); margins come from
    windows over the bounded cell table — integer observed counts, so
    both engines feed identical doubles into the one ln()."""
    half = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("grp")
    wt = Window.partitionBy()
    m = half.select(
        "event_type",
        "grp",
        "o",
        F.sum("o").over(wr).alias("row_t"),
        F.sum("o").over(wc).alias("col_t"),
        F.sum("o").over(wt).alias("nn"),
    )
    o = F.col("o")
    e = F.col("row_t") * F.col("col_t") / F.col("nn")
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("nn").cast("bigint").alias("n"),
        F.round(2 * F.sum(o * F.log(o / e)), 4).alias("g_stat"),
        (
            (F.count_distinct(F.col("event_type")) - 1)
            * (F.count_distinct(F.col("grp")) - 1)
        )
        .cast("bigint")
        .alias("df"),
    )


# ---------------------------------------------------------------------------
# ts_pacf
# ---------------------------------------------------------------------------


@register("ts_pacf")  # rows-only: Durbin-Levinson is recursive (no SQL form)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily-revenue series at lags 1..7
    via Durbin–Levinson — the AR-order picker: ACF (`ts_autocorr`)
    tails off for AR processes while PACF CUTS OFF at the true order,
    so the pair identifies the model. φ_kk comes from the standard
    recursion on the ACF sequence.

    Distributed shape: the corpus collapses to one row per day in ONE
    aggregate shuffle; the ACF lags are window covariances over the
    bounded day table; the k ≤ 7 Durbin–Levinson recursion runs on the
    7-element ACF vector DRIVER-side (an O(k²) scalar loop — the same
    bounded-driver-state pattern as `emb_whitening`'s 64×64 eigh).
    Rows-only: the recursion has no SQL form; the suite pins it against
    an independent pure-python Levinson implementation and the
    lag-1 PACF ≡ ACF identity."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
    )
    wd = Window.orderBy("day")
    n_days = daily.count()
    # ACF at lags 0..7 from integer-exact moments on the bounded table
    rows = (
        daily.select(
            "rev",
            *[F.lag("rev", k).over(wd).alias(f"l{k}") for k in range(1, 8)],
        )
        .agg(
            F.avg("rev").alias("mu"),
            # decimal(19,0) squares: daily cents grow with corpus volume
            # and the BIGINT product crosses int64 near 3e9 cents/day —
            # ~100 TB flow volume (the r9 agg_hurst_exponent find, same
            # class); sums stay exact in decimal38, Python receives
            # Decimal and the float conversion happens once below
            F.sum(
                F.col("rev").cast("decimal(19,0)")
                * F.col("rev").cast("decimal(19,0)")
            ).alias("ss"),
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.col("rev").cast("decimal(19,0)")
                    * F.col(f"l{k}").cast("decimal(19,0)")
                ).alias(f"s{k}")
                for k in range(1, 8)
            ],
            *[F.count(F.col(f"l{k}")).alias(f"c{k}") for k in range(1, 8)],
            *[F.sum(F.col(f"l{k}")).alias(f"sl{k}") for k in range(1, 8)],
            *[
                F.sum(F.when(F.col(f"l{k}").isNotNull(), F.col("rev"))).alias(
                    f"sr{k}"
                )
                for k in range(1, 8)
            ],
        )
        .collect()[0]
    )
    mu, n = rows["mu"], rows["n"]
    # degenerate series (r7 edge sweep): fewer than 2 days has no lag-1
    # pair and a constant series has zero variance — PACF undefined,
    # empty result; lags beyond n-1 have no overlap and are not emitted
    max_lag = min(7, (n or 0) - 1)
    # the decimal sums arrive as Decimal — one float conversion here
    # (the statistic is float from this point on either way)
    var = (float(rows["ss"]) / n - mu * mu) if n else 0.0
    if max_lag < 1 or var <= 0:
        return spark.createDataFrame(
            [], "lag int, n_days long, acf double, pacf double"
        )
    acf = [1.0]
    for k in range(1, max_lag + 1):
        # standard ACF estimator: 1/n Σ (x_t-μ)(x_{t-k}-μ) / var
        cov = (
            float(rows[f"s{k}"]) - mu * rows[f"sl{k}"] - mu * rows[f"sr{k}"]
            + rows[f"c{k}"] * mu * mu
        ) / n
        acf.append(cov / var)
    # Durbin-Levinson on the 8-element ACF — bounded driver state
    pacf = [1.0]
    phi_prev: list[float] = []
    for k in range(1, max_lag + 1):
        if k == 1:
            phi_kk = acf[1]
            phi_prev = [phi_kk]
        else:
            num = acf[k] - sum(phi_prev[j] * acf[k - 1 - j] for j in range(k - 1))
            den = 1.0 - sum(phi_prev[j] * acf[j + 1] for j in range(k - 1))
            if den == 0.0:
                break  # perfectly predictable series: recursion exhausted
            phi_kk = num / den
            phi_prev = [
                phi_prev[j] - phi_kk * phi_prev[k - 2 - j] for j in range(k - 1)
            ] + [phi_kk]
        pacf.append(phi_kk)
    out = [
        (k, n_days, round(acf[k], 4), round(pacf[k], 4))
        for k in range(1, len(pacf))
    ]
    return spark.createDataFrame(
        out, "lag int, n_days long, acf double, pacf double"
    )


# ---------------------------------------------------------------------------
# privacy_pseudonymize
# ---------------------------------------------------------------------------


@register(
    "privacy_pseudonymize",
    oracle="""
    WITH p AS (
      SELECT user_id,
             sha256('corpus-salt-v1|' || CAST(user_id AS VARCHAR)) AS pseudo,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT pseudo) AS BIGINT) AS n_pseudonyms,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           min(pseudo) AS min_pseudo,
           max(pseudo) AS max_pseudo
    FROM p
    """,
)
def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent keyed pseudonymization: user_id ↦ SHA-256 of a salted
    encoding — deterministic, so every table pseudonymized with the
    same salt stays JOINABLE (the property tokenization must preserve),
    while the raw identifier never needs storing. The audit reports
    collision-freeness (n_pseudonyms == n_users — pinned) and event
    conservation, plus hash-range endpoints as the cross-engine
    fingerprint of the mapping itself.

    The hash is scan-local codegen (`sha2`); the audit is one user
    rollup + a 1-row summary with a two-phase distinct. In production
    the salt lives in a secret store and rotates per data-sharing
    agreement — rotating it unlinks all previously shared pseudonyms
    (the GDPR re-identification control), which is why it is a
    parameter here, not a constant folded into the data."""
    p = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.sha2(
                F.concat(F.lit("corpus-salt-v1|"), F.col("user_id").cast("string")),
                256,
            ).alias("pseudo"),
        )
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count_distinct(F.col("pseudo")).cast("bigint").alias("n_pseudonyms"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.min("pseudo").alias("min_pseudo"),
        F.max("pseudo").alias("max_pseudo"),
    )


# ---------------------------------------------------------------------------
# stats_cohens_d
# ---------------------------------------------------------------------------


@register(
    "stats_cohens_d",
    oracle="""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s,
             SUM(value * value) AS ss
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS na, b.n AS nb,
             a.s / a.n AS ma, b.s / b.n AS mb,
             (a.ss - a.s * a.s / a.n) / (a.n - 1) AS va,
             (b.ss - b.s * b.s / b.n) / (b.n - 1) AS vb
      FROM g a JOIN g b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND((ma - mb)
                 / SQRT(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)), 4)
             + 0 AS cohens_d,
           ROUND(((ma - mb)
                  / SQRT(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)))
                 * (1 - 3.0 / (4 * (na + nb) - 9)), 4) + 0 AS hedges_g
    FROM pairs ORDER BY type_a, type_b
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for every event-type pair: Cohen's d
    (mean difference over pooled SD) and Hedges' g (the small-sample
    bias correction ×(1 − 3/(4N−9))) — the 'is it MEANINGFUL?' number
    that belongs next to every `agg_welch_ttest` p-value; at corpus
    scale everything is significant, only effect sizes rank what
    matters.

    One pass of combinable per-group (n, Σx, Σx²) partials; the pair
    table is k(k−1)/2 rows of the k-row group table (self-join on the
    bounded aggregate, broadcast); the expansion-form variance keeps
    both engines' float ops identical (`stats_levene_test`
    discipline). `+ 0` canonicalizes near-zero d."""
    g = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    # try_divide on the sample variances and the pooled-SD ratio: a
    # singleton group or identical groups leave d undefined -> NULL,
    # matching DuckDB's NULL-on-zero-divisor division (r7 edge sweep)
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        (F.col("s") / F.col("n")).alias("ma"),
        F.try_divide(
            F.col("ss") - F.col("s") * F.col("s") / F.col("n"), F.col("n") - 1
        ).alias("va"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        (F.col("s") / F.col("n")).alias("mb"),
        F.try_divide(
            F.col("ss") - F.col("s") * F.col("s") / F.col("n"), F.col("n") - 1
        ).alias("vb"),
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    na, nb = F.col("na"), F.col("nb")
    pooled = F.sqrt(
        F.try_divide((na - 1) * F.col("va") + (nb - 1) * F.col("vb"), na + nb - 2)
    )
    d = F.try_divide(F.col("ma") - F.col("mb"), pooled)
    corr = 1 - 3.0 / (4 * (na + nb) - 9)
    return pairs.select(
        "type_a",
        "type_b",
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (F.round(d, 4) + F.lit(0)).alias("cohens_d"),
        (F.round(d * corr, 4) + F.lit(0)).alias("hedges_g"),
    ).orderBy("type_a", "type_b")
