"""Wave-51 keys (round 5): average precision, Friedman test,
Durbin–Watson, repeat purchase, multi-measure unpivot.

- ``ml_eval_average_precision``: exact average precision (area under
  the PR curve) [P — the imbalanced-data sibling of `ml_eval_auc`:
  ROC flatters when negatives dominate, PR does not].
- ``stats_friedman_test``: Friedman rank test across related samples
  [P — Friedman 1937; the nonparametric repeated-measures ANOVA].
- ``stats_durbin_watson``: Durbin–Watson serial-correlation statistic
  on regression residuals [P — Durbin & Watson 1950; the classic
  'are my residuals independent?' gate under `agg_linreg`].
- ``events_repeat_purchase``: repeat-purchase rate + first-to-second
  latency [P — the commerce loyalty metric distinct from first
  conversion].
- ``reshape_unpivot_multi``: multi-measure unpivot [P — the wide
  metrics table → (metric, value) long form].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# ml_eval_average_precision
# ---------------------------------------------------------------------------


@register(
    "ml_eval_average_precision",
    oracle="""
    WITH scored AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT y,
             ROW_NUMBER() OVER (ORDER BY score DESC, event_id) AS rnk,
             SUM(y) OVER (ORDER BY score DESC, event_id
                          ROWS UNBOUNDED PRECEDING) AS tp
      FROM scored
    ),
    tot AS (SELECT SUM(y) AS pos, COUNT(*) AS n FROM scored)
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(tot.pos AS BIGINT) AS n_pos,
           ROUND(SUM(CASE WHEN ranked.y = 1
                     THEN ranked.tp * 1.0 / ranked.rnk ELSE 0 END)
                 / tot.pos, 4) AS average_precision,
           ROUND(tot.pos * 1.0 / tot.n, 4) AS base_rate
    FROM ranked CROSS JOIN tot
    GROUP BY tot.n, tot.pos
    HAVING tot.pos > 0
    """,
)
def ml_eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision for the value-scores-purchases ranking:
    AP = (1/P)·Σ_{hits} precision@rank — the area under the PR curve,
    and the metric that matters when positives are rare (`ml_eval_auc`'s
    ROC stays rosy as negatives flood in; AP collapses toward the base
    rate, reported alongside as the random-ranker floor).

    The ranking is one (score desc, id) global rank + running-TP
    cumsum — the shared ordered-scan shape of `ml_eval_auc`, computed
    through ``functions.distributed.binned_prefix_sums`` (r12, VERDICT
    r11 next-#4: the sampler `prefix_sums` ran FOUR serial driver
    jobs; the in-plan binned scan is ONE executed job — bin-id
    literals over the NEGATED parquet-footer [min,max] of `value`,
    offsets from a bounded nbins-row window + broadcast join, and n/P
    riding the same broadcast as columns). The AP fold is a single
    conditional aggregate over the ranked stream; the zero-positives
    guard is now the SQL filter `pos > 0` on the one aggregate row —
    exactly the oracle's HAVING tot.pos > 0 (ADVICE r6), and an empty
    input drops the row the same way (NULL pos fails the filter)."""
    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_prefix_sums

    scored = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (-F.col("value")).alias("negscore"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
            "event_id",
        )
        .withColumn("one", F.lit(1))
    )
    # asc over (−score, id) == the oracle's (score DESC, id): one pass
    # yields the inclusive running TP (_ps_y) and the 1-based global
    # rank (_ps_one) plus both grand totals as columns
    stats = parquet_column_stats(sf_dir, "events", "value")
    lo = hi = None  # stats-less footer: in-plan broadcast bounds
    if stats is not None and stats[0] is not None and stats[1] is not None:
        lo, hi = -float(stats[1]), -float(stats[0])
    ranked = binned_prefix_sums(
        scored, ["negscore", "event_id"], ["y", "one"], lo, hi,
        totals=["y", "one"],
    )
    return (
        ranked.agg(
            F.sum(
                F.when(
                    F.col("y") == 1, F.col("_ps_y") * 1.0 / F.col("_ps_one")
                ).otherwise(0.0)
            ).alias("ap_sum"),
            F.max("_ps_tot_one").alias("nc"),
            F.max("_ps_tot_y").alias("posc"),
        )
        .filter(F.col("posc") > 0)
        .select(
            F.col("nc").cast("bigint").alias("n"),
            F.col("posc").cast("bigint").alias("n_pos"),
            F.round(F.col("ap_sum") / F.col("posc"), 4).alias(
                "average_precision"
            ),
            F.round(F.col("posc") * 1.0 / F.col("nc"), 4).alias("base_rate"),
        )
    )


# ---------------------------------------------------------------------------
# stats_friedman_test
# ---------------------------------------------------------------------------


@register(
    "stats_friedman_test",
    oracle="""
    WITH cell AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT day, event_type,
             RANK() OVER (PARTITION BY day ORDER BY rev)
               + (COUNT(*) OVER (PARTITION BY day, rev) - 1) / 2.0 AS r
      FROM cell
    ),
    sums AS (
      SELECT event_type, SUM(r) AS rsum,
             (SELECT COUNT(DISTINCT day) FROM cell) AS n,
             (SELECT COUNT(DISTINCT event_type) FROM cell) AS k
      FROM ranked GROUP BY event_type
    )
    SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n_blocks,  -- 0, not NULL
           CAST(COALESCE(MAX(k), 0) AS BIGINT) AS k_treatments,
           ROUND(12.0 / (MAX(n) * MAX(k) * (MAX(k) + 1))
                 * SUM(rsum * rsum)
                 - 3 * MAX(n) * (MAX(k) + 1), 4) AS friedman_chi2
    FROM sums
    """,
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: within each DAY (the block), rank the five
    event types by revenue (average-rank ties), then
    χ² = 12/(nk(k+1))·ΣR_j² − 3n(k+1) over the per-type rank sums —
    the nonparametric repeated-measures ANOVA ('do the types rank
    consistently across days?') that `stats_anova_f` answers only
    under normality and day-independence. χ²(k−1) under the null.

    Cell table is one (day, type) aggregate; ranking runs inside ≤k-row
    day partitions (thousands of tiny partitions — the healthy window
    case); the test assembles from k rank sums. Average-rank ties via
    the (day, rev) peer-count window (`stats_spearman_corr` tie
    discipline, partition-key friendly at this cardinality)."""
    cell = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .localCheckpoint()  # ranking + n/k scalars share one compute
    )
    nk = cell.agg(
        F.count_distinct(F.col("day")).alias("n"),
        F.count_distinct(F.col("event_type")).alias("k"),
    ).collect()[0]
    n_b, k_t = nk["n"], nk["k"]
    wr = Window.partitionBy("day").orderBy("rev")
    peers = F.count(F.lit(1)).over(Window.partitionBy("day", "rev"))
    ranked = cell.select(
        "event_type", (F.rank().over(wr) + (peers - 1) / 2.0).alias("r")
    )
    sums = ranked.groupBy("event_type").agg(F.sum("r").alias("rsum"))
    # an empty design (no blocks or no treatments) leaves chi2 undefined
    # -> NULL, matching the oracle's NULL algebra (r7 edge sweep: the
    # literal division by n·k·(k+1)=0 raised under ANSI)
    denom = n_b * k_t * (k_t + 1)
    chi2 = (
        F.round(
            F.lit(12.0) / denom * F.sum(F.col("rsum") * F.col("rsum"))
            - 3 * n_b * (k_t + 1),
            4,
        )
        if denom
        else F.lit(None).cast("double")
    )
    return sums.agg(
        F.lit(n_b).cast("bigint").alias("n_blocks"),
        F.lit(k_t).cast("bigint").alias("k_treatments"),
        chi2.alias("friedman_chi2"),
    )


# ---------------------------------------------------------------------------
# stats_durbin_watson
# ---------------------------------------------------------------------------


@register(
    "stats_durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev,
             ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(t) AS st, SUM(rev) AS sr,
             SUM(t * t) AS stt, SUM(t * rev) AS str_
      FROM daily
    ),
    beta AS (
      SELECT (str_ - st * sr * 1.0 / n) / (stt - st * st * 1.0 / n) AS b1,
             sr * 1.0 / n
               - (str_ - st * sr * 1.0 / n)
                 / (stt - st * st * 1.0 / n) * st / n AS b0
      FROM m
    ),
    resid AS (
      SELECT d.t, d.rev - beta.b0 - beta.b1 * d.t AS e
      FROM daily d CROSS JOIN beta
    ),
    lagged AS (
      SELECT e, LAG(e) OVER (ORDER BY t) AS ep FROM resid
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           ROUND(SUM(CASE WHEN ep IS NOT NULL
                     THEN (e - ep) * (e - ep) ELSE 0 END)
                 / SUM(e * e), 4) AS dw_stat
    FROM lagged
    """,
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson on the residuals of the daily-revenue-vs-time OLS:
    DW = Σ(e_t − e_{t−1})²/Σe_t² ∈ [0, 4] — ≈2 means independent
    residuals, <2 positive serial correlation (the common case that
    makes OLS confidence intervals too narrow), >2 negative. The
    classic time-ordered gate completing the regression-validity
    ladder (fit → normality `stats_jarque_bera` → homoscedasticity
    `stats_breusch_pagan` → independence THIS; `stats_ljung_box` is
    its multi-lag generalization).

    Betas from a 1-row moment pass broadcast back; residuals, the lag
    window and both sums all live on the bounded day table."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
        .localCheckpoint()  # moment pass + residual pass share it
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("rev").alias("sr"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("rev")).alias("str_"),
    ).collect()[0]
    n = m["n"]
    # degenerate series (r7 edge sweep): zero days has no moments and a
    # single day has zero time-variance — the trend fit is undefined, so
    # the residuals (and DW) go NULL, matching the oracle's NULL algebra
    den = (m["stt"] - m["st"] ** 2 / n) if n else 0.0
    if n and den:
        b1 = (m["str_"] - m["st"] * m["sr"] / n) / den
        b0 = m["sr"] / n - b1 * m["st"] / n
    else:
        b1 = b0 = None
    resid = daily.select(
        "t",
        (
            F.col("rev") - F.lit(b0).cast("double")
            - F.lit(b1).cast("double") * F.col("t")
        ).alias("e"),
    )
    lagged = resid.select(
        "e", F.lag("e").over(Window.orderBy("t")).alias("ep")
    )
    return lagged.agg(
        F.lit(n).cast("bigint").alias("n_days"),
        F.round(
            # try_divide: a perfect fit (all residuals zero) leaves DW
            # undefined -> NULL, matching DuckDB (r7 edge sweep)
            F.try_divide(
                F.sum(
                    F.when(
                        F.col("ep").isNotNull(),
                        (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")),
                    ).otherwise(0.0)
                ),
                F.sum(F.col("e") * F.col("e")),
            ),
            4,
        ).alias("dw_stat"),
    )


# ---------------------------------------------------------------------------
# events_repeat_purchase
# ---------------------------------------------------------------------------


@register(
    "events_repeat_purchase",
    oracle="""
    WITH buys AS (
      SELECT user_id, epoch_us(ts) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nth
      FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (
      SELECT user_id,
             MAX(CASE WHEN nth = 1 THEN t END) AS t1,
             MAX(CASE WHEN nth = 2 THEN t END) AS t2,
             MAX(nth) AS n_buys
      FROM buys GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
           -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
           CAST(COALESCE(count_if(n_buys >= 2), 0) AS BIGINT) AS n_repeat,
           CAST(10000 * count_if(n_buys >= 2) // COUNT(*) AS BIGINT)
             AS repeat_bp,
           ROUND(AVG(CASE WHEN t2 IS NOT NULL
                     THEN (t2 - t1) / 3600e6 END), 4) AS mean_gap_h,
           ROUND(quantile_cont(CASE WHEN t2 IS NOT NULL
                               THEN (t2 - t1) / 3600e6 END, 0.5), 4)
             AS p50_gap_h
    FROM firsts
    """,
)
def events_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase economics: share of buyers who buy AGAIN and the
    first-to-second purchase latency (mean + exact median hours) — the
    loyalty metric that predicts LTV better than first conversion
    (`events_time_to_convert` measures acquisition; this measures the
    habit). The nth-purchase window also generalizes to any 'time to
    Nth action' question.

    One user-partitioned purchase ordering (purchases only — the
    window input is pre-filtered to the small slice), a conditional
    first/second extraction per user, and a 1-row summary with exact
    percentile; µs integers until the hour division."""
    buys = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("t"), "event_id")
        .withColumn(
            "nth",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("t", "event_id")
            ),
        )
    )
    firsts = buys.groupBy("user_id").agg(
        F.max(F.when(F.col("nth") == 1, F.col("t"))).alias("t1"),
        F.max(F.when(F.col("nth") == 2, F.col("t"))).alias("t2"),
        F.max("nth").alias("n_buys"),
    )
    gap_h = F.when(
        F.col("t2").isNotNull(), (F.col("t2") - F.col("t1")) / F.lit(3600e6)
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        F.count_if(F.col("n_buys") >= 2).cast("bigint").alias("n_repeat"),
        F.expr(
            # zero buyers: share undefined -> NULL, the value DuckDB's `//`
            # yields on a zero divisor (r7 edge sweep — DIV raised)
            "CASE WHEN count(1) = 0 THEN NULL ELSE"
            " 10000 * count_if(n_buys >= 2) DIV count(1) END"
        )
        .cast("bigint")
        .alias("repeat_bp"),
        F.round(F.avg(gap_h), 4).alias("mean_gap_h"),
        F.round(F.expr(
            "percentile(CASE WHEN t2 IS NOT NULL"
            " THEN (t2 - t1) / 3600e6 END, 0.5)"
        ), 4).alias("p50_gap_h"),
    )


# ---------------------------------------------------------------------------
# reshape_unpivot_multi
# ---------------------------------------------------------------------------


@register(
    "reshape_unpivot_multi",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag AS flag,
             ROUND(SUM(l_extendedprice), 2) AS revenue,
             ROUND(SUM(l_quantity), 2) AS quantity,
             ROUND(AVG(l_discount), 6) AS avg_discount,
             COUNT(*) * 1.0 AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, metric, ROUND(val, 4) AS value
    FROM wide
    UNPIVOT (val FOR metric IN (revenue, quantity, avg_discount, n_items))
    ORDER BY flag, metric
    """,
)
def reshape_unpivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure unpivot: a wide per-flag metrics row (revenue,
    quantity, avg discount, item count) melts into (flag, metric,
    value) long form — the reshape every metrics store and charting
    layer wants, and the multi-column generalization of
    `reshape_unpivot`'s single measure. Spark's native `unpivot` API
    maps to the same UNPIVOT clause DuckDB runs.

    The wide table is one grouped aggregate (k rows); the unpivot is a
    plan-level Expand over it — metadata work, no extra shuffle
    (plan-pinned)."""
    wide = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("quantity"),
            F.round(F.avg("l_discount"), 6).alias("avg_discount"),
            (F.count(F.lit(1)) * 1.0).alias("n_items"),
        )
    )
    long = wide.unpivot(
        ids=["flag"],
        values=["revenue", "quantity", "avg_discount", "n_items"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    # SQL-standard UNPIVOT (and DuckDB's) EXCLUDES NULL cells; Spark's
    # unpivot keeps them — align by dropping NULL values (r8 nullmix
    # sweep: an all-NULL metric in a group diverged row counts)
    return (
        long.filter(F.col("val").isNotNull())
        .select("flag", "metric", F.round("val", 4).alias("value"))
        .orderBy("flag", "metric")
    )
