"""Window-function operators (SURVEY §2.5).

The flows query surface's ranking/cumulative analytics (top talkers,
running byte counts, trailing-5-min traffic [P]). Every window ORDER BY
carries a unique tiebreaker (SURVEY §5.3.3). Windows partition by a key —
at scale each partition's state stays on one executor; no global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register


@register(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER w AS rnum,
           RANK() OVER w       AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-talkers ranking per partition (row_number/rank/dense_rank)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rnum"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value, 4)                    AS value,
           ROUND(LAG(value, 1)  OVER w, 4)    AS prev_value,
           ROUND(LEAD(value, 1) OVER w, 4)    AS next_value,
           LAG(event_type, 1) OVER w          AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event per user — session-reconstruction primitive."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value", 1).over(w), 4).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 4).alias("next_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum (running byte counter analog)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("mavg")
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 300 PRECEDING AND CURRENT ROW), 4) AS trailing_5min
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame: trailing-300 s sum over epoch seconds (the flows
    'traffic in the last 5 minutes' rolling query [P])."""
    e = table(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts")
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-300, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("trailing_5min"),
    )


@register(
    "win_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_nationkey,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(c_custkey) OVER w AS richest,
           LAST_VALUE(c_custkey)  OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w).alias("richest"),
        F.last("c_custkey").over(w_full).alias("poorest"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER
      (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group (ClickHouse LIMIT BY [P]) — window + filter; Spark
    optimizes to a per-partition top-k (WindowGroupLimit), no full sort."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "win_cume_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal NULLS LAST, c_custkey)
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) per
    nation, ordered by balance with the unique-key tiebreaker the
    determinism rules require (SURVEY §5.3). The balance ordering is
    pinned NULLS LAST two-sided — Spark defaults ASC NULLS FIRST,
    DuckDB ASC NULLS LAST, which shifts every rank in a mixed-NULL
    partition (EDGE_SWEEP_r10 class D)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc_nulls_last(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "win_fill_forward",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE ROUND(value, 4) END AS v
      FROM events
    )
    SELECT user_id, event_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
    FROM s
    """,
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward — pandas `ffill`,
    ClickHouse `anyLast` over ordered frames [P]): sensor/counter gaps
    take the most recent non-null reading per key. `F.last(ignorenulls)`
    over a running frame — one shuffle on user_id, the frame never
    rescans (Spark keeps a running last per partition). Nulls are
    synthesized from 'error' events so the fill path is actually
    exercised; event_id ordering keeps the frame deterministic."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.round("value", 4))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last(v, ignorenulls=True).over(w).alias("v_ffill"),
    )


@register(
    "win_ema",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id,
           ROUND(list_aggregate(
                   [l[j] * pow(0.8, len(l) - j)
                    for j in generate_series(1, len(l))],
                   'sum'), 4) + 0 AS ema
    FROM w
    """,
)
def win_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted trailing sum (ClickHouse
    `exponentialMovingAverage` [P] — the burst-smoothing rate metric):
    weight 0.8^age over the last 16 observations per user in event_id
    order. The recursive EMA definition doesn't fit a SQL frame, but the
    BOUNDED formulation does: `collect_list` over a ROWS frame (order
    deterministic — the frame is ordered by the unique event_id), then
    one aggregate HOF with positional weights. State per row is 16
    doubles — constant, so the window scales like any other ROWS frame;
    one shuffle on user_id.

    NULL readings are pinned out two-sided: Spark's collect_list drops
    NULL elements while DuckDB's list() keeps them, so a mixed-NULL
    frame otherwise disagrees on both the weights (len(l)) and the row
    set (EDGE_SWEEP_r10 class D)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    l = F.collect_list("value").over(w)
    d = e.select("user_id", "event_id", l.alias("l"))
    ema = F.aggregate(
        F.transform(
            "l",
            lambda x, i: x * F.pow(F.lit(0.8), F.size("l") - i - 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "user_id", "event_id", (F.round(ema, 4) + 0).alias("ema")
    )


@register(
    "win_nth_value",
    oracle="""
    SELECT c_custkey, c_nationkey,
           nth_value(c_acctbal, 2) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_bal
    FROM customer
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`nth_value` with a full frame: every customer row annotated with
    its nation's second-highest balance (runner-up benchmarking —
    ClickHouse `nth_value` [P]). Full-frame spec is explicit: the SQL
    default frame stops at CURRENT ROW, which silently turns nth_value
    into 'nth so far' — a classic cross-engine footgun both engines
    agree on only when spelled out. One shuffle on the partition key."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.nth_value("c_acctbal", 2).over(w).alias("second_bal"),
    )
