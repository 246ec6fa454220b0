"""Event-time windows & dedup — batch-checkable semantics (SURVEY §2.9).

Tumbling 5-min windows mirror the reference's nfcapd rotation granularity
[P]; the same expressions run unchanged under Structured Streaming
(streaming/pipeline.py) — that symmetry is the point of Spark's unified
batch/stream model.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register


@register(
    "win_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY wstart, event_type
    """,
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-min tumbling counts (≡ one nfcapd file per window [P]).

    NULL timestamps belong to no window — pinned two-sided (Spark's
    window() drops them, DuckDB's time_bucket keeps a NULL bucket;
    EDGE_SWEEP_r10 class C)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return e.groupBy(
        F.window("ts", "5 minutes").start.alias("wstart"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


@register(
    "win_sliding",
    # An event at time t falls in two 10-min windows sliding by 5: the ones
    # starting at bucket5(t) and bucket5(t) - 5 min. The oracle re-derives
    # that membership; Spark's window() emits it directly.
    oracle="""
    WITH b AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS b5, value
               FROM events WHERE ts IS NOT NULL)
    SELECT wstart, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value FROM (
      SELECT b5 AS wstart, value FROM b
      UNION ALL
      SELECT b5 - INTERVAL 5 MINUTE AS wstart, value FROM b
    ) GROUP BY wstart
    """,
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min windows sliding every 5 min (each event in 2 windows).
    NULL-ts rows are windowless — pinned two-sided (class C)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return e.groupBy(
        F.window("ts", "10 minutes", "5 minutes").start.alias("wstart")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


@register(
    "win_session",
    # Gaps-and-islands replica of session_window semantics: a gap >= 30 min
    # starts a new session (Spark's session is [first, last+gap)).
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, ts, SUM(new_s) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, date_trunc('second', MIN(ts)) AS session_start, COUNT(*) AS n
    FROM islands GROUP BY user_id, sid
    """,
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-min inactivity gap, per user (flow/session
    stitching in batch; the streaming variant is stream_stateful).
    NULL-ts rows sessionize nowhere — pinned two-sided (class C)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_trunc("second", F.col("sw.start")).alias("session_start"),
            "n",
        )
    )


@register(
    "dedup_exact",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate removal on a key subset — hash re-partition by the
    key columns, no row comparison beyond equality."""
    return table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "dedup_keep_first",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    QUALIFY ROW_NUMBER() OVER
      (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates-keep-earliest, made deterministic with a (ts,
    event_id) ordering (SURVEY §2.9)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "ts_gap_fill",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(h) AS mn, max(h) AS mx FROM c GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT g.event_type, g.h, COALESCE(c.n, 0) AS n
    FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series with zero-filled gaps (ClickHouse `ORDER BY ...
    WITH FILL` [P]): hourly event counts per type joined onto a generated
    per-type hour grid. The grid is derived per group from its own
    [min, max] span (`sequence` + `explode` — rows generated
    executor-side, never a driver loop) and the fill join is an equi join
    on (type, hour); grid size is O(groups × span/step), independent of
    event count."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = (
        c.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    return grid.join(c, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).alias("n")
    )


@register(
    "ts_interpolate",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             AVG(value) AS v
      FROM events WHERE event_id % 7 <> 0 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(h) AS mn, max(h) AS mx FROM c GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    j AS (
      SELECT g.event_type, g.h, c.v,
             epoch(g.h) AS e
      FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
    ),
    w AS (
      SELECT event_type, h, v, e,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pe,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ne
      FROM j
    )
    SELECT event_type, h,
           floor((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (e - pe) / (ne - pe)
           END) * 10000 + 0.5 + 1e-9) / 10000 AS v_filled
    FROM w
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gaps in a time series (ClickHouse `WITH
    FILL ... INTERPOLATE` [P]): hourly avg(value) per type — with every
    7th event removed to create holes — rebuilt on a dense grid, missing
    points interpolated between the nearest observed neighbors
    (edge gaps take the nearest value). Two windows per partition
    (forward + backward ignoreNulls scans), one shuffle on event_type."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 != 0)
    c = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.avg("value").alias("v")
    )
    grid = (
        c.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    j = grid.join(c, ["event_type", "h"], "left").withColumn(
        "e", F.unix_timestamp("h")
    )
    back = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    ee = F.when(F.col("v").isNotNull(), F.col("e"))
    w = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("pe", F.last(ee, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("ne", F.first(ee, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("e") - F.col("pe"))
            / (F.col("ne") - F.col("pe"))
        )
    )
    # epsilon half-up rounding: the interpolated value can land exactly on
    # a .00005 boundary where the two engines' last-ulp difference flips
    # the 4th decimal (7 rows at sf0.1); the 1e-9 nudge absorbs ulp noise
    # (values are positive, so floor(x+0.5) is half-up)
    eps_round = F.floor(interp * 10000 + 0.5 + 1e-9) / 10000
    return w.select("event_type", "h", eps_round.alias("v_filled"))


@register(
    "win_sliding_distinct",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' * off
               AS win_start,
             user_id
      FROM events, UNNEST([0, 1]) AS t(off)
      WHERE ts IS NOT NULL
    )
    SELECT win_start, COUNT(DISTINCT user_id) AS uniq_users
    FROM b GROUP BY win_start
    """,
)
def win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique users per 10-minute window sliding every 5 — the live
    'active users' dashboard tile (ClickHouse `uniq` over overlapping
    buckets [P]). Spark's `window(ts, 10m, 5m)` assigns each row to its
    2 covering windows scan-side (an Expand, no join); the distinct
    aggregation is then the standard two-phase plan. The oracle
    re-derives window starts arithmetically (each row appears in the
    bucket it starts and the one 5 minutes earlier). NULL-ts rows are
    windowless — pinned two-sided (class C)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), )
        .agg(F.countDistinct("user_id").alias("uniq_users"))
        .select(F.col("w.start").alias("win_start"), "uniq_users")
    )
