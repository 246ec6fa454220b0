"""Wave-36 keys (round 5): random projection, activity heatmap, runs
test, physical-layout SQL, cart abandonment.

- ``emb_random_projection``: Johnson–Lindenstrauss sign-projection
  [P — Achlioptas 2003 database-friendly random projections] with a
  measured distance-distortion report.
- ``events_heatmap_hour_dow``: the hour × day-of-week activity matrix
  [P — the standard operations dashboard heatmap].
- ``stats_runs_test``: Wald–Wolfowitz runs test for randomness of the
  daily up/down revenue sequence [P — Wald & Wolfowitz 1940].
- ``sql_distribute_cluster_by``: DISTRIBUTE BY / SORT BY — Spark's
  SQL surface for physical layout control (the repartition +
  sortWithinPartitions pair), verified by per-partition sortedness.
- ``events_cart_abandonment``: session-level view-without-purchase
  rate [P — standard e-commerce funnel health metric].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# emb_random_projection
# ---------------------------------------------------------------------------

_JL_K = 16  # target dimensionality
_JL_MULT = 2654435761


@register(
    "emb_random_projection",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2,
             CAST(a.embedding AS DOUBLE[]) AS e1,
             CAST(b.embedding AS DOUBLE[]) AS e2
      FROM embeddings a JOIN embeddings b
        ON a.vec_id < 30 AND b.vec_id < 30 AND a.vec_id < b.vec_id
    ),
    proj AS (
      SELECT id1, id2,
             SQRT(list_sum(list_transform(
               generate_series(1, len(e1)),
               i -> POW(e1[i] - e2[i], 2)))) AS d_orig,
             SQRT(list_sum(list_transform(
               generate_series(1, {_JL_K}),
               j -> POW(list_sum(list_transform(
                      generate_series(1, len(e1)),
                      i -> (e1[i] - e2[i])
                           * (CASE WHEN (((i * 73856093 + j * 19349663)
                                          % 2147483648)
                                         * {_JL_MULT}) % 4294967296
                                        < 2147483648
                              THEN 1.0 ELSE -1.0 END))), 2))))
               / SQRT(CAST({_JL_K} AS DOUBLE)) AS d_proj
      FROM pairs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ABS(d_proj / d_orig - 1)), 4) AS mean_distortion,
           ROUND(MAX(ABS(d_proj / d_orig - 1)), 4) AS max_distortion,
           ROUND(AVG(d_proj / d_orig), 4) AS mean_ratio
    FROM proj WHERE d_orig > 0
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign projection 64 → 16 dims with a
    measured distortion report over a 30-vector pair sample: the
    projection matrix is R[i,j] = ±1 from a deterministic integer hash
    of (i, j) (Achlioptas' database-friendly construction — no Gaussian
    sampling, REPRODUCIBLE across engines/reruns), distances scale by
    1/√k, and the report is mean/max |d_proj/d_orig − 1|. JL is the
    cheap scale path under every ANN stack here: project once, index
    in 16 dims, re-rank survivors in 64.

    The projection is row-local array-HOF codegen (transform over a
    generate-range — the `emb_pq_quantize` nested-literal lesson: no
    per-cell expression explosion); the 30×29/2 pair sample broadcasts.
    Both engines compute the SAME ±1 matrix from the same integer
    arithmetic — nothing is random at execution time."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).filter(F.col("vec_id") < 30)
    a = e.select(F.col("vec_id").alias("id1"), F.col("emb").alias("e1"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("emb").alias("e2"))
    pairs = F.broadcast(a).join(b, F.col("id1") < F.col("id2"))
    diff = F.zip_with("e1", "e2", lambda x, y: x - y)
    d_orig = F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )

    def sign(i, j):
        # ±1 from the Knuth multiplicative hash of (i, j); i is 1-based.
        # The % 2^31 reduction BEFORE the multiply keeps the product
        # inside int64 — without it ANSI mode overflows while DuckDB
        # silently widens to HUGEINT (engines must share the formula)
        h1 = (
            i.cast("bigint") * F.lit(73856093) + j * F.lit(19349663)
        ) % F.lit(2147483648)
        h = h1 * F.lit(_JL_MULT)
        return F.when(h % F.lit(4294967296) < F.lit(2147483648), F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )

    def proj_coord(j):
        # sum_i diff[i] * R[i, j] — one fold over the 64-dim difference
        return F.aggregate(
            F.zip_with(
                diff,
                F.transform(F.sequence(F.lit(1), F.size("e1")), lambda i: i),
                lambda d, i: d * sign(i, F.lit(j)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    d_proj = (
        F.sqrt(
            sum(proj_coord(j) * proj_coord(j) for j in range(1, _JL_K + 1))
        )
        / F.lit(float(_JL_K) ** 0.5)
    )
    scored = pairs.select(
        d_orig.alias("d_orig"), d_proj.alias("d_proj")
    ).filter(F.col("d_orig") > 0)
    r = F.col("d_proj") / F.col("d_orig")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(F.abs(r - 1)), 4).alias("mean_distortion"),
        F.round(F.max(F.abs(r - 1)), 4).alias("max_distortion"),
        F.round(F.avg(r), 4).alias("mean_ratio"),
    )


# ---------------------------------------------------------------------------
# events_heatmap_hour_dow
# ---------------------------------------------------------------------------


@register(
    "events_heatmap_hour_dow",
    oracle="""
    WITH c AS (
      SELECT dayofweek(ts) + 1 AS dow,  -- DuckDB 0=Sun -> Spark 1=Sun
             EXTRACT(hour FROM ts) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS nn FROM c)
    SELECT CAST(dow AS INT) AS dow, CAST(hour AS INT) AS hour,
           CAST(n AS BIGINT) AS n,
           CAST(10000 * n // tot.nn AS BIGINT) AS share_bp
    FROM c CROSS JOIN tot ORDER BY dow, hour
    """,
)
def events_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hour × day-of-week activity heatmap — the operations
    dashboard that shows weekly seasonality at a glance (pairs with
    `agg_weekday_seasonality`'s one-dimensional form and
    `agg_circular_stats`' circular mean). Cell shares in integer basis
    points.

    One (dow, hour) aggregate — at most 168 groups whatever the corpus
    size; the share normalizer is a window over the 168-row result (a
    sibling aggregate would re-scan the input — the `stats_benford_test`
    lesson). The dow numbering trap is explicit: Spark `dayofweek` is
    1=Sunday, DuckDB's is 0=Sunday — the oracle shifts (+1) rather than
    both sides agreeing by luck (§8 catalog)."""
    from pyspark.sql import Window

    c = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        c.withColumn("nn", F.sum("n").over(wt))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("hour").cast("int").alias("hour"),
            F.col("n").cast("bigint").alias("n"),
            F.expr("10000 * n DIV nn").cast("bigint").alias("share_bp"),
        )
        .orderBy("dow", "hour")
    )


# ---------------------------------------------------------------------------
# stats_runs_test
# ---------------------------------------------------------------------------


@register(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events GROUP BY 1
    ),
    diffs AS (
      SELECT day, rev - LAG(rev) OVER (ORDER BY day) AS d FROM daily
    ),
    signs AS (
      SELECT day, (d > 0) AS up FROM diffs WHERE d IS NOT NULL AND d <> 0
    ),
    flags AS (
      SELECT up,
             CASE WHEN up IS DISTINCT FROM
                       LAG(up) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ),
    agg AS (
      SELECT COUNT(*) AS n,
             count_if(up) AS n_up,
             count_if(NOT up) AS n_down,
             SUM(new_run) AS runs
      FROM flags
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(runs AS BIGINT) AS runs,
           ROUND(1.0 + 2.0 * n_up * n_down / n, 4) AS expected_runs,
           ROUND((runs - (1.0 + 2.0 * n_up * n_down / n))
                 / SQRT(2.0 * n_up * n_down * (2.0 * n_up * n_down - n)
                        / (n * n * (n - 1.0))), 4) AS z
    FROM agg
    WHERE 2 * n_up * n_down > n  -- validity gate, mirrored engine-side
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily-revenue up/down sequence:
    count maximal runs of consecutive same-direction moves and compare
    to the randomness expectation 1 + 2·n₊·n₋/n with its normal
    approximation — too FEW runs means trending, too MANY means
    mean-reverting oscillation; either way the 'independent random
    days' assumption behind naive daily CIs is violated.

    Daily revenue in integer cents (ties excluded exactly, not by
    float luck); the run-boundary flag is one lag window over the
    bounded days table; the test statistic assembles from a 1-row
    aggregate. The oracle uses IS DISTINCT FROM for the first row's
    NULL lag — both engines count the first sign as a new run."""
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
    wd = Window.orderBy("day")
    diffs = daily.select(
        "day", (F.col("rev") - F.lag("rev").over(wd)).alias("d")
    )
    signs = diffs.filter(F.col("d").isNotNull() & (F.col("d") != 0)).select(
        "day", (F.col("d") > 0).alias("up")
    )
    flags = signs.select(
        "up",
        F.when(
            ~F.col("up").eqNullSafe(F.lag("up").over(Window.orderBy("day"))),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("up")).alias("n_up"),
        F.count_if(~F.col("up")).alias("n_down"),
        F.sum("new_run").alias("runs"),
    ).filter(
        # test validity gate, mirrored in the oracle (r7 edge sweep):
        # sigma² = 2·n₊·n₋·(2·n₊·n₋−n)/(n²(n−1)) > 0 requires
        # 2·n₊·n₋ > n; below that (zero/one sign, all-same-direction)
        # z is undefined and both engines emit no row
        2 * F.col("n_up") * F.col("n_down") > F.col("n")
    )
    n, nu, nd, r = F.col("n"), F.col("n_up"), F.col("n_down"), F.col("runs")
    mu = 1.0 + 2.0 * nu * nd / n
    sigma = F.sqrt(
        2.0 * nu * nd * (2.0 * nu * nd - n) / (n * n * (n - 1.0))
    )
    return agg.select(
        n.cast("bigint").alias("n"),
        nu.cast("bigint").alias("n_up"),
        nd.cast("bigint").alias("n_down"),
        r.cast("bigint").alias("runs"),
        F.round(mu, 4).alias("expected_runs"),
        F.round((r - mu) / sigma, 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# sql_distribute_cluster_by
# ---------------------------------------------------------------------------


@register("sql_distribute_cluster_by")  # rows-only: layout, not values
def sql_distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark SQL's physical-layout surface: `DISTRIBUTE BY` (hash
    repartition) + `SORT BY` (within-partition sort) — together the
    SQL spelling of `repartition().sortWithinPartitions()`, the layout
    step before bucketed writes, merge-friendly sinks, or any operator
    that wants co-located, locally-ordered input WITHOUT a global sort
    barrier. (CLUSTER BY = DISTRIBUTE BY + SORT BY on the same keys.)

    The key runs the SQL form and then VERIFIES the contract from the
    result itself: per-partition rows must be locally sorted by the
    SORT BY key and every event_type must land in exactly one
    partition — reported as a summary the suite pins. This is a
    layout demo (rows-only): the VALUES are just the events table."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    ev.createOrReplaceTempView("sf_dist_events")
    laid = spark.sql(
        """
        SELECT event_type, event_id,
               spark_partition_id() AS pid
        FROM (
          SELECT * FROM sf_dist_events
          DISTRIBUTE BY event_type SORT BY event_type, event_id
        )
        """
    )
    # per-partition sortedness: event_id must be non-decreasing within
    # (pid, event_type) in physical row order — checked via a
    # monotonic-violation count computed per partition
    import pandas as pd

    def check(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            viol = 0
            for _, g in pdf.groupby("event_type", sort=False):
                viol += int((g.event_id.diff().dropna() < 0).sum())
            yield pd.DataFrame(
                {
                    "pid": [int(pdf.pid.iloc[0])],
                    "n_rows": [len(pdf)],
                    "n_types": [pdf.event_type.nunique()],
                    "sort_violations": [viol],
                }
            )

    per_part = laid.mapInPandas(
        check, "pid int, n_rows long, n_types int, sort_violations long"
    )
    return per_part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("sort_violations").cast("bigint").alias("sort_violations"),
        F.sum("n_types").cast("bigint").alias("sum_types_over_parts"),
        F.count_distinct(F.col("pid")).cast("bigint").alias("n_distinct_pids"),
    )


# ---------------------------------------------------------------------------
# events_cart_abandonment
# ---------------------------------------------------------------------------


@register(
    "events_cart_abandonment",
    oracle="""
    WITH sess AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
             count_if(event_type = 'view') > 0 AS viewed,
             count_if(event_type = 'purchase') > 0 AS bought
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           CAST(count_if(viewed) AS BIGINT) AS n_viewing_sessions,
           CAST(count_if(viewed AND NOT bought) AS BIGINT) AS n_abandoned,
           CAST(count_if(viewed AND bought) AS BIGINT) AS n_converted,
           CAST(10000 * count_if(viewed AND NOT bought)
                // greatest(count_if(viewed), 1) AS BIGINT)
             AS abandonment_bp
    FROM sess GROUP BY day ORDER BY day
    """,
)
def events_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment per day: a (user, day) session that VIEWED but
    never PURCHASED is abandoned; report viewing sessions, abandoned vs
    converted, and the abandonment share in integer basis points — the
    session-level complement to `events_funnel` (event-level rate) and
    `events_time_to_convert` (latency of those who did).

    Session flags come from ONE (day, user) conditional-count rollup
    (no per-type self-join), the day report from a second bounded
    aggregate — all-integer, the `events_frequency_capping` shape."""
    sess = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .agg(
            (F.count_if(F.col("event_type") == "view") > 0).alias("viewed"),
            (F.count_if(F.col("event_type") == "purchase") > 0).alias("bought"),
        )
    )
    v, b = F.col("viewed"), F.col("bought")
    return (
        sess.groupBy("day")
        .agg(
            F.count_if(v).cast("bigint").alias("n_viewing_sessions"),
            F.count_if(v & ~b).cast("bigint").alias("n_abandoned"),
            F.count_if(v & b).cast("bigint").alias("n_converted"),
            F.expr(
                "10000 * count_if(viewed AND NOT bought)"
                " DIV greatest(count_if(viewed), 1)"
            )
            .cast("bigint")
            .alias("abandonment_bp"),
        )
        .orderBy("day")
    )
