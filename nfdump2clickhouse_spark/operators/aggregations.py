"""Aggregation operators (SURVEY §2.4).

The reference's analytical surface is ClickHouse SQL over the flows table
(SURVEY §0 [P]); these keys re-express that surface on the driver fixtures.
Catalyst splits every groupBy into partial (map-side) + final hash
aggregation automatically — at 100 TB the shuffle carries only the
per-group partial states, not rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W

from ..catalog import table
from ..registry import register


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
      ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
      ROUND(AVG(l_discount), 4)                                        AS avg_disc,
      COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 shape = the flows 'traffic per class' query.

    In the reference world this is `SELECT ... sum(ibyt), sum(ipkt) ...
    GROUP BY flowsrc, pr` over nfsen.flows [P]; here on lineitem.
    """
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_groupby_time",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket,
           event_type,
           ROUND(SUM(value), 4) AS sum_value,
           COUNT(*)             AS n
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY bucket, event_type
    """,
)
def agg_groupby_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical flows dashboard query: traffic per 10-min bucket per
    type (ClickHouse `toStartOfTenMinutes` [P]). NULL timestamps belong
    to no bucket — pinned two-sided (EDGE_SWEEP_r10 class C)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(
            F.window("ts", "10 minutes").start.alias("bucket"), "event_type"
        )
        .agg(F.round(F.sum("value"), 4).alias("sum_value"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (ClickHouse `uniqExact` [P]): distinct sources per
    class. Two-phase distinct-agg shuffle; scale path is approx below."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n")
    )


@register("agg_approx_distinct")  # rows-only: HLL sketches differ by engine
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality (ClickHouse `uniq` [P]) — the 100 TB path for
    distinct-count: no shuffle of raw values, only sketch merge."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4)
             AS purchase_value,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sumIf/countIf [P] — single-pass conditional aggregates."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 4
        ).alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
           ROUND(SUM(o_totalprice), 4) AS total, COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP(yr, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("int")
    )
    return o.rollup("yr", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 4) AS total, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           ROUND(SUM(o_totalprice), 4) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets + grouping_id via the SQL entry point (E1'
    SURVEY §3.2) — exercises spark.sql over registered views."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               ROUND(SUM(o_totalprice), 4) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_quantile",
    # Flat scalar columns (p50, p90), not an array: the driver canonicalizer
    # sorts the pandas result frame and cannot factorize list cells
    # (VERDICT r1 wrong-#1).
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY event_type
    """,
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (ClickHouse `quantile` [P])."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
    )


@register("agg_percentile_approx")  # rows-only: sketch algorithms differ
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantile — the 100 TB path (t-digest-style, mergeable).
    Scalar output columns so the driver harness can canonicalize."""
    e = table(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.9], 10000)
    return e.groupBy("event_type").agg(
        F.element_at(pcts, 1).alias("p50_approx"),
        F.element_at(pcts, 2).alias("p90_approx"),
    )


@register(
    "agg_argmax",
    # events.value has 2-dp precision so ties are real; the ordering key is
    # (value, event_id) on both sides. DuckDB's arg_max can't take a struct
    # key, so the oracle states the same semantics as a window.
    oracle="""
    SELECT user_id, top_event, bottom_event, max_value FROM (
      SELECT user_id,
             FIRST_VALUE(event_id) OVER
               (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS top_event,
             FIRST_VALUE(event_id) OVER
               (PARTITION BY user_id ORDER BY value ASC, event_id ASC)  AS bottom_event,
             ROUND(MAX(value) OVER (PARTITION BY user_id), 4)           AS max_value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse argMax/argMin [P] → Spark max_by/min_by with a composite
    (value, event_id) ordering key for tie determinism (SURVEY §5.3.3)."""
    e = table(spark, sf_dir, "events")
    ord_key = F.struct(F.col("value"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_id", ord_key).alias("top_event"),
        F.min_by("event_id", ord_key).alias("bottom_event"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


@register(
    "agg_collect_sorted",
    # Rendered as one comma-joined string: the driver canonicalizer cannot
    # sort list-valued cells (VERDICT r1 wrong-#1); the sorted join keeps
    # the result deterministic and hashable on both engines.
    oracle="""
    SELECT user_id,
           COALESCE(array_to_string(
             list(DISTINCT event_type ORDER BY event_type)
               FILTER (WHERE event_type IS NOT NULL), ','), '') AS types
    FROM events GROUP BY user_id
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation, canonicalized by sort (SURVEY §5.3). NULL
    types are ignored on both engines (Spark's collect_set drops NULLs
    natively; the oracle mirrors with FILTER + COALESCE so an all-NULL
    group renders '' like Spark's empty set; EDGE_SWEEP_r10 class D)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types")
    )


@register(
    "agg_stddev_var",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4)              AS sd_qty,
           ROUND(var_samp(l_discount), 4)                 AS var_disc,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    # corr as try_divide(covar, sx*sy): the builtin F.corr THROWS under
    # ANSI when a column is constant (constk fixture) where DuckDB corr
    # yields NULL (r9 edge batch; the `stats_spearman_corr` rewrite).
    # The stddevs condition on the OTHER column being non-null so the
    # moments run over the same pairwise-complete set DuckDB's corr
    # uses — identical to the plain stddev when NULLs are absent.
    sx = F.stddev_samp(
        F.when(F.col("l_extendedprice").isNotNull(), F.col("l_quantity"))
    )
    sy = F.stddev_samp(
        F.when(F.col("l_quantity").isNotNull(), F.col("l_extendedprice"))
    )
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 4).alias("var_disc"),
        # "+ 0": corr can round to -0.0 (SURVEY §8 recipe)
        (
            F.round(
                F.try_divide(
                    F.covar_samp("l_quantity", "l_extendedprice"), sx * sy
                ),
                4,
            )
            + 0
        ).alias("corr_qty_price"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click'
                 THEN epoch_us(ts) END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(ts) END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN first_click IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
           CAST(SUM(CASE WHEN first_click IS NOT NULL
                          AND first_purchase > first_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN first_click IS NOT NULL
                           AND first_purchase > first_click
                     THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN first_click IS NOT NULL
                              THEN 1 ELSE 0 END), 0), 4) AS conv_rate
    FROM u
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel (click → later purchase) per user,
    collapsed to corpus-level rates — the canonical event-analytics
    query (ClickHouse ships `windowFunnel` for it [P]). One shuffle:
    conditional-min per user is a partial+final hash aggregate, the
    final global rollup is a single-row reduce. Timestamps compare as
    `unix_micros` — both engines floor the fixture's ns parquet to µs,
    so the strict inequality is bit-identical (SURVEY §5.3.2). The
    ratio needs no epsilon rounding: it's a quotient of exact ints."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", us)).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "first_purchase"
        ),
    )
    clicked = F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
    converted = F.when(
        F.col("first_click").isNotNull()
        & (F.col("first_purchase") > F.col("first_click")),
        1,
    ).otherwise(0)
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(clicked).alias("n_clicked"),
        F.sum(converted).alias("n_converted"),
        F.round(
            F.sum(converted) * 1.0 / F.nullif(F.sum(clicked), F.lit(0)), 4
        ).alias("conv_rate"),
    )


@register("agg_freq_items")  # rows-only: Karp one-pass sketch, engine-specific sets
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (ClickHouse `topK` [P]): single-pass
    Karp-Schenker-Papadimitriou frequent-items sketch over two columns at
    once (`df.stat.freqItems`) — the constant-memory scan you run instead
    of a full groupBy-count when you only need 'which values are hot'
    (support 5%). One job, no shuffle of the raw rows; the exact
    verification path for small keyspaces is `topk_global`."""
    l = table(spark, sf_dir, "lineitem")
    out = l.stat.freqItems(["l_returnflag", "l_linestatus"], support=0.05)
    # comma-joined strings, not arrays: the driver canonicalizer cannot
    # sort list-valued cells (VERDICT r1 wrong-#1)
    return out.select(
        F.array_join(F.array_sort(F.col("l_returnflag_freqItems")), ",").alias(
            "hot_returnflags"
        ),
        F.array_join(F.array_sort(F.col("l_linestatus_freqItems")), ",").alias(
            "hot_linestatuses"
        ),
    )


@register(
    "agg_bit_ops",
    oracle="""
    SELECT l_returnflag,
           BIT_AND(l_partkey) AS key_bit_and,
           BIT_OR(l_partkey)  AS key_bit_or,
           BIT_XOR(l_partkey) AS key_bit_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (ClickHouse `groupBitAnd/Or/Xor` [P]) — used on
    flag masks / feature bitmaps. Pure partial+final hash agg: the shuffle
    carries one 64-bit state per (group, agg), independent of row count."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bit_and("l_partkey").alias("key_bit_and"),
        F.bit_or("l_partkey").alias("key_bit_or"),
        F.bit_xor("l_partkey").alias("key_bit_xor"),
    )


@register(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY event_type, hr
    )
    SELECT event_type,
           ROUND(LOG2(SUM(n)) - SUM(n * LOG2(n)) / SUM(n), 4) AS hour_entropy
    FROM c GROUP BY event_type
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the hour-of-day distribution per event type
    (ClickHouse `entropy` [P]) — the 'is this traffic periodic or uniform'
    detector. Formulated as H = log2(N) - sum(n*log2 n)/N over per-value
    counts: two cascaded hash aggs (the second over ≤ 24·|types| rows), no
    window, no second scan."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    n, logn = F.sum("n"), F.sum(F.col("n") * F.log2("n"))
    return c.groupBy("event_type").agg(
        F.round(F.log2(n) - logn / n, 4).alias("hour_entropy")
    )


@register(
    "agg_sum_map",
    # Emitted exploded — one (day, map_key, map_val) row per map entry —
    # because the driver canonicalizer cannot sort array cells (VERDICT r1
    # wrong-#1). Same sumMap content; the map assembly (collect to sorted
    # parallel arrays) is exercised and then re-exploded so both shapes
    # stay covered by one plan.
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type AS map_key,
           ROUND(SUM(value), 4) AS map_val
    FROM events GROUP BY day, map_key
    """,
)
def agg_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sumMap` analog: per day, sum `value` by `event_type` key.
    The canonical sumMap output is parallel sorted key/value arrays; we
    build exactly that (collect_list of structs, array_sort), then explode
    back to flat rows for the harness. Two shuffles, the second over one
    row per (day, type) pair — cheap at any scale; the map never
    materializes per-row, only per-group."""
    e = table(spark, sf_dir, "events")
    per = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    pairs = F.array_sort(F.collect_list(F.struct("event_type", "v")))
    maps = per.groupBy("day").agg(pairs.alias("kv"))
    ex = maps.select("day", F.explode("kv").alias("p"))
    return ex.select(
        "day", F.col("p.event_type").alias("map_key"), F.col("p.v").alias("map_val")
    )


@register(
    "agg_delta_sum",
    oracle="""
    WITH d AS (
      SELECT event_type,
             value - LAG(value) OVER (PARTITION BY event_type ORDER BY event_id) AS dv
      FROM events
    )
    SELECT event_type,
           ROUND(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END), 4) AS delta_sum
    FROM d GROUP BY event_type
    """,
)
def agg_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `deltaSum` [P]: sum of positive deltas along each
    type's event sequence — the counter-reset-tolerant rate metric
    (SNMP/NetFlow counters wrap; only upward movement counts). Ordered
    by the unique event_id (arrival sequence), not raw ts, so the lag
    window is deterministic across engines regardless of the fixture's
    timestamp precision (SURVEY §5.3.2). One shuffle for the window,
    then the groupBy reuses the same partitioning — Catalyst plans no
    second Exchange."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    dv = F.col("value") - F.lag("value").over(w)
    return (
        e.select("event_type", dv.alias("dv"))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.when(F.col("dv") > 0, F.col("dv")).otherwise(0.0)), 4
            ).alias("delta_sum")
        )
    )


@register(
    "agg_quantile_weighted",
    oracle="""
    WITH w AS (
      SELECT event_type, value, (user_id % 10) + 1 AS wt, event_id FROM events
    ),
    c AS (
      SELECT event_type, value,
             SUM(wt) OVER (PARTITION BY event_type ORDER BY value, event_id
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY event_type) AS tw
      FROM w
    )
    SELECT event_type, ROUND(MIN(value), 4) AS wmedian
    FROM c WHERE cw >= 0.5 * tw GROUP BY event_type
    """,
)
def agg_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `quantileExactWeighted(0.5)` [P]: weighted median —
    smallest value whose cumulative weight reaches half the total
    (weights synthesized from user_id; in flows terms, byte-weighted
    median packet size). The cumulative and total sums are integer, so
    the threshold comparison is exact; (value, event_id) ordering makes
    the scan order engine-independent. One shuffle: both windows and
    the final groupBy share the event_type partitioning."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select(
        "event_type", "value", ((F.col("user_id") % 10) + 1).alias("wt"), "event_id"
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    c = e.select(
        "event_type",
        "value",
        F.sum("wt").over(cum).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.filter(F.col("cw") >= 0.5 * F.col("tw"))
        .groupBy("event_type")
        .agg(F.round(F.min("value"), 4).alias("wmedian"))
    )


@register(
    "agg_avg_foreach",
    # Emitted as flat (label, pos, v) rows — the driver canonicalizer
    # cannot sort array cells (VERDICT r1 wrong-#1). DuckDB
    # generate_subscripts is 1-based; Spark posexplode is 0-based, so the
    # Spark side adds 1 to align.
    oracle="""
    WITH ex AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    )
    SELECT label, pos, ROUND(AVG(val), 4) + 0 AS v FROM ex GROUP BY label, pos
    """,
)
def agg_avg_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `avgForEach` [P]: element-wise mean of array columns
    per group — the centroid builder (also the k-means update step the
    IVF index in ann.py iterates). posexplode → one partial+final hash
    agg; the shuffle carries (label, pos) partials — |labels|·dim rows —
    never whole vectors, so it is flat in corpus size."""
    e = table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("pos", "val")
    )
    # "+ 0" canonicalizes -0.0 → 0.0 (SURVEY §8 recipe); pos+1 matches
    # DuckDB's 1-based generate_subscripts
    return (
        e.groupBy("label", (F.col("pos") + 1).cast("long").alias("pos"))
        .agg((F.round(F.avg("val"), 4) + 0).alias("v"))
    )


@register(
    "agg_group_concat",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `groupUniqArray` → `arrayStringConcat` (SQL
    STRING_AGG/GROUP_CONCAT [P]): distinct values per group rendered as
    one sorted delimited string — deterministic because the list is
    de-duplicated and sorted before joining (raw collect order is
    partition-dependent and never hashable, SURVEY §5.3). The distinct
    set rides the partial agg; the shuffle carries ≤ |priorities| values
    per group."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_returnflag", "l_linestatus", "o_orderpriority"
    )
    return j.groupBy("l_returnflag", "l_linestatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities")
    )


@register(
    "agg_skew_kurt",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             value - MIN(value) OVER (PARTITION BY event_type) AS w
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, AVG(w) AS mu,
             SUM(w) AS s1, SUM(w * w) AS s2,
             SUM(w * w * w) AS s3,
             SUM(w * w * w * w) AS s4
      FROM s GROUP BY event_type
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
           ROUND((m3 / POW(m2, 1.5))
                 * sqrt(n * (n - 1.0)) / (n - 2.0), 4) + 0 AS skew,
           ROUND(((n + 1.0) * (m4 / (m2 * m2) - 3) + 6)
                 * (n - 1.0) / ((n - 2.0) * (n - 3.0)), 4) + 0 AS kurt
    FROM c ORDER BY event_type
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shape per event type (ClickHouse `skewSamp`/
    `kurtSamp` [P] — burst/heavy-tail detection on traffic counters):
    bias-corrected SAMPLE statistics G1 = g1·√(n(n−1))/(n−2) and
    G2 = ((n+1)·g2 + 6)·(n−1)/((n−2)(n−3)) from the population moments.

    Rewritten r9 (SURVEY §17.1, the `stats_jarque_bera` form): raw
    power sums Σx…Σx⁴ in ONE map-side-combinable pass, central moments
    expanded binomially with the IDENTICAL expression in both engines —
    the builtin aggregates were the r8 constk finding (Spark NaN vs
    DuckDB 1-ulp cancellation residue amplified to garbage at zero
    variance). Constant groups are gated out two-sided with the EXACT
    predicate min(value) <> max(value) (S/K undefined there); n ≤ 3
    zeroes a correction denominator, where DuckDB /0 is NULL and the
    engine try_divides. Both are no-ops at real SFs.

    r10 (ADVICE r9 low): the power sums run over values SHIFTED by the
    per-group min — central moments are shift-invariant, so the result
    is identical, but the |mu| >> sigma cancellation that loses
    ~(mu/sigma)^k significant digits in m2..m4 is bounded by the data
    RANGE instead of its location. Both engines shift via the same
    partitioned-window MIN, so expressions stay mirrored; Spark's
    groupBy reuses the window's hash partitioning (one exchange
    total)."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    pivot = F.min("value").over(
        W.partitionBy("event_type")
    )
    ev = ev.withColumn("w", F.col("value") - pivot)
    v = F.col("w")
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
    g1 = F.try_divide(F.col("m3"), F.pow(F.col("m2"), 1.5))
    g2 = F.try_divide(F.col("m4"), F.col("m2") * F.col("m2")) - 3
    nd = F.col("n")
    G1 = F.try_divide(g1 * F.sqrt(nd * (nd - 1.0)), nd - 2.0)
    G2 = F.try_divide(
        ((nd + 1.0) * g2 + 6) * (nd - 1.0), (nd - 2.0) * (nd - 3.0)
    )
    return c.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.round(G1, 4) + 0).alias("skew"),
        (F.round(G2, 4) + 0).alias("kurt"),
    ).orderBy("event_type")


@register(
    "agg_mad_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT e.event_type, e.value, m.med
      FROM events e JOIN m USING (event_type)
    ),
    md AS (
      SELECT event_type, ANY_VALUE(med) AS med,
             quantile_cont(abs(value - med), 0.5) AS mad
      FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(ANY_VALUE(md.med), 4) AS med,
           ROUND(ANY_VALUE(md.mad), 4) AS mad,
           COUNT(CASE WHEN abs(d.value - md.med) > 3 * 1.4826 * md.mad
                      THEN 1 END) AS n_outliers
    FROM d JOIN md USING (event_type) GROUP BY d.event_type
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation (the
    DDoS/volumetric-anomaly staple — mean/stddev are themselves skewed
    by the attack traffic; medians aren't). Three aggregations, each
    over per-type medians, glued by BROADCAST joins of the tiny
    (|types|-row) statistics frames — the fact table is scanned twice
    but never self-joined or shuffled wide. At 100 TB swap the exact
    medians for `percentile_approx` partials (one pass); the exact
    formulation here is what the oracle can verify."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    d = e.join(F.broadcast(med), "event_type")
    md = d.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
    )
    out = d.select("event_type", "value").join(F.broadcast(md), "event_type")
    is_out = F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return out.groupBy("event_type").agg(
        F.round(F.first("med"), 4).alias("med"),
        F.round(F.first("mad"), 4).alias("mad"),
        F.count(F.when(is_out, 1)).alias("n_outliers"),
    )


@register(
    "agg_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 'b' ELSE 'a' END AS grp,
             value
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    m AS (
      SELECT grp, COUNT(*) AS n, AVG(value) AS mean, var_samp(value) AS v
      FROM g GROUP BY grp
    )
    SELECT ROUND(a.mean - b.mean, 4) AS mean_diff,
           ROUND((a.mean - b.mean) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
           CAST(FLOOR(pow(a.v / a.n + b.v / b.n, 2)
             / (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)))
             AS BIGINT) AS df_floor
    FROM (SELECT * FROM m WHERE grp = 'a') a, (SELECT * FROM m WHERE grp = 'b') b
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (ClickHouse `welchTTest` [P] — the
    A/B-test primitive): click-vs-purchase value difference, t statistic,
    and Welch–Satterthwaite degrees of freedom. One grouped moment pass
    (count/mean/variance partials), then scalar arithmetic on a 2-row
    frame — the full test costs one aggregation however large the fact
    table. The df is floored: the fractional part is where engine ulp
    noise lives, and the floor is what t-tables index anyway."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    g = e.select(
        F.when(F.col("event_type") == "purchase", "b").otherwise("a").alias("grp"),
        "value",
    )
    m = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("v"),
    )
    a = m.filter(F.col("grp") == "a").select(
        F.col("n").alias("na"), F.col("mean").alias("ma"), F.col("v").alias("va")
    )
    b = m.filter(F.col("grp") == "b").select(
        F.col("n").alias("nb"), F.col("mean").alias("mb"), F.col("v").alias("vb")
    )
    j = a.crossJoin(b)
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    df = F.pow(se2, 2) / (
        F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
        + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
    )
    return j.select(
        F.round(F.col("ma") - F.col("mb"), 4).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4).alias("t_stat"),
        F.floor(df).cast("bigint").alias("df_floor"),
    )


@register(
    "agg_cramers_v",
    oracle="""
    WITH c AS (
      SELECT event_type AS a, EXTRACT(hour FROM ts) AS b, COUNT(*) AS n
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY a, b
    ),
    tot AS (SELECT SUM(n) AS N FROM c),
    r AS (SELECT a, SUM(n) AS rn FROM c GROUP BY a),
    col AS (SELECT b, SUM(n) AS cn FROM c GROUP BY b),
    chi AS (
      SELECT SUM(pow(c.n - r.rn * col.cn / tot.N, 2)
                 / (r.rn * col.cn / tot.N))       AS chi2,
             ANY_VALUE(tot.N)                     AS N,
             (SELECT COUNT(*) FROM r)             AS R,
             (SELECT COUNT(*) FROM col)           AS C
      FROM c JOIN r USING (a) JOIN col USING (b) CROSS JOIN tot
    )
    SELECT ROUND(sqrt(chi2 / (N * (least(R, C) - 1))), 4) AS cramers_v,
           ROUND(chi2, 4) AS chi2
    FROM chi
    """,  # 1x1 table: N*(least-1)=0 -> DuckDB x/0 NULL, engine try_divide
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event type and hour-of-day
    (ClickHouse `cramersV` [P] — 'is this traffic class time-of-day
    dependent'). The χ² runs entirely on the CONTINGENCY TABLE
    (|types|·24 rows), never the fact table: one partial+final count
    agg over the corpus, then broadcast joins of the tiny marginal
    frames. Cell order in the χ² sum is engine-dependent but the ~120
    addends are O(1)-magnitude, absorbed by round(4).

    Degenerate parity (r9 edge batch): a NULL type or NULL hour is not
    a category — excluded two-sidedly (nullmix mode: the equi-joins
    drop NULL-keyed cells identically on both engines, but the oracle's
    marginal COUNT(*) would still count the NULL group where
    countDistinct ignores it); a 1×1 table (one-row/constk) zeroes the
    V denominator — DuckDB x/0 is NULL, so try_divide."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    c = e.groupBy(
        F.col("event_type").alias("a"), F.hour("ts").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    c = c.localCheckpoint()  # reused by 3 aggregates + the join
    r = c.groupBy("a").agg(F.sum("n").alias("rn"))
    col = c.groupBy("b").agg(F.sum("n").alias("cn"))
    tot = c.agg(F.sum("n").alias("n_total"))  # not "N": Spark resolution is case-insensitive vs cell count "n"
    j = (
        c.join(F.broadcast(r), "a")
        .join(F.broadcast(col), "b")
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("rn") * F.col("cn") / F.col("n_total")
    chi = j.agg(
        F.sum(F.pow(F.col("n") - exp, 2) / exp).alias("chi2"),
        F.first("n_total").alias("n_total"),
        F.countDistinct("a").alias("R"),
        F.countDistinct("b").alias("C"),
    )
    return chi.select(
        F.round(
            F.sqrt(
                F.try_divide(
                    F.col("chi2"),
                    F.col("n_total") * (F.least("R", "C") - 1),
                )
            ),
            4,
        ).alias("cramers_v"),
        F.round("chi2", 4).alias("chi2"),
    )
