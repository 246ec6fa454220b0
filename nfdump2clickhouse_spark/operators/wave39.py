"""Wave-39 keys (round 5): exact decimal money, CIDR rollups, A/B
contamination, Hampel outliers, sketch calibration.

- ``cast_decimal_money``: DECIMAL(18,2) money arithmetic — exact sums
  that double-precision floats cannot promise [P — financial-exactness
  requirement; ClickHouse Decimal columns are the reference's money
  type].
- ``flows_prefix_rollup``: traffic aggregated at /8, /16 and /24
  simultaneously [P — nfdump's src/dst network aggregation] via
  GROUPING SETS on masked addresses.
- ``events_ab_contamination``: cross-variant exposure audit [P — the
  assignment-integrity check next to `stats_chi2_srm`].
- ``ts_hampel_outliers``: Hampel filter (rolling median ± k·MAD)
  [P — Hampel 1974; the robust outlier detector that one spike cannot
  poison, unlike mean ± kσ].
- ``agg_sketch_error_report``: measured approx-distinct error vs exact
  per group [P — sketch calibration before trusting HLL numbers].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# cast_decimal_money
# ---------------------------------------------------------------------------


@register(
    "cast_decimal_money",
    oracle="""
    WITH d AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
               AS net
      FROM lineitem
    )
    SELECT flag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(net) AS VARCHAR) AS net_total,
           CAST(MIN(net) AS VARCHAR) AS net_min,
           CAST(MAX(net) AS VARCHAR) AS net_max
    FROM d GROUP BY flag ORDER BY flag
    """,
)
def cast_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money arithmetic: price × (1 − discount) computed
    in DECIMAL(18,2)→(18,4) and summed EXACTLY — the financial-ledger
    requirement doubles cannot meet (float sums drift with partition
    order; decimal sums are associative integers underneath). Totals
    emit as canonical STRINGS so the hash compares the exact decimal
    rendering, not a float round-trip.

    Spark decimals aggregate as JVM-side unscaled longs/Int128 inside
    codegen; the only shuffle is the flag rollup carrying exact
    partials. The multiplication scale arithmetic (2+2 → checked cast
    back to 4) is pinned identical in both engines by the explicit
    CASTs — relying on implicit scale promotion is where engines
    diverge (Spark 18,2×18,2→37,4 vs DuckDB's width rules)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("decimal(18,4)")
        .alias("net"),
    )
    return (
        li.groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("net").cast("string").alias("net_total"),
            F.min("net").cast("string").alias("net_min"),
            F.max("net").cast("string").alias("net_max"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# flows_prefix_rollup
# ---------------------------------------------------------------------------


@register(
    "flows_prefix_rollup",
    oracle="""
    WITH f AS (
      SELECT (user_id % 50) * 65536 + (event_id % 256) * 256
               + (user_id % 7) AS sa_num,
             CAST(FLOOR(COALESCE(value, 0) * 1000) AS BIGINT) AS ibyt
      FROM events
    ),
    levels AS (
      SELECT 8 AS masklen, (sa_num // 16777216) * 16777216 AS prefix,
             ibyt FROM f
      UNION ALL
      SELECT 16, (sa_num // 65536) * 65536, ibyt FROM f
      UNION ALL
      SELECT 24, (sa_num // 256) * 256, ibyt FROM f
    ),
    agg AS (
      SELECT masklen, prefix, COUNT(*) AS n_flows, SUM(ibyt) AS bytes
      FROM levels GROUP BY masklen, prefix
    ),
    ranked AS (
      SELECT masklen, prefix, n_flows, bytes,
             ROW_NUMBER() OVER (PARTITION BY masklen
                                ORDER BY bytes DESC, prefix) AS rn
      FROM agg
    )
    SELECT CAST(masklen AS INT) AS masklen,
           CAST(prefix AS BIGINT) AS prefix,
           CAST(n_flows AS BIGINT) AS n_flows,
           CAST(bytes AS BIGINT) AS bytes
    FROM ranked WHERE rn <= 5 ORDER BY masklen, bytes DESC, prefix
    """,
)
def flows_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network-prefix traffic rollup — nfdump's src-network aggregation
    at three granularities at once: flows aggregate under their /8,
    /16 and /24 supernets (integer address masking), reporting the
    top-5 prefixes per level. The drill-down artifact a NOC works
    from: /8 says which org, /24 says which subnet.

    The three mask levels ride ONE scan via an explode of masked
    copies (3 rows per flow — the GROUPING SETS shape, spelled
    explicitly so both engines share it); masking is integer div/mul
    codegen, never string CIDR parsing; per-level top-5 prunes via
    WindowGroupLimit. At 100 TB the rollup shuffle carries one row per
    (level, prefix)."""
    f = table(spark, sf_dir, "events").select(
        (
            (F.col("user_id") % 50) * 65536
            + (F.col("event_id") % 256) * 256
            + (F.col("user_id") % 7)
        ).alias("sa_num"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1000)
        .cast("bigint")
        .alias("ibyt"),
    )
    levels = None
    for masklen, block in [(8, 16777216), (16, 65536), (24, 256)]:
        lvl = f.select(
            F.lit(masklen).alias("masklen"),
            (F.floor(F.col("sa_num") / block) * block).alias("prefix"),
            "ibyt",
        )
        levels = lvl if levels is None else levels.unionAll(lvl)
    agg = levels.groupBy("masklen", "prefix").agg(
        F.count(F.lit(1)).alias("n_flows"), F.sum("ibyt").alias("bytes")
    )
    w = Window.partitionBy("masklen").orderBy(F.desc("bytes"), "prefix")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("masklen").cast("int").alias("masklen"),
            F.col("prefix").cast("bigint").alias("prefix"),
            F.col("n_flows").cast("bigint").alias("n_flows"),
            F.col("bytes").cast("bigint").alias("bytes"),
        )
        .orderBy("masklen", F.desc("bytes"), "prefix")
    )


# ---------------------------------------------------------------------------
# events_ab_contamination
# ---------------------------------------------------------------------------


@register(
    "events_ab_contamination",
    oracle="""
    WITH exp AS (
      SELECT user_id,
             count_if(event_id % 2 = 0) AS n_a,
             count_if(event_id % 2 = 1) AS n_b
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
           CAST(COALESCE(count_if(n_a > 0 AND n_b = 0), 0) AS BIGINT) AS pure_a,
           CAST(COALESCE(count_if(n_b > 0 AND n_a = 0), 0) AS BIGINT) AS pure_b,
           CAST(COALESCE(count_if(n_a > 0 AND n_b > 0), 0) AS BIGINT)
             AS contaminated,
           CAST(10000 * count_if(n_a > 0 AND n_b > 0) // COUNT(*)
                AS BIGINT) AS contamination_bp
    FROM exp
    """,
)
def events_ab_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B exposure-integrity audit: with variant assigned per EVENT
    (the broken-by-design demo: event parity, not user hash), count
    users exposed to both arms — contaminated users dilute any
    treatment effect toward zero and bias CUPED/DiD adjustments. The
    integrity check that runs BEFORE `stats_chi2_srm` asks whether
    arm SIZES are right: contamination can be 100% while SRM passes.
    (The fix this key motivates is `sample_hash_bucket`-style
    user-keyed assignment, where contamination is structurally zero.)

    One user-keyed conditional-count rollup + a 1-row integer audit —
    the `events_cart_abandonment` shape."""
    exp = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("event_id") % 2 == 0).alias("n_a"),
            F.count_if(F.col("event_id") % 2 == 1).alias("n_b"),
        )
    )
    na, nb = F.col("n_a"), F.col("n_b")
    return exp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count_if((na > 0) & (nb == 0)).cast("bigint").alias("pure_a"),
        F.count_if((nb > 0) & (na == 0)).cast("bigint").alias("pure_b"),
        F.count_if((na > 0) & (nb > 0)).cast("bigint").alias("contaminated"),
        F.expr(
            # zero users: share undefined -> NULL, the value DuckDB's `//`
            # yields on a zero divisor (r7 edge sweep — DIV raised)
            "CASE WHEN count(1) = 0 THEN NULL ELSE"
            " 10000 * count_if(n_a > 0 AND n_b > 0) DIV count(1) END"
        )
        .cast("bigint")
        .alias("contamination_bp"),
    )


# ---------------------------------------------------------------------------
# ts_hampel_outliers
# ---------------------------------------------------------------------------


@register(
    "ts_hampel_outliers",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT day, rev,
             COUNT(*) OVER win AS n_win,
             quantile_cont(rev, 0.5) OVER win AS rmed
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    mad AS (
      SELECT day, rev, n_win, rmed,
             quantile_cont(ABS(rev - rmed), 0.5) OVER win AS rmad
      FROM med
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND(rev / 100.0, 4) AS revenue,
           ROUND(rmed / 100.0, 4) AS rolling_median,
           ROUND(1.4826 * rmad / 100.0, 4) AS robust_sigma,
           CAST(ABS(rev - rmed) > 3 * 1.4826 * rmad AS BOOLEAN) AS is_outlier
    FROM mad WHERE n_win = 7 ORDER BY day
    """,
)
def ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter on daily revenue: flag days where
    |x − rolling median| > 3 × 1.4826 × rolling MAD — the ROBUST
    outlier detector. The mean ± kσ detectors (`ts_bollinger_bands`,
    `events_anomaly_zscore`) let one giant spike inflate σ and mask
    its neighbors; median and MAD have a 50% breakdown point, so a
    spike cannot hide itself.

    Variant the oracle encodes: the second window takes the median of
    each frame MEMBER's own pre-computed deviation |rev_j − rmed_j| —
    the 'pre-centered' streaming-Hampel form that two stacked window
    passes can express (the textbook form recenters every deviation on
    the current row's median, which would need a per-row nested frame).
    Both engines compute THIS form identically and the suite replicates
    it. Exact window percentiles over the bounded days table; integer
    cents until display."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    med = daily.select(
        "day",
        "rev",
        F.count(F.lit(1)).over(win).alias("n_win"),
        F.expr("percentile(rev, 0.5)").over(win).alias("rmed"),
    )
    mad = med.withColumn(
        "rmad",
        F.expr("percentile(ABS(rev - rmed), 0.5)").over(
            Window.orderBy("day").rowsBetween(-6, 0)
        ),
    )
    dev = F.abs(F.col("rev") - F.col("rmed"))
    return (
        mad.filter(F.col("n_win") == 7)
        .select(
            "day",
            F.round(F.col("rev") / 100.0, 4).alias("revenue"),
            F.round(F.col("rmed") / 100.0, 4).alias("rolling_median"),
            F.round(F.lit(1.4826) * F.col("rmad") / 100.0, 4).alias("robust_sigma"),
            (dev > 3 * 1.4826 * F.col("rmad")).alias("is_outlier"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# agg_sketch_error_report
# ---------------------------------------------------------------------------


@register("agg_sketch_error_report")  # rows-only: sketch estimates differ
def agg_sketch_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration: per event type, the HLL++ approximate
    distinct-user count at two precisions (rsd 0.05 default, 0.01
    tight) NEXT TO the exact count, with measured relative errors in
    basis points — the report that decides whether the cheap sketch is
    trustworthy enough to replace `count_distinct` on a dashboard
    (pairs with `agg_approx_distinct`, which exposes the operator, and
    `ann_recall_report`, the same idea for indexes).

    One grouped aggregate computes exact AND both sketches in a single
    pass (three aggregate buffers, one exchange). Rows-only: HLL
    estimates are engine-specific by construction — the suite instead
    pins the measured error against each sketch's ADVERTISED rsd bound
    (3σ) and the exact column against a DuckDB exact count."""
    e = table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("exact"),
        F.approx_count_distinct("user_id", 0.05).alias("approx_05"),
        F.approx_count_distinct("user_id", 0.01).alias("approx_01"),
    )
    ex = F.col("exact")
    return g.select(
        "event_type",
        ex.cast("bigint").alias("exact"),
        F.col("approx_05").cast("bigint").alias("approx_rsd05"),
        F.col("approx_01").cast("bigint").alias("approx_rsd01"),
        # try_divide: a group whose user_ids are all NULL has exact==0
        # (count_distinct skips NULLs) — error is undefined, not a crash
        F.try_divide(F.abs(F.col("approx_05") - ex) * 10000, ex)
        .cast("bigint")
        .alias("err_rsd05_bp"),
        F.try_divide(F.abs(F.col("approx_01") - ex) * 10000, ex)
        .cast("bigint")
        .alias("err_rsd01_bp"),
    ).orderBy("event_type")
