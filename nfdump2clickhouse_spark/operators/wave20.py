"""Wave-20 keys (round 4): CUPED variance reduction + freshness SLA.

- ``events_cuped_adjust``: CUPED pre-period covariate adjustment for
  A/B metrics [P — Deng et al. 2013, the industry-standard variance
  reduction]: θ = cov(pre, post)/var(pre) pooled across arms, adjusted
  metric = post − θ·(pre − mean(pre)). Completes the experimentation
  stack: `stats_chi2_srm` (assignment health) → CUPED (variance
  reduction) → `agg_welch_ttest` (the test itself).
- ``data_freshness_sla``: per-stream staleness report relative to the
  corpus watermark — the ops gate that catches a dead exporter or a
  stuck ingest before dashboards silently go stale.

Both hash-oracled. CUPED determinism: every moment (Σx, Σy, Σxy, Σx²)
accumulates in EXACT integer cents, so θ and the variance-reduction
ratio are pure functions of integers — no float summation order to
drift cross-engine (the `stats_anova_f` lesson applied by construction
rather than by ordered folds).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

_MULT = 2654435761
_SPLIT = "2024-01-16"  # pre-period before, post-period from this day (fixture spans January)


@register(
    "events_cuped_adjust",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             (user_id * {_MULT}) % 4294967296 % 2 AS arm,
             SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_SPLIT}'
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
               AS pre_c,
             SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_SPLIT}'
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
               AS post_c
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(pre_c) AS sx, SUM(post_c) AS sy,
             SUM(CAST(pre_c AS HUGEINT) * CAST(pre_c AS HUGEINT)) AS sxx,
             SUM(CAST(pre_c AS HUGEINT) * CAST(post_c AS HUGEINT)) AS sxy,
             SUM(CAST(post_c AS HUGEINT) * CAST(post_c AS HUGEINT)) AS syy
      FROM u
    ),
    th AS (
      SELECT n, sx, sy,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
             (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) AS var_post,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) AS cov_xy,
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) AS var_pre
      FROM m
    ),
    arm AS (
      SELECT u.arm, COUNT(*) AS n_users,
             SUM(u.post_c) AS a_sy, SUM(u.pre_c) AS a_sx
      FROM u GROUP BY u.arm
    )
    SELECT CAST(a.arm AS INT) AS arm,
           CAST(a.n_users AS BIGINT) AS n_users,
           ROUND(CAST(a.a_sy AS DOUBLE) / a.n_users / 100, 4) + 0
             AS mean_post,
           ROUND((CAST(a.a_sy AS DOUBLE) / a.n_users
                  - t.theta * (CAST(a.a_sx AS DOUBLE) / a.n_users
                               - CAST(t.sx AS DOUBLE) / t.n)) / 100, 4) + 0
             AS mean_cuped,
           ROUND(t.theta, 4) + 0 AS theta_r,
           CAST(ROUND(10000 * (t.cov_xy * t.cov_xy)
                      / (t.var_pre * t.var_post)) AS BIGINT)
             AS var_reduction_bp
    FROM arm a, th t
    """,
)
def events_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjustment of the post-period revenue metric using each
    user's PRE-period revenue as the covariate [P — Deng et al. 2013]:
    θ = cov(pre, post)/var(pre) pooled over all users, adjusted mean
    per arm = mean(post) − θ·(mean_arm(pre) − mean(pre)). The variance
    reduction factor ρ² = cov²/(var_pre·var_post) says how much
    experiment runtime the covariate buys (ρ² = 0.3 ⇒ 30% fewer
    samples for the same power).

    Scale shape: ONE user-keyed agg builds (pre, post) in exact integer
    cents; all five moments (Σx, Σy, Σx², Σxy, Σy²) come from one more
    partial+final agg as exact integers (decimal38/HUGEINT), so θ is a
    pure function of integers — no float summation order to drift
    cross-engine by construction. Per-arm means are one 2-row agg; the
    1-row θ frame broadcasts onto it."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    split = F.lit(_SPLIT).cast("date")
    u = (
        e.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.to_date("ts") < split, cents).otherwise(0)).alias(
                "pre_c"
            ),
            F.sum(
                F.when(F.to_date("ts") >= split, cents).otherwise(0)
            ).alias("post_c"),
        )
        .withColumn(
            "arm", (F.col("user_id") * F.lit(_MULT)) % F.lit(4294967296) % 2
        )
    )
    d19 = "decimal(19,0)"
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_c").alias("sx"),
        F.sum("post_c").alias("sy"),
        F.sum(F.col("pre_c").cast(d19) * F.col("pre_c").cast(d19)).alias("sxx"),
        F.sum(F.col("pre_c").cast(d19) * F.col("post_c").cast(d19)).alias("sxy"),
        F.sum(F.col("post_c").cast(d19) * F.col("post_c").cast(d19)).alias("syy"),
    )
    # try_divide throughout (r9 edge batch, SURVEY §17.1): the θ
    # denominator degenerates on a constant pre-period (constk) and nd
    # is 0 over an empty user table — the broadcast side is ALWAYS
    # evaluated even when the arm side is empty, so ANSI DIVIDE_BY_ZERO
    # threw where the DuckDB oracle yields NULL. Division order (… / nd
    # / nd, sequential) is preserved exactly for float parity.
    nd = F.col("n").cast("double")
    theta = F.try_divide(
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double"),
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double"),
    )
    cov_xy = F.try_divide(
        F.try_divide(
            nd * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double"),
            nd,
        ),
        nd,
    )
    var_pre = F.try_divide(
        F.try_divide(
            nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double"),
            nd,
        ),
        nd,
    )
    var_post = F.try_divide(
        F.try_divide(
            nd * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double"),
            nd,
        ),
        nd,
    )
    th = m.select(
        "n",
        "sx",
        theta.alias("theta"),
        cov_xy.alias("cov_xy"),
        var_pre.alias("var_pre"),
        var_post.alias("var_post"),
    )
    arm = u.groupBy(F.col("arm").cast("int").alias("arm")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("post_c").alias("a_sy"),
        F.sum("pre_c").alias("a_sx"),
    )
    j = arm.crossJoin(F.broadcast(th))
    return j.select(
        "arm",
        F.col("n_users").cast("bigint").alias("n_users"),
        (
            F.round(F.col("a_sy").cast("double") / F.col("n_users") / 100, 4)
            + 0
        ).alias("mean_post"),
        (
            F.round(
                (
                    F.col("a_sy").cast("double") / F.col("n_users")
                    - F.col("theta")
                    * (
                        F.col("a_sx").cast("double") / F.col("n_users")
                        - F.col("sx").cast("double") / F.col("n")
                    )
                )
                / 100,
                4,
            )
            + 0
        ).alias("mean_cuped"),
        (F.round("theta", 4) + 0).alias("theta_r"),
        F.round(
            F.try_divide(
                10000 * (F.col("cov_xy") * F.col("cov_xy")),
                F.col("var_pre") * F.col("var_post"),
            )
        )
        .cast("bigint")
        .alias("var_reduction_bp"),
    )


@register(
    "data_freshness_sla",
    oracle="""
    WITH w AS (
      SELECT MAX(epoch(date_trunc('second', ts))::BIGINT) AS wm FROM events
    ),
    s AS (
      SELECT event_type,
             MAX(epoch(date_trunc('second', ts))::BIGINT) AS last_s,
             COUNT(*) AS n_total,
             count_if(epoch(date_trunc('second', ts)) >= w.wm - 86400)
               AS n_last_day
      FROM events, w GROUP BY event_type, w.wm
    )
    SELECT s.event_type,
           CAST(w.wm - s.last_s AS BIGINT) AS lag_s,
           CAST(s.n_total AS BIGINT) AS n_total,
           CAST(s.n_last_day AS BIGINT) AS n_last_day,
           w.wm - s.last_s > 3600 AS breach_1h,
           w.wm - s.last_s > 86400 AS breach_1d
    FROM s, w
    """,
)
def data_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness against the corpus watermark (the max event
    time — comparing to wall-clock would be nondeterministic AND wrong
    for replays): how stale is each event stream, how much of its
    volume arrived in the watermark's trailing day, and which SLA
    thresholds are breached. This is the ops gate that catches a dead
    exporter before the dashboards silently flatten — the batch analog
    of `stream_progress_metrics`' lag telemetry.

    Scale shape: one 1-row watermark agg broadcast into one per-stream
    agg (the trailing-day count rides the same shuffle); all-integer
    epoch-second arithmetic."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("t"),
    )
    wm = e.agg(F.max("t").alias("wm"))
    s = (
        e.crossJoin(F.broadcast(wm))
        .groupBy("event_type", "wm")
        .agg(
            F.max("t").alias("last_s"),
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("t") >= F.col("wm") - 86400).alias("n_last_day"),
        )
    )
    return s.select(
        "event_type",
        (F.col("wm") - F.col("last_s")).cast("bigint").alias("lag_s"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("n_last_day").cast("bigint").alias("n_last_day"),
        (F.col("wm") - F.col("last_s") > 3600).alias("breach_1h"),
        (F.col("wm") - F.col("last_s") > 86400).alias("breach_1d"),
    )


@register("meta_registry_catalog")  # rows-only: self-referential — no
# external oracle can know the registry; reconciliation pinned in tests
def meta_registry_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's information_schema: every registered query key as a
    row — module, capability family (key prefix), whether it carries a
    cross-engine SQL oracle, and its one-line summary. ClickHouse users
    live in system.* tables [P]; this is the equivalent self-describing
    surface, and it is how the SURVEY §2 inventory can be cross-walked
    mechanically instead of by hand.

    Static registration order (not the certification-rotated view): the
    catalog describes what EXISTS, the rotation decides what gets swept
    next — two different questions."""
    import importlib

    from .. import registry as _r

    _r._load_operators()

    def summary(spec):
        # fall back to the operator module's doc: several early keys
        # document themselves at module level, and rewriting their
        # docstrings would invalidate certified source hashes for a
        # cosmetic change
        doc = (spec.doc or "").strip()
        if not doc:
            doc = (importlib.import_module(spec.fn.__module__).__doc__ or "").strip()
        return doc.split("\n")[0][:100]

    rows = [
        (
            k,
            s.fn.__module__.rsplit(".", 1)[-1],
            k.split("_", 1)[0],
            s.oracle is not None,
            summary(s),
        )
        for k, s in _r._REGISTRY.items()
    ]
    return spark.createDataFrame(
        rows,
        "key string, module string, family string, hash_checked boolean,"
        " summary string",
    )


@register(
    "flows_blacklist_match",
    oracle="""
    WITH f AS (
      SELECT (10 * 16777216) + ((user_id % 50) * 256) + (event_id % 250)
               AS sa_num,
             '10.0.' || CAST(user_id % 50 AS VARCHAR) || '.'
               || CAST(event_id % 250 AS VARCHAR) AS sa,
             user_id,
             CAST(FLOOR(value * 1000) AS BIGINT) AS ibyt
      FROM events WHERE value IS NOT NULL
    ),
    r(rule, lo, hi) AS (VALUES
      ('exact:10.0.7.7',   167773959, 167773959),
      ('net:10.0.13.0/24', 167775488, 167775743),
      ('net:10.0.40.0/22', 167782400, 167783423),
      ('exact:10.0.49.249', 167784953, 167784953),
      ('net:10.0.8.0/23',  167774208, 167774719))
    SELECT r.rule,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           CAST(COUNT(DISTINCT f.sa) AS BIGINT) AS n_src,
           CAST(SUM(f.ibyt) AS BIGINT) AS total_bytes
    FROM r JOIN f ON f.sa_num BETWEEN r.lo AND r.hi
    GROUP BY r.rule
    """,
)
def flows_blacklist_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threat-intel blacklist matching — THE SOC query the reference's
    users run all day [P — nfsen/nfdump practice]: which flows touched
    a listed address or network, per rule, with volume. Exact entries
    and CIDR prefixes compile to the SAME [lo, hi] numeric-range form
    (an exact IP is lo = hi), so one mechanism serves both — and the
    same ranges push down to parquet row-group stats when run against
    the at-rest table (`FlowService.query_filter` shares the machinery).

    Scale shape: the rules table is tiny and BROADCASTS (the legitimate
    broadcast — intel lists are thousands of rows, flows are the 100 TB
    side); the range join is per-row arithmetic against the broadcast
    ranges, never a shuffle of the corpus; one aggregation per rule
    follows. `join_ip_prefix_lookup` is the scale path when the prefix
    table itself grows large (bucketed equi-join)."""
    from ..functions.ip import cidr_range

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    f = e.select(
        (
            F.lit(10 * 16777216)
            + (F.col("user_id") % 50) * 256
            + (F.col("event_id") % 250)
        ).alias("sa_num"),
        F.concat(
            F.lit("10.0."),
            (F.col("user_id") % 50).cast("string"),
            F.lit("."),
            (F.col("event_id") % 250).cast("string"),
        ).alias("sa"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt"),
    )
    rules = []
    for spec in ["10.0.7.7", "10.0.13.0/24", "10.0.40.0/22", "10.0.49.249",
                 "10.0.8.0/23"]:
        lo, hi = cidr_range(spec if "/" in spec else f"{spec}/32")
        label = ("net:" if "/" in spec else "exact:") + spec
        rules.append((label, lo, hi))
    r = spark.createDataFrame(rules, "rule string, lo long, hi long")
    return (
        f.join(
            F.broadcast(r),
            (F.col("sa_num") >= F.col("lo")) & (F.col("sa_num") <= F.col("hi")),
        )
        .groupBy("rule")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_flows"),
            F.countDistinct("sa").cast("bigint").alias("n_src"),
            F.sum("ibyt").cast("bigint").alias("total_bytes"),
        )
    )


@register("agg_hll_sliding_union")  # rows-only: HLL estimates are
# implementation-defined; exact-window error bound pinned in tests
def agg_hll_sliding_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day distinct users from REUSED daily HLL sketches: one
    pass builds a sketch per day, then each window is a union of 7
    already-built sketches — `win_sliding_distinct` recomputes each
    window exactly and is the correctness baseline; THIS is how the
    metric survives 100 TB, because the corpus is touched once and the
    window arithmetic happens on kilobyte sketches (the ClickHouse
    uniqState/uniqMerge pattern [P], here via Spark's native
    hll_sketch_agg / hll_union_agg).

    Scale shape: one (day) sketch agg over the corpus; the 7-day
    windows come from joining the TINY (days × sketch) table to a
    generated day grid and union-merging — corpus never rescanned, and
    backfilling a late day rebuilds one daily sketch, not 7 windows."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_day"),
    )
    # window w covers days (w-6 .. w): explode each day onto the 7
    # windows it contributes to — row-local, 7 rows per DAY (tiny)
    win = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "wend"
        ),
        "day",
        "sk",
    )
    out = (
        win.groupBy("wend")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") == 7)  # full windows only
        .select("wend", "approx_users", "n_days")
    )
    return out
