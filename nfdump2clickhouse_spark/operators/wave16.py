"""Wave-16 keys (round 4): sessionization, windowed funnel, declarative
data-quality rules, behavioral entropy.

Four capabilities a reference user reaches for daily that the registry
did not yet cover as first-class keys: gap-based sessionization (the
web-analytics primitive under every "sessions" metric), ClickHouse
``windowFunnel``-style ordered conversion within a time window (the
time-constrained form of `events_funnel` / `events_sequence_match`
[P — ClickHouse windowFunnel docs]), a rule-based data-quality report
(the Deequ/dbt-tests shape: each rule → checked/violations/bp over one
or two scans), and per-user Shannon entropy of the action distribution
(the behavioral-diversity feature next to corpus-level `agg_entropy`).

All four are hash-oracled. Timestamps follow SURVEY §5.3: never raw
``events.ts`` in output — epoch seconds of ``date_trunc('second')``
only; float entropy rounds to 4 places with the ``+ 0`` −0.0 guard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

#: inactivity gap that closes a session (the classic 30-minute rule)
_GAP_S = 1800
#: windowFunnel conversion window
_FUNNEL_W_S = 3600


@register(
    "events_sessionize_gap",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             epoch(date_trunc('second', ts))::BIGINT AS t
      FROM events
    ),
    g AS (
      SELECT user_id, event_id, t,
             CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                        ORDER BY t, event_id) > {_GAP_S}
                  OR LAG(t) OVER (PARTITION BY user_id
                                  ORDER BY t, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    s AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    per AS (
      SELECT user_id, sid, COUNT(*) AS n_ev, MAX(t) - MIN(t) AS span_s
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(SUM(span_s) AS BIGINT) AS active_s,
           CAST(MAX(n_ev) AS BIGINT) AS max_session_events
    FROM per GROUP BY user_id
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session ends after 30 min of user
    inactivity; report per-user session counts, total active span, and
    the largest session. This is the batch twin of the streaming
    `win_session` / `stream_session_window` keys — same semantics, but
    as a reprocessable window cascade over the at-rest table.

    Scale shape: both windows and the two aggregations ride ONE
    user-keyed exchange (same partition spec throughout — Catalyst
    stacks them on a single sort); per-user streams are short and
    plentiful, the healthy case for Window.partitionBy. All-integer
    epoch-second arithmetic, so the hash gate is exact."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    g = e.withColumn(
        "new_s",
        F.when(
            F.lag("t").over(w).isNull()
            | (F.col("t") - F.lag("t").over(w) > _GAP_S),
            1,
        ).otherwise(0),
    )
    s = g.withColumn("sid", F.sum("new_s").over(run))
    per = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("t") - F.min("t")).alias("span_s"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_ev").cast("bigint").alias("n_events"),
        F.sum("span_s").cast("bigint").alias("active_s"),
        F.max("n_ev").cast("bigint").alias("max_session_events"),
    )


@register(
    "events_funnel_windowed",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             epoch(date_trunc('second', ts))::BIGINT AS t
      FROM events
    ),
    s1 AS (SELECT user_id, t FROM e WHERE event_type = 'signup'),
    u2 AS (
      SELECT DISTINCT c.user_id
      FROM e c JOIN s1 ON c.user_id = s1.user_id
      WHERE c.event_type = 'click' AND c.t >= s1.t
        AND c.t - s1.t <= {_FUNNEL_W_S}
    ),
    u3 AS (
      SELECT DISTINCT p.user_id
      FROM e p
      JOIN e c ON p.user_id = c.user_id AND c.event_type = 'click'
             AND p.event_type = 'purchase' AND p.t >= c.t
      JOIN s1 ON s1.user_id = p.user_id AND c.t >= s1.t
             AND p.t - s1.t <= {_FUNNEL_W_S}
    ),
    d AS (
      SELECT u.user_id,
             CASE WHEN u.user_id IN (SELECT user_id FROM u3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM u2) THEN 2
                  WHEN u.user_id IN (SELECT DISTINCT user_id FROM s1) THEN 1
                  ELSE 0 END AS depth
      FROM (SELECT DISTINCT user_id FROM e) u
    )
    SELECT CAST(depth AS INT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d GROUP BY depth
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600)`` parity: per user, the deepest
    signup → click → purchase chain whose FULL span fits in one hour of
    the chain's first step; report users per depth. `events_funnel` is
    the unwindowed order-only form — the time constraint is what makes
    this the conversion metric product teams actually track [P].

    Scale shape: a LINEAR per-user scan, not the per-step self-join a
    naive formulation uses (the oracle deliberately IS that independent
    join formulation — two different algorithms must agree). One
    user-keyed sort window; each step's state is a running max: the
    latest signup so far, then the latest still-in-window signup
    reachable through a click (greedy-latest start is optimal because
    the only global constraint is span ≤ W — a later valid start only
    loosens the remaining budget). depth = max step with non-null
    state at any row of the matching type."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    last_s1 = F.max(F.when(F.col("event_type") == "signup", F.col("t"))).over(w)
    st = e.withColumn(
        "start2",
        F.when(
            (F.col("event_type") == "click")
            & (F.col("t") - last_s1 <= _FUNNEL_W_S),
            last_s1,
        ),
    )
    best2 = F.max("start2").over(w)
    st = st.withColumn(
        "hit3",
        (F.col("event_type") == "purchase")
        & (F.col("t") - best2 <= _FUNNEL_W_S),
    ).withColumn("hit1", F.col("event_type") == "signup")
    per = st.groupBy("user_id").agg(
        F.max(
            F.when(F.col("hit3"), 3)
            .when(F.col("start2").isNotNull(), 2)
            .when(F.col("hit1"), 1)
            .otherwise(0)
        ).alias("depth")
    )
    return per.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@register(
    "data_quality_rules",
    oracle="""
    WITH o AS (
      -- COALESCE(count_if, 0): DuckDB count_if over zero rows is NULL
      -- where Spark's is 0 — an empty table truthfully has 0
      -- violations (r7 class-2 convention, applied r9 per SURVEY §17.1)
      SELECT 'orders_totalprice_positive' AS rule,
             COUNT(*) AS n_checked,
             COALESCE(count_if(o_totalprice <= 0), 0) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'orders_status_domain', COUNT(*),
             COALESCE(count_if(o_orderstatus NOT IN ('O', 'F', 'P')), 0)
      FROM orders
      UNION ALL
      SELECT 'lineitem_discount_range', COUNT(*),
             COALESCE(count_if(l_discount < 0 OR l_discount > 1), 0)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_pk_unique', COUNT(*),
             COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_fk_orders', COUNT(*),
             COALESCE(count_if(o.o_orderkey IS NULL), 0)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'ship_after_order_date',
             COALESCE(count_if(o.o_orderkey IS NOT NULL), 0),
             COALESCE(count_if(l.l_shipdate < o.o_orderdate), 0)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'orders_fk_customer', COUNT(*),
             COALESCE(count_if(c.c_custkey IS NULL), 0)
      FROM orders r LEFT JOIN customer c ON r.o_custkey = c.c_custkey
    )
    SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(10000 * n_violations // GREATEST(n_checked, 1) AS BIGINT)
             AS viol_bp
    FROM o
    """,
)
def data_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (the Deequ / dbt-tests shape [P]):
    seven rules — domain, range, PK uniqueness, two FK referential
    checks, and a cross-table date-sanity predicate — each reporting
    (checked, violations, basis points). The contract of a DQ gate is
    that it runs CHEAPLY over the whole corpus on every load.

    Scale shape: single-table rules share one scan per table (one
    multi-aggregate each, no per-rule job loop — the `data_profile`
    discipline); the FK and date rules are two key-joins Catalyst is
    free to broadcast/AQE. Row counts are exact integers — hash-stable
    by construction."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")

    def row(rule, n_checked, n_viol):
        return F.struct(
            F.lit(rule).alias("rule"),
            n_checked.cast("bigint").alias("n_checked"),
            n_viol.cast("bigint").alias("n_violations"),
        )

    orders_rules = o.agg(
        F.array(
            row(
                "orders_totalprice_positive",
                F.count(F.lit(1)),
                F.count_if(F.col("o_totalprice") <= 0),
            ),
            row(
                "orders_status_domain",
                F.count(F.lit(1)),
                F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")),
            ),
        ).alias("rs")
    )
    li_rules = li.agg(
        F.array(
            row(
                "lineitem_discount_range",
                F.count(F.lit(1)),
                F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            ),
            row(
                "lineitem_pk_unique",
                F.count(F.lit(1)),
                F.count(F.lit(1))
                - F.countDistinct("l_orderkey", "l_linenumber"),
            ),
        ).alias("rs")
    )
    lo = li.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
        "left",
    )
    fk_rules = lo.agg(
        F.array(
            row(
                "lineitem_fk_orders",
                F.count(F.lit(1)),
                F.count_if(F.col("o_orderkey").isNull()),
            ),
            row(
                "ship_after_order_date",
                F.count_if(F.col("o_orderkey").isNotNull()),
                F.count_if(F.col("l_shipdate") < F.col("o_orderdate")),
            ),
        ).alias("rs")
    )
    oc = o.select("o_custkey").join(
        c.select("c_custkey"), o.o_custkey == c.c_custkey, "left"
    )
    oc_rules = oc.agg(
        F.array(
            row(
                "orders_fk_customer",
                F.count(F.lit(1)),
                F.count_if(F.col("c_custkey").isNull()),
            )
        ).alias("rs")
    )
    all_rules = (
        orders_rules.unionAll(li_rules).unionAll(fk_rules).unionAll(oc_rules)
        .select(F.explode("rs").alias("r"))
        .select("r.rule", "r.n_checked", "r.n_violations")
    )
    return all_rules.select(
        "rule",
        "n_checked",
        "n_violations",
        F.expr(
            "CAST(10000 * n_violations DIV GREATEST(n_checked, 1L) AS BIGINT)"
        ).alias("viol_bp"),
    )


@register(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*)::BIGINT AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    u AS (
      SELECT user_id, SUM(cnt) AS n, COUNT(*) AS k,
             SUM(cnt * ln(cnt)) AS slc
      FROM c GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS n_types,
           ROUND(ln(n) - slc / n, 4) + 0 AS entropy_r
    FROM u
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the action-type distribution — the
    behavioral-diversity feature (bots and single-purpose accounts sit
    near 0; engaged users near ln(k)). Corpus-level `agg_entropy` is
    the same identity H = ln(n) − Σc·ln(c)/n without the per-key
    grouping; the identity needs only (count, Σ c·ln c) partials, so
    the whole key is two partial+final aggs on the user key — one
    shuffle, no window. ROUND(x,4)+0 per the −0.0 discipline."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    u = c.groupBy("user_id").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("cnt") * F.log("cnt")).alias("slc"),
    )
    return u.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("k").cast("bigint").alias("n_types"),
        (F.round(F.log("n") - F.col("slc") / F.col("n"), 4) + 0).alias(
            "entropy_r"
        ),
    )
