"""Flows-domain analytical queries: the security/ops questions nfsen
dashboards ask of the ClickHouse flows table [P — the reference's whole
query surface is user-side SQL over `nfsen.flows`, SURVEY §0].

Fixtures carry no flow tuples, so endpoints/ports/bytes are synthesized
deterministically from events columns (same recipe as `ip_funcs` /
`str_url_funcs`) — the oracle re-derives them identically, so the hash
check exercises the full query, not the synthesis.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register


@register(
    "flows_biflow",
    oracle="""
    WITH f AS (
      SELECT '10.0.' || CAST(user_id % 50 AS VARCHAR)                 AS sa,
             '10.0.' || CAST((user_id + event_id) % 50 AS VARCHAR)    AS da,
             CAST(FLOOR(value * 1000) AS BIGINT)                      AS ibyt
      FROM events
    )
    SELECT least(sa, da)    AS ep1,
           greatest(sa, da) AS ep2,
           COUNT(*)                                        AS n_flows,
           CAST(SUM(CASE WHEN sa <= da THEN ibyt ELSE 0 END) AS BIGINT) AS fwd_bytes,
           CAST(SUM(CASE WHEN sa >  da THEN ibyt ELSE 0 END) AS BIGINT) AS rev_bytes
    FROM f WHERE sa <> da
    GROUP BY ep1, ep2
    """,
)
def flows_biflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nfdump `-B` bidirectional aggregation [P]: unidirectional flow
    records between the same endpoint pair collapse into one biflow row
    keyed on the canonical (least, greatest) pair, with per-direction
    byte counters. One partial+final hash agg on the canonical key — at
    100 TB the shuffle carries one row per endpoint pair, and the
    canonicalization is scan-side codegen, so request and reply meet in
    the same reducer without any self-join."""
    e = table(spark, sf_dir, "events")
    f = e.select(
        F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias("sa"),
        F.concat(
            F.lit("10.0."), ((F.col("user_id") + F.col("event_id")) % 50).cast("string")
        ).alias("da"),
        # explicit floor: DuckDB's double→bigint cast rounds, Spark's
        # truncates — floor() is the one semantics both engines share
        F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt"),
    ).filter(F.col("sa") != F.col("da"))
    return f.groupBy(
        F.least("sa", "da").alias("ep1"), F.greatest("sa", "da").alias("ep2")
    ).agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.sum(F.when(F.col("sa") <= F.col("da"), F.col("ibyt")).otherwise(0)).alias(
            "fwd_bytes"
        ),
        F.sum(F.when(F.col("sa") > F.col("da"), F.col("ibyt")).otherwise(0)).alias(
            "rev_bytes"
        ),
    )


@register(
    "flows_portscan",
    oracle="""
    WITH f AS (
      SELECT '10.0.' || CAST(user_id % 50 AS VARCHAR) AS sa,
             date_trunc('hour', ts)                   AS hr,
             CAST(event_id % 1024 AS INT)             AS dp
      FROM events
    )
    SELECT sa, hr, COUNT(DISTINCT dp) AS n_ports
    FROM f GROUP BY sa, hr HAVING COUNT(DISTINCT dp) >= 8
    """,
)
def flows_portscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Port-scan detector (the canonical nfsen security query [P]): a
    source touching ≥ 8 distinct destination ports within one hour.
    Spark plans distinct-within-group as a two-phase aggregation
    ((sa, hr, dp) partial dedup map-side, then the count) — no window,
    no self-join, and the HAVING filter runs on the tiny aggregated
    side. The hour bucket (not raw ts) keeps the key deterministic
    across fixture timestamp precisions (SURVEY §5.3.2)."""
    e = table(spark, sf_dir, "events")
    f = e.select(
        F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias("sa"),
        F.date_trunc("hour", "ts").alias("hr"),
        (F.col("event_id") % 1024).cast("int").alias("dp"),
    )
    return (
        f.groupBy("sa", "hr")
        .agg(F.countDistinct("dp").alias("n_ports"))
        .filter(F.col("n_ports") >= 8)
    )


@register(
    "flows_top_talkers",
    oracle="""
    WITH f AS (
      SELECT '10.0.' || CAST(user_id % 50 AS VARCHAR) AS sa,
             CAST(FLOOR(value * 1000) AS BIGINT)      AS ibyt
      FROM events
    ),
    agg AS (
      SELECT sa, COUNT(*) AS n_flows, CAST(SUM(ibyt) AS BIGINT) AS total_bytes
      FROM f GROUP BY sa
    )
    SELECT sa, n_flows, total_bytes,
           ROUND(total_bytes * 100.0 / SUM(total_bytes) OVER (), 2) AS pct_bytes
    FROM agg
    ORDER BY total_bytes DESC, sa LIMIT 10
    """,
)
def flows_top_talkers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`nfdump -s srcip/bytes` / the nfsen front-page top-talkers table
    [P]: top-10 sources by volume with share-of-total. The share uses an
    empty-frame window over the ALREADY-AGGREGATED per-source rows
    (|sources| rows, one tiny single-partition window), never over raw
    flows; the top-10 is TakeOrderedAndProject on the same aggregate.
    At 100 TB: one partial+final agg over the corpus, then statistics on
    a frame the driver could hold."""
    e = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    f = e.select(
        F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias("sa"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt"),
    )
    agg = f.groupBy("sa").agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.sum("ibyt").alias("total_bytes"),
    )
    total = Window.partitionBy()
    return (
        agg.select(
            "sa",
            "n_flows",
            "total_bytes",
            F.round(F.col("total_bytes") * 100.0 / F.sum("total_bytes").over(total), 2)
            .alias("pct_bytes"),
        )
        .orderBy(F.col("total_bytes").desc(), "sa")
        .limit(10)
    )


@register(
    "flows_stat_report",
    oracle="""
    WITH f AS (
      SELECT '10.0.' || CAST(user_id % 50 AS VARCHAR) AS sa,
             CAST(1024 + (event_id % 1024) AS VARCHAR) AS dp,
             CASE WHEN event_type IN ('click', 'view') THEN 'tcp'
                  WHEN event_type = 'error' THEN 'icmp' ELSE 'udp' END AS pr,
             CAST(floor(value * 10) + 1 AS BIGINT) AS ipkt,
             CAST(floor(value * 1000) AS BIGINT) AS ibyt
      FROM events
    ),
    t AS (SELECT SUM(ipkt) AS tp, SUM(ibyt) AS tb, COUNT(*) AS tf FROM f),
    per_dim AS (
      SELECT 'srcip' AS dim, sa AS key, COUNT(*) AS n_flows,
             CAST(SUM(ipkt) AS BIGINT) AS pkts,
             CAST(SUM(ibyt) AS BIGINT) AS bytes FROM f
      WHERE sa IS NOT NULL GROUP BY sa
      UNION ALL
      SELECT 'dstport', dp, COUNT(*), CAST(SUM(ipkt) AS BIGINT),
             CAST(SUM(ibyt) AS BIGINT) FROM f
      WHERE dp IS NOT NULL GROUP BY dp
      UNION ALL
      SELECT 'proto', pr, COUNT(*), CAST(SUM(ipkt) AS BIGINT),
             CAST(SUM(ibyt) AS BIGINT) FROM f
      WHERE pr IS NOT NULL GROUP BY pr
    ),
    ranked AS (
      SELECT dim, key, n_flows, pkts, bytes,
             ROW_NUMBER() OVER (PARTITION BY dim
                                ORDER BY bytes DESC, key) AS rk
      FROM per_dim
    )
    -- integer basis points: ROUND(double,2) implementations disagree at
    -- x.xx5 boundaries between engines (SURVEY §5.3 r2 rule)
    SELECT dim, key, n_flows, pkts, bytes,
           CAST((2 * n_flows * 10000 + tf) // (2 * tf) AS BIGINT) AS bp_flows,
           CAST((2 * pkts * 10000 + tp) // (2 * tp) AS BIGINT) AS bp_pkts,
           CAST((2 * bytes * 10000 + tb) // (2 * tb) AS BIGINT) AS bp_bytes
    FROM ranked, t WHERE rk <= 5
    """,
)
def flows_stat_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-statistic report — `nfdump -s srcip -s dstport -s proto`
    parity [P §3.1], the tool's most-used reporting mode: top-5 per
    dimension by bytes, with flow/packet/byte shares of the GLOBAL
    totals, all from ONE pass over the flows.

    Shape: grouping-sets aggregation — one scan Expands ×3 (srcip,
    dstport, proto) into a single partial+final agg, exactly how nfdump
    builds all its stat tables in one file read; per-dimension top-5 is
    a WindowGroupLimit (literal rank bound), and the global totals
    broadcast from a 1-row aggregate. Adding `-s` dimensions at 100 TB
    costs Expand width, never another corpus scan."""
    e = table(spark, sf_dir, "events")
    f = e.select(
        F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias(
            "sa"
        ),
        (1024 + F.col("event_id") % 1024).cast("string").alias("dp"),
        F.when(F.col("event_type").isin("click", "view"), "tcp")
        .when(F.col("event_type") == "error", "icmp")
        .otherwise("udp")
        .alias("pr"),
        (F.floor(F.col("value") * 10) + 1).cast("bigint").alias("ipkt"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt"),
    )
    totals = f.agg(
        F.sum("ipkt").alias("tp"),
        F.sum("ibyt").alias("tb"),
        F.count(F.lit(1)).alias("tf"),
    )
    f.createOrReplaceTempView("fsr_flows")
    per_dim = spark.sql(
        """
        -- dim from grouping_id, NOT key-NULLness: a NULL bucket key
        -- (NULL user_id => NULL sa) would misroute its group to the
        -- wrong dim under the NULL-based CASE; NULL keys themselves are
        -- pinned out two-sided (EDGE_SWEEP_r10 class C)
        SELECT * FROM (
          SELECT CASE grouping_id(sa, dp, pr) WHEN 3 THEN 'srcip'
                      WHEN 5 THEN 'dstport'
                      ELSE 'proto' END AS dim,
                 COALESCE(sa, dp, pr) AS key,
                 COUNT(*) AS n_flows, SUM(ipkt) AS pkts, SUM(ibyt) AS bytes
          FROM fsr_flows
          GROUP BY GROUPING SETS ((sa), (dp), (pr))
        ) WHERE key IS NOT NULL
        """
    )
    w = Window.partitionBy("dim").orderBy(F.desc("bytes"), "key")
    return (
        per_dim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .crossJoin(F.broadcast(totals))
        .select(
            "dim",
            "key",
            "n_flows",
            "pkts",
            "bytes",
            # basis points via exact integer round-half-up division —
            # ROUND(double,2) diverges cross-engine at x.xx5 boundaries
            F.expr(
                "CAST((2 * n_flows * 10000 + tf) DIV (2 * tf) AS BIGINT)"
            ).alias("bp_flows"),
            F.expr(
                "CAST((2 * pkts * 10000 + tp) DIV (2 * tp) AS BIGINT)"
            ).alias("bp_pkts"),
            F.expr(
                "CAST((2 * bytes * 10000 + tb) DIV (2 * tb) AS BIGINT)"
            ).alias("bp_bytes"),
        )
    )
