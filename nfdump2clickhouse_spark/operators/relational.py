"""Projections / filters / sorts / limits / set operations
(SURVEY §2.2, §2.6, §2.7).

`project_rename_lit` is the reference's core transform: project the 48-col
nfdump CSV record down to the analytical subset and append a constant
`flowsrc` source tag (SURVEY §1.2 [P]). Everything else is the query
surface the resulting table serves. All built-in Catalyst operators —
filters and column pruning reach the parquet scan (PushedFilters), limits
compile to TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register


@register(
    "project_rename_lit",
    oracle="""
    SELECT l_orderkey AS okey, l_partkey AS pkey, l_quantity AS qty,
           l_extendedprice AS price, 'tagA' AS flowsrc
    FROM lineitem
    """,
)
def project_rename_lit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename + constant tag — the reference's 48→13+flowsrc
    projection [P SURVEY §1.2] re-expressed on lineitem."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .withColumnsRenamed(
            {
                "l_orderkey": "okey",
                "l_partkey": "pkey",
                "l_quantity": "qty",
                "l_extendedprice": "price",
            }
        )
        .withColumn("flowsrc", F.lit("tagA"))
    )


@register(
    "cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                       AS okey_str,
           CAST(o_orderkey AS DOUBLE)                        AS okey_dbl,
           CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER)   AS pri_num,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')        AS odate_str,
           CAST('42' AS BIGINT)                              AS const_int
    FROM orders
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit str↔ts/int/double casts — the reference's ingest-time typed
    projection (pandas astype/to_datetime [P])."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("okey_str"),
        F.col("o_orderkey").cast("double").alias("okey_dbl"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("pri_num"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate_str"),
        F.lit("42").cast("bigint").alias("const_int"),
    )


@register(
    "filter_time_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    """,
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical flows query: time-interval predicate (pushes to parquet
    row-group stats when data is written time-sorted — SURVEY §4.1)."""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")


@register(
    "filter_in_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority LIKE '_-%'
      AND o_orderstatus LIKE 'F%'
    """,
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN lists + LIKE prefix — port-list / address-prefix predicates [P]."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("_-%")
        & F.col("o_orderstatus").like("F%")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@register(
    "filter_null_handling",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P')                         AS status_nn,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')    AS status_filled,
           (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS is_f
    FROM orders
    WHERE NULLIF(o_orderstatus, 'P') IS NULL
       OR NULLIF(o_orderstatus, 'P') = 'F'
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nullable-column predicates: the flows `pr` column is Nullable [P
    SURVEY §1.2]; fixtures have no nulls, so synthesize via NULLIF."""
    o = table(spark, sf_dir, "orders")
    status_nn = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_nn.alias("status_nn"),
        F.coalesce(status_nn, F.lit("PENDING")).alias("status_filled"),
        status_nn.eqNullSafe(F.lit("F")).alias("is_f"),
    ).filter(status_nn.isNull() | (status_nn == "F"))


# --- §2.6 sorts / limits / top-k -------------------------------------------


@register(
    "sort_multi_nulls",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS pri, o_totalprice
    FROM orders
    ORDER BY pri DESC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST; keyed so the limited set is
    deterministic (SURVEY §5.3.4)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pri"),
            "o_totalprice",
        )
        .orderBy(
            F.col("pri").desc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(50)
    )


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — compiles to TakeOrderedAndProject (per-partition heaps
    + driver merge; no full sort at 100 TB)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination over a keyed total order (Spark ≥3.4 offset)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(10)
    )


# --- §2.7 set operations ----------------------------------------------------


def _custkeys_by_status(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == status).select("o_custkey")


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_by_status(spark, sf_dir, "F").unionByName(
        _custkeys_by_status(spark, sf_dir, "O")
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _custkeys_by_status(spark, sf_dir, "F")
        .union(_custkeys_by_status(spark, sf_dir, "O"))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_by_status(spark, sf_dir, "F").intersect(
        _custkeys_by_status(spark, sf_dir, "O")
    )


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_by_status(spark, sf_dir, "F").subtract(
        _custkeys_by_status(spark, sf_dir, "O")
    )


@register(
    "filter_nfdump_lang",
    oracle="""
    WITH f AS (
      SELECT event_id,
             '10.0.' || CAST(user_id % 16 AS VARCHAR) || '.7'       AS sa,
             '192.168.1.' || CAST(event_id % 8 AS VARCHAR)          AS da,
             1024 + event_id % 50000                                AS sp,
             CASE event_id % 3 WHEN 0 THEN 443 WHEN 1 THEN 80 ELSE 53 END AS dp,
             CASE event_id % 2 WHEN 0 THEN 'TCP' ELSE 'UDP' END     AS pr,
             (event_id * 37) % 3000                                 AS ipkt
      FROM events
    )
    SELECT event_id, sa, dp, pr, ipkt FROM f
    WHERE (CAST(split_part(sa, '.', 1) AS BIGINT) * 16777216
         + CAST(split_part(sa, '.', 2) AS BIGINT) * 65536
         + CAST(split_part(sa, '.', 3) AS BIGINT) * 256
         + CAST(split_part(sa, '.', 4) AS BIGINT)
           BETWEEN 167772160 AND 167774207
       AND dp = 443 AND pr = 'TCP')
       OR ipkt > 2000
    """,
)
def filter_nfdump_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nfdump filter language compiled onto Spark
    (functions/nffilter.py): `src net 10.0.0.0/21 and dst port 443 and
    proto tcp or packets > 2k` — the query surface nfdump users already
    have, compiled to Column predicates whose net clause is a numeric
    range (pushdown-able). Flow columns are synthesized deterministically
    from events so the oracle reproduces the semantics in plain SQL."""
    from ..functions.ip import ipv4_to_num
    from ..functions.nffilter import compile_filter

    e = table(spark, sf_dir, "events")
    f = e.select(
        "event_id",
        F.concat(F.lit("10.0."), (F.col("user_id") % 16).cast("string"), F.lit(".7")).alias("sa"),
        F.concat(F.lit("192.168.1."), (F.col("event_id") % 8).cast("string")).alias("da"),
        (F.lit(1024) + F.col("event_id") % 50000).cast("int").alias("sp"),
        F.when(F.col("event_id") % 3 == 0, 443)
        .when(F.col("event_id") % 3 == 1, 80)
        .otherwise(53)
        .cast("int")
        .alias("dp"),
        F.when(F.col("event_id") % 2 == 0, "TCP").otherwise("UDP").alias("pr"),
        ((F.col("event_id") * 37) % 3000).alias("ipkt"),
    ).withColumns(
        {"sa_num": F.expr("0"), "da_num": F.expr("0"), "ibyt": F.lit(0), "td": F.lit(0.0), "flg": F.lit("")}
    )
    f = f.withColumn("sa_num", ipv4_to_num(F.col("sa"))).withColumn(
        "da_num", ipv4_to_num(F.col("da"))
    )
    pred = compile_filter(
        "src net 10.0.0.0/21 and dst port 443 and proto tcp or packets > 2k"
    )
    return f.filter(pred).select("event_id", "sa", "dp", "pr", "ipkt")
