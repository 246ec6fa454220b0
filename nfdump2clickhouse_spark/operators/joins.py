"""Join operators (SURVEY §2.3).

The reference tool itself performs zero joins; this family is the
enrichment-query surface its ClickHouse table serves (GeoIP / customer /
incident-window joins [P]) on the driver's TPC-H-ish fixtures.

Scale notes: small dims are broadcast (no shuffle of the big side); the
star join leans on AQE to re-plan mid-query; the theta/range join keeps an
equi key so Catalyst plans a hash join with a residual range predicate
instead of a cartesian product; the as-of join is a union+window
formulation that shuffles each side once on the join key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register


@register(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .filter(c.c_mktsegment == "BUILDING")
        .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_size
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 5
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: the dim ships to every executor, the 100 TB fact
    side never shuffles."""
    l, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p.filter(F.col("p_size") <= 5)), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "l_linenumber", "p_brand", "p_size")
    )


@register(
    "join_multiway",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join — AQE broadcasts the dims and reorders at runtime."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer + null-extension counting (customers with zero orders)."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, f.custkey AS fkey, f.n_f_orders
    FROM (SELECT o_custkey AS custkey, COUNT(*) AS n_f_orders
          FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
    FULL JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
      ON f.custkey = c.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    f = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_f_orders"))
    )
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return f.join(b, f.custkey == b.c_custkey, "full").select(
        "c_custkey", F.col("custkey").alias("fkey"), "n_f_orders"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence — left-semi never duplicates or widens the probe side."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence (customers with no orders) — left-anti."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, n = table(spark, sf_dir, "region"), table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_theta_range",
    oracle="""
    SELECT a.user_id, a.event_id AS id1, b.event_id AS id2
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND a.event_id < b.event_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi interval join (flow-overlap analog).

    r11 optimization (guide §3): a user-only equi key leaves the whole
    5-minute predicate as a residual — every same-user event pair is
    probed (O(per-user²) compute: ~3.3M pair evaluations at sf0.1, and
    at 100 TB a heavy user's history is quadratic). Adding a 5-minute
    time-bucket to the equi key bounds candidates to the two buckets a
    match can live in: ts2 ∈ [ts1, ts1+5min] ⇒ floor(µs2/3e8) ∈
    {floor(µs1/3e8), +1}, so the left side explodes ×2 over those
    bucket ids and each true pair matches on EXACTLY one of them — no
    dedup needed, byte-identical output. Candidates shrink to same-user
    events in a ±1 bucket neighbourhood (near output-sized), and the
    per-key group stays bounded at any corpus size. A NULL ts produces
    a NULL bucket key, which matches nothing — same as the old residual
    NULL comparison.

    Bucket ids are EXACT integer floor division (ADVICE r11): the double
    form floor(µs/3e8) is correct only while the quotient's fractional
    offset exceeds half-ULP, an argument that silently breaks past
    ~2^31 buckets. (µs − pmod(µs, b)) is a multiple of b for any sign,
    so the long division below is exact arithmetic, not FP."""
    e = table(spark, sf_dir, "events")
    bucket_us = 300_000_000  # 5 minutes in microseconds

    def _bucket(ts_col: str):
        # (µs − pmod(µs,b)) is an exact multiple of b, so `div` (integer
        # division, exact at any magnitude) equals mathematical floor(µs/b)
        return F.expr(
            f"(unix_micros({ts_col}) - pmod(unix_micros({ts_col}), "
            f"{bucket_us}L)) div {bucket_us}L"
        )

    a = e.select(
        F.col("user_id"),
        F.col("event_id").alias("id1"),
        F.col("ts").alias("ts1"),
    ).withColumn(
        "bk",
        F.explode(F.array(_bucket("ts1"), _bucket("ts1") + 1)),
    )
    b = e.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("ts2"),
        _bucket("ts").alias("bk_b"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.user_id_b)
            & (F.col("bk") == F.col("bk_b"))
            & (F.col("ts2") >= F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 5 MINUTES"))
            & (F.col("id1") < F.col("id2")),
        )
        .select("user_id", "id1", "id2")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    left_out: str | None = None,
    right_out: str | None = None,
) -> DataFrame:
    """As-of join: match each left row to the latest right row with
    right_ts <= left_ts, per `on` key (SURVEY §4.3.3 — no Spark builtin).

    Union-window formulation: tag both sides, sort within key by
    (ts, side, id) so a right row at the exact same timestamp sorts before
    the left rows it should match, then propagate the last-seen right id
    with last(..., ignoreNulls). One shuffle per side on the join key; the
    running state is O(1) per row — scales linearly.
    """
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(left_id).alias("_lid"),
        F.lit(None).cast("long").alias("_rid"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_lid"),
        F.col(right_id).alias("_rid"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.coalesce("_lid", "_rid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_rid", ignorenulls=True).over(w))
        .filter((F.col("_side") == 1) & F.col("_match").isNotNull())
        .select(
            F.col("_k").alias(on),
            F.col("_lid").alias(left_out or left_id),
            F.col("_match").alias(right_out or right_id),
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, s.event_id AS signup_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the latest prior signup per user — DuckDB's
    native ASOF JOIN is the oracle (strong cross-check of the custom op)."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    signups = e.filter(F.col("event_type") == "signup")
    return asof_join(
        purchases,
        signups,
        "user_id",
        "ts",
        "ts",
        "event_id",
        "event_id",
        left_out="purchase_id",
        right_out="signup_id",
    )


# Synthetic routing table over the 10.0.0.0/16 space the synthesized flow
# addresses (SURVEY §2.8 ip_funcs) live in: mixed prefix lengths, complete
# disjoint cover, so every event enriches to exactly one network label.
_PREFIX_TABLE = [
    ("10.0.0.0/18", "net-a"),
    ("10.0.64.0/18", "net-b"),
    ("10.0.128.0/20", "net-c"),
    ("10.0.144.0/20", "net-d"),
    ("10.0.160.0/19", "net-e"),
    ("10.0.192.0/18", "net-f"),
]
_BUCKET_BITS = 12  # /20 buckets: no prefix here is longer than /20


def _prefix_rows() -> list[tuple[int, int, str]]:
    from ..functions.ip import cidr_range

    return [(*cidr_range(c), label) for c, label in _PREFIX_TABLE]


_PREFIX_VALUES_SQL = ", ".join(
    f"({lo}, {hi}, '{label}')" for lo, hi, label in _prefix_rows()
)


@register(
    "join_ip_prefix_lookup",
    oracle=f"""
    WITH ips AS (
      SELECT user_id,
             167772160 + (user_id % 256) * 256 + 7 AS ip_num
      FROM events
    ),
    px(lo, hi, label) AS (VALUES {_PREFIX_VALUES_SQL})
    SELECT label, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM ips JOIN px ON ip_num BETWEEN lo AND hi
    GROUP BY label
    """,
)
def join_ip_prefix_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR-prefix enrichment join (GeoIP/ASN lookup — ClickHouse solves
    this with `ip_trie` dictionaries [P]): every flow address mapped to
    its covering prefix's label, then traffic aggregated per network.

    The scalable shape, not the naive one: a prefix table joined on
    `ip BETWEEN lo AND hi` alone is a nested-loop over every (flow,
    prefix) pair. Instead each prefix is exploded into the fixed-width
    /20 buckets it covers (`sequence(lo >> 12, hi >> 12)` — a /18 is 4
    rows, a /20 is 1), the flow side derives its bucket with one shift,
    and the join is an equi-join on the bucket key with the range kept
    as a residual predicate. Catalyst broadcasts the exploded dim here;
    at a full BGP table (~1M routes, ~4M bucket rows) the same plan
    degrades gracefully to a shuffled hash join co-partitioned on
    bucket — either way, never O(flows × prefixes). Deeper-than-/20
    prefixes would shard a bucket; longest-prefix-match tie-breaking is
    then a `max_by(label, masklen)` per flow — not needed on this
    disjoint cover."""
    from ..functions.ip import ipv4_to_num

    e = table(spark, sf_dir, "events")
    ip = F.concat(
        F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".7")
    )
    flows = e.select(
        "user_id", ipv4_to_num(ip).alias("ip_num")
    ).withColumn("bucket", F.shiftright("ip_num", _BUCKET_BITS))
    px = spark.createDataFrame(
        _prefix_rows(), "lo BIGINT, hi BIGINT, label STRING"
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.shiftright("lo", _BUCKET_BITS),
                F.shiftright("hi", _BUCKET_BITS),
            )
        ),
    )
    return (
        flows.join(F.broadcast(px), "bucket")
        .filter(F.col("ip_num").between(F.col("lo"), F.col("hi")))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
