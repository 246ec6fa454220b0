"""Wave-4 operators (round 2): scale-technique keys the first two waves
left on the table — runtime-filter joins, bin-bucketed interval overlap,
Z-order layout, deterministic reservoir sampling, SCD2 change capture,
PageRank over a derived graph, OHLC resampling, anomaly z-scores,
shingle containment, and a single-pass distributed PCA.

Every hash-checked key follows SURVEY §5.3: floats rounded to 4, columns
aliased identically on both sides, `events.ts` never emitted raw (µs
arithmetic via unix_micros/epoch_us), window ORDER BYs carry unique
tiebreakers.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

US_PER_MIN = 60_000_000
US_PER_HOUR = 3_600_000_000


# --- deterministic fixed-size sampling ---------------------------------------


@register(
    "sample_reservoir",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    ORDER BY md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)),
             l_orderkey, l_linenumber
    LIMIT 500
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size k uniform sample — the deterministic analog of
    distributed reservoir sampling: rank every row by a key hash and keep
    the global k smallest. Engine sampling (`df.sample`, reservoir with
    RNG state) is partition-split-dependent and unreproducible across
    engines/reruns; hashing the KEY makes membership a pure function of
    the data, so backfills agree with the original run.

    Physical shape: `TakeOrderedAndProject` — each task keeps a k-sized
    heap, the driver merges P heaps; no full sort, no shuffle of the
    corpus. At 100 TB this is the only affordable exact global-k sample.
    (Rate-based cousin: `sample_hash_bucket`.)"""
    li = table(spark, sf_dir, "lineitem")
    rk = F.md5(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
            rk.alias("_rk"),
        )
        .orderBy("_rk", "l_orderkey", "l_linenumber")
        .limit(500)
        .drop("_rk")
    )


# --- change-data-capture: SCD type 2 -----------------------------------------


@register(
    "cdc_scd2",
    oracle="""
    WITH x AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ), ch AS (
      SELECT user_id, event_type, us, event_id FROM x
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ROW_NUMBER() OVER
             (PARTITION BY user_id ORDER BY us, event_id) AS version,
           us AS valid_from_us,
           COALESCE(LEAD(us) OVER
             (PARTITION BY user_id ORDER BY us, event_id), 0) AS valid_to_us
    FROM ch
    """,
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change stream: per
    user, collapse consecutive same-state events and emit versioned
    validity intervals [valid_from, valid_to) — the standard dimension-
    history shape a warehouse merge produces, derived here in one pass
    with lag (change detection) + lead (interval close). 0 sentinel for
    the open current interval (NULL would hash differently per engine).

    Scale: two window passes over the same (user_id) partitioning — one
    shuffle total, since Catalyst reuses the sort/exchange for windows
    with identical partitioning and compatible ordering. State never
    leaves the executor; no self-join against the dimension."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    x = e.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    ).withColumn("prev", F.lag("event_type").over(w))
    ch = x.filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    return ch.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("version"),
        F.col("us").alias("valid_from_us"),
        F.coalesce(F.lead("us").over(w), F.lit(0)).alias("valid_to_us"),
    )


# --- bin-bucketed interval-overlap join --------------------------------------


@register(
    "join_interval_bin",
    oracle="""
    SELECT a.event_id AS id1, COUNT(*) AS n_overlap
    FROM events a JOIN events b
      ON a.event_type = 'signup' AND b.event_type = 'purchase'
     AND a.ts <= b.ts + INTERVAL 3 MINUTE
     AND b.ts <= a.ts + INTERVAL 3 MINUTE
    GROUP BY 1
    """,
)
def join_interval_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with NO equi key, made shuffle-joinable by
    bin bucketing (the Databricks/Delta range-join optimization): each
    3-minute interval is exploded to the fixed-width time bins it covers
    (bin width = interval length → ≤2 bins/row), candidates come from a
    bin equi-join, double-counted pairs collapse via distinct, and the
    exact overlap predicate filters residually. Without this, Spark
    plans a broadcast-nested-loop (O(N·M) comparisons); with it, work is
    proportional to true temporal locality. Survives 100 TB because bins
    partition time: co-occurring rows land in the same hash partition
    and skew equals genuine hot-window density (AQE splits those).

    Contract: signup→purchase overlaps within ±3 min; one row per signup
    event that has ≥1 overlapping purchase."""
    e = table(spark, sf_dir, "events")
    W = 3 * US_PER_MIN  # bin width == interval width ⇒ ≤2 bins per interval

    def side(etype: str, idc: str, sc: str, ec: str) -> DataFrame:
        us = F.unix_micros("ts")
        return e.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(idc),
            us.alias(sc),
            (us + F.lit(3 * US_PER_MIN)).alias(ec),
        )

    a = side("signup", "id1", "s1", "e1").withColumn(
        "bin", F.explode(F.sequence(F.floor(F.col("s1") / W), F.floor(F.col("e1") / W)))
    )
    b = side("purchase", "id2", "s2", "e2").withColumn(
        "bin", F.explode(F.sequence(F.floor(F.col("s2") / W), F.floor(F.col("e2") / W)))
    )
    pairs = (
        a.join(b, "bin")
        .filter((F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")))
        .select("id1", "id2")
        .distinct()
    )
    return pairs.groupBy("id1").agg(F.count(F.lit(1)).alias("n_overlap"))


# --- Z-order data layout -----------------------------------------------------

_ZBITS = 8


def _z_sql(a: str, b: str) -> str:
    """DuckDB expression interleaving the low 8 bits of a (even positions)
    and b (odd positions) — textually mirrored by `_z_col`."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(((({a} % 256) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b} % 256) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _z_col(a, b):
    a, b = F.pmod(a, F.lit(256)), F.pmod(b, F.lit(256))
    out = F.lit(0)
    for i in range(_ZBITS):
        out = out + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


@register(
    "zorder_layout",
    oracle=f"""
    SELECT {_z_sql('l_partkey', 'l_suppkey')} >> 8 AS z_bucket,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS qty_sum
    FROM lineitem
    GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two
    dimensions so a lexicographic sort co-locates 2-D neighborhoods —
    the layout trick behind Delta OPTIMIZE ZORDER BY. Sorting a 100 TB
    table by z(l_partkey, l_suppkey) lets parquet row-group min/max
    stats skip IO for BOTH `partkey BETWEEN..` and `suppkey BETWEEN..`
    boxes, where a plain sort serves only its leading column
    (tests/test_plans.py pins the skip-rate win on real files).

    The key itself is scan-local codegen'd bit arithmetic (zero shuffle);
    this query folds it into per-z-bucket stats to hash-check the
    interleave exactly against the oracle."""
    li = table(spark, sf_dir, "lineitem")
    z = _z_col(F.col("l_partkey"), F.col("l_suppkey"))
    return (
        li.select(F.shiftright(z, 8).alias("z_bucket"), "l_quantity")
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("qty_sum"),
        )
    )


# --- runtime-filter (Bloom) join ---------------------------------------------

_BLOOM_BITS = 4096
_BLOOM_K = 3


def bloom_build(dim: DataFrame, key: str) -> list[int]:
    """Aggregate the dim side's k hash positions into a 64-long bitmap —
    ≤64 rows collected, O(1) driver traffic regardless of dim size."""

    def positions(k: str):
        return [
            F.expr(f"pmod(xxhash64({i}, {k}), {_BLOOM_BITS})")
            for i in range(_BLOOM_K)
        ]

    words = (
        dim.select(F.explode(F.array(*positions(key))).alias("_pos"))
        .select(
            F.shiftright(F.col("_pos").cast("int"), 6).alias("w"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    filt = [0] * (_BLOOM_BITS // 64)
    for r in words:
        filt[r["w"]] = r["bits"]
    return filt


def bloom_might_contain(filt: list[int], key: str):
    """Scan-side membership predicate over the inlined bitmap literal."""
    arr = F.array(*[F.lit(x).cast("long") for x in filt])
    conds = []
    for i in range(_BLOOM_K):
        p = f"pmod(xxhash64({i}, {key}), {_BLOOM_BITS})"
        word = F.element_at(
            arr, F.expr(f"cast(shiftright(cast({p} as int), 6) as int) + 1")
        )
        mask = F.expr(f"shiftleft(1L, cast(pmod({p}, 64) as int))")
        conds.append(word.bitwiseAND(mask) != 0)
    return reduce(and_, conds)


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT COUNT(*) AS n_items, ROUND(SUM(l.l_extendedprice), 4) AS price_sum
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 7
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: build a Bloom filter over the selective dim
    side (suppliers of one nation) and push it into the fact scan as a
    codegen'd bitmask predicate, so ~94% of lineitem rows die AT THE SCAN
    instead of riding the join. This is the pattern behind Spark's
    runtime row-level filtering / DPP, written out explicitly: the
    filter is 64 longs (4096 bits, k=3 xxhash64 probes) collected from a
    ≤64-row aggregate — O(1) driver traffic regardless of fact size —
    then inlined as an array literal. Bloom admits no false negatives,
    so the residual broadcast join restores exactness and the oracle is
    the PLAIN join: the hash check proves the prefilter is lossless."""
    li = table(spark, sf_dir, "lineitem")
    dim = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 7)
        .select("s_suppkey")
    )
    prefiltered = li.filter(bloom_might_contain(bloom_build(dim, "s_suppkey"), "l_suppkey"))
    return prefiltered.join(
        F.broadcast(dim), prefiltered.l_suppkey == dim.s_suppkey
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 4).alias("price_sum"),
    )


# --- flows: DDoS amplification detection -------------------------------------


@register(
    "flows_ddos_amplification",
    oracle="""
    WITH f AS (
      SELECT '10.1.' || CAST((user_id * 7 + event_id) % 40 AS VARCHAR) AS da,
             '10.0.' || CAST(user_id % 50 AS VARCHAR)                  AS sa,
             CASE WHEN event_id % 5 = 0 THEN 53
                  WHEN event_id % 7 = 0 THEN 123
                  ELSE 1024 + event_id % 401 END                       AS sp,
             CAST(FLOOR(value * 1000) AS BIGINT)
               * CASE WHEN event_id % 5 = 0 OR event_id % 7 = 0
                      THEN 47 ELSE 1 END                               AS ibyt
      FROM events
    )
    SELECT da,
           CAST(SUM(CASE WHEN sp IN (53, 123) THEN ibyt ELSE 0 END) AS BIGINT)
             AS amp_bytes,
           COUNT(DISTINCT sa) AS n_src,
           ROUND(SUM(CASE WHEN sp IN (53, 123) THEN ibyt ELSE 0 END) * 1.0
                 / SUM(ibyt), 4) AS amp_ratio
    FROM f
    GROUP BY da
    HAVING SUM(CASE WHEN sp IN (53, 123) THEN ibyt ELSE 0 END) * 1.0
           / SUM(ibyt) >= 0.5
    """,
)
def flows_ddos_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reflection/amplification-attack detector — the nfsen question the
    reference's author ships a sibling tool for [P]: per destination,
    the share of bytes arriving from amplifier source ports (DNS 53,
    NTP 123, with the protocol's ~47× gain applied) vs total; flag
    targets above 50%. Flow tuples synthesized deterministically from
    events (same recipe as flows_biflow) so the hash check covers the
    whole query. One partial+final agg keyed on `da`: at 100 TB the
    shuffle carries one row per (da) — attack targets are by definition
    few — and `count distinct sa` partial-aggregates per mapper."""
    e = table(spark, sf_dir, "events")
    is_amp = (F.col("event_id") % 5 == 0) | (F.col("event_id") % 7 == 0)
    f = e.select(
        F.concat(
            F.lit("10.1."), ((F.col("user_id") * 7 + F.col("event_id")) % 40).cast("string")
        ).alias("da"),
        F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias("sa"),
        F.when(F.col("event_id") % 5 == 0, 53)
        .when(F.col("event_id") % 7 == 0, 123)
        .otherwise(1024 + F.col("event_id") % 401)
        .alias("sp"),
        (
            F.floor(F.col("value") * 1000).cast("bigint")
            * F.when(is_amp, 47).otherwise(1)
        ).alias("ibyt"),
    )
    amp = F.sum(F.when(F.col("sp").isin(53, 123), F.col("ibyt")).otherwise(0))
    tot = F.sum("ibyt")
    return (
        f.groupBy("da")
        .agg(
            amp.cast("bigint").alias("amp_bytes"),
            F.countDistinct("sa").alias("n_src"),
            F.round(amp / tot, 4).alias("amp_ratio"),
            (amp / tot).alias("_r"),
        )
        .filter(F.col("_r") >= 0.5)
        .drop("_r")
    )


# --- OHLC time-series resampling ---------------------------------------------


@register(
    "ts_resample_ohlc",
    oracle="""
    WITH x AS (
      SELECT event_type, value, event_id,
             epoch_us(ts) // 3600000000 AS hour_bucket,
             ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                                ORDER BY epoch_us(ts), event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, hour_bucket,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           COUNT(*) AS n
    FROM x
    GROUP BY event_type, hour_bucket
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample an event stream to hourly OHLC (open/high/low/close)
    bars per series — the canonical time-series rollup. Open/close are
    first/last by (ts, event_id); formulated as two row_number windows
    over the SAME (series, bucket) partitioning feeding one hash agg, so
    Spark plans a single sort+exchange reused by both windows. At 100 TB
    the shuffle is one row per (series, hour) after map-side partials
    for high/low/n; open/close ride the same exchange. (min_by/max_by
    would fold the windows into the agg but tie-break on value equality
    engine-specifically — the window form is deterministic. SURVEY
    §5.3.)"""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    x = e.select(
        "event_type",
        "value",
        "event_id",
        us.alias("us"),
        F.floor(us / US_PER_HOUR).alias("hour_bucket"),
    )
    pb = ["event_type", "hour_bucket"]
    wa = Window.partitionBy(*pb).orderBy("us", "event_id")
    wd = Window.partitionBy(*pb).orderBy(F.col("us").desc(), F.col("event_id").desc())
    x = x.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return x.groupBy(*pb).agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


# --- anomaly detection: trailing z-score -------------------------------------


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH h AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), z AS (
      SELECT event_type, hour_bucket, n,
             AVG(n) OVER w AS mu,
             STDDEV_SAMP(n) OVER w AS sigma,
             COUNT(*) OVER w AS n_hist
      FROM h
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_bucket, n,
           ROUND((n - mu) / sigma, 4) AS zscore
    FROM z
    WHERE n_hist >= 12 AND sigma > 0 AND ABS((n - mu) / sigma) >= 2.0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops anomaly detection: hourly event-rate z-score against each
    series' trailing 24-hour window (excluding the current hour), flag
    |z| ≥ 2 with ≥12 h of history. The pre-aggregation is the scale
    valve: the window runs over one row per (series, hour) — at 100 TB
    that is ~10⁵ rows per series-year, trivially windowable — never over
    raw events. Rows-frame trailing stats then stay executor-local per
    series."""
    e = table(spark, sf_dir, "events")
    h = (
        e.select(
            "event_type",
            F.floor(F.unix_micros("ts") / US_PER_HOUR).alias("hour_bucket"),
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(-24, -1)
    )
    z = h.select(
        "event_type",
        "hour_bucket",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    zexpr = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        z.filter(
            (F.col("n_hist") >= 12) & (F.col("sigma") > 0) & (F.abs(zexpr) >= 2.0)
        )
        .select(
            "event_type", "hour_bucket", "n", F.round(zexpr, 4).alias("zscore")
        )
    )


# --- PageRank over a derived trade graph -------------------------------------

_PR_EDGES_SQL = """
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
"""


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT n.n_nationkey AS node,
             0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE(SUM({prev}.rank * ee.frac), 0) AS rank
      FROM nation n
      LEFT JOIN ee ON ee.dst = n.n_nationkey
      LEFT JOIN {prev} ON {prev}.node = ee.src
      GROUP BY 1
    )"""


@register(
    "graph_pagerank",
    oracle=f"""
    WITH e AS ({_PR_EDGES_SQL}),
    outw AS (SELECT src, SUM(w) AS wout FROM e GROUP BY src),
    ee AS (SELECT e.src, e.dst, e.w * 1.0 / o.wout AS frac
           FROM e JOIN outw o ON e.src = o.src),
    nn AS (SELECT COUNT(*) AS n FROM nation),
    r0 AS (SELECT n_nationkey AS node, 1.0 / (SELECT n FROM nn) AS rank
           FROM nation),
    {_pr_iter_sql('r0', 'r1')},
    {_pr_iter_sql('r1', 'r2')},
    {_pr_iter_sql('r2', 'r3')}
    SELECT node, ROUND(rank, 4) AS rank FROM r3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, d=0.85) over the customer-nation →
    supplier-nation trade graph derived from the fact tables. The
    expensive part — and the part that scales — is the edge extraction:
    a star join over lineitem with broadcast dims folding 100 TB of
    facts into one weighted edge per nation pair. Iterations are then
    DataFrame joins (edges ⋈ ranks on src, re-agg on dst), the identical
    plan GraphFrames emits for billion-edge graphs: rank updates shuffle
    |E| rows per round, dims stay broadcast. Dangling-mass
    redistribution is intentionally omitted (every fixture nation has
    out-edges; both engines compute the same recurrence either way).
    Fixed iteration count keeps the result a pure function of the input
    — hash-checkable against the unrolled-CTE oracle."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    ee = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("wout")).alias("frac")
    )
    # nation-pair edge table is tiny after the agg; checkpoint so the 3
    # iterations re-read it instead of re-running the star join
    ee = ee.localCheckpoint()
    n_nodes = n.count()
    if n_nodes == 0:
        # empty node table (r9 edge batch, class-3 guard): the teleport
        # constant 1/n is a Python division — mirror the oracle's empty
        # result instead of ZeroDivisionError, schema-stable
        return n.select(
            F.col("n_nationkey").alias("node"), F.lit(0.0).alias("rank")
        )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(3):
        contrib = (
            ee.join(ranks, ee.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("m"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(0.15 / n_nodes) + F.lit(0.85) * F.coalesce("m", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", 4).alias("rank"))


# --- shingle containment (asymmetric near-dup) -------------------------------


@register(
    "text_containment",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(GREATEST(c * 1.0 / x.n, c * 1.0 / y.n), 4) AS containment
    FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
    WHERE GREATEST(c * 1.0 / x.n, c * 1.0 / y.n) >= 0.7
    """,
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shingle containment max(|A∩B|/|A|, |A∩B|/|B|)
    ≥ 0.7 — catches a document EMBEDDED in a larger one (quote, concat,
    crawl wrapper), which resemblance (Jaccard) dilutes below any usable
    threshold; it is the measure decontamination actually needs
    (benchmark items quoted inside training pages). Reuses the capped
    inverted-shingle-index pair machinery of dedup_ngram_jaccard — same
    two bounded shuffles, different final normalization."""
    from .dedup_extra import shingle_pair_counts

    inter = shingle_pair_counts(spark, sf_dir)
    cont = F.greatest(
        F.col("c") / F.col("n1"), F.col("c") / F.col("n2")
    )
    return inter.filter(cont >= 0.7).select(
        "id1", "id2", F.round(cont, 4).alias("containment")
    )


# --- single-pass distributed PCA ---------------------------------------------


@register("emb_pca_project")  # rows-only: eigendecomposition has no SQL analog
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA, the one-pass shape that scales: (1) mapInPandas
    computes per-Arrow-batch Gram partials Xᵀ X and feature sums with one
    numpy GEMM each — emitting a fixed 64×64 matrix per batch regardless
    of row count; (2) a tiny reduce sums them (shuffle volume: P·64²
    doubles, independent of corpus size); (3) the driver eigendecomposes
    the 64×64 covariance (O(dim³), constant); (4) top-4 components are
    broadcast back as a literal and projection is one vectorized GEMM per
    batch. No iteration, no per-row Python, no N×dim collect. Rows-only:
    tests/test_correctness.py pins variance-explained and
    reconstruction-orthogonality against numpy's full PCA instead.
    """
    import numpy as np
    import pandas as pd

    # a NULL embedding is un-projectable (r9 edge batch, nullmix mode:
    # None cells would break the np.stack in every Arrow batch)
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())
    )
    dim = 64

    def gram_partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(X.shape[0])],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = e.select("embedding").mapInPandas(
        gram_partials, "n double, s array<double>, g array<double>"
    )
    agg = parts.agg(
        F.sum("n").alias("n"),
        F.array(*[F.sum(F.element_at("s", i + 1)) for i in range(dim)]).alias("s"),
    )
    # gram matrix reduced the same way but via explode to keep the agg
    # expression count bounded: 4096 positions → (pos, val) rows
    gsum = (
        parts.select(F.posexplode("g").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("v"))
        .collect()
    )
    row = agg.collect()[0]
    if not row["n"]:
        # empty corpus (r9 edge batch, class-3 guard): the global agg's
        # one row carries NULL totals — no moments to decompose, return
        # the schema-stable empty projection instead of None arithmetic
        return spark.createDataFrame(
            [], "vec_id long, pc1 double, pc2 double, pc3 double, pc4 double"
        )
    n_rows, s = row["n"], np.array(row["s"])
    G = np.zeros(dim * dim)
    for r in gsum:
        G[r["pos"]] = r["v"]
    G = G.reshape(dim, dim)
    mean = s / n_rows
    cov = G / n_rows - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :4]  # top-4 components, (dim, 4)
    # deterministic sign: force the largest-|coeff| entry positive
    for j in range(4):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    comps_b = comps.copy()
    mean_b = mean.copy()

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            P = (X - mean_b) @ comps_b
            out = pd.DataFrame(P.round(4), columns=["pc1", "pc2", "pc3", "pc4"])
            out.insert(0, "vec_id", pdf["vec_id"].to_numpy())
            yield out

    return e.mapInPandas(
        project, "vec_id long, pc1 double, pc2 double, pc3 double, pc4 double"
    )
