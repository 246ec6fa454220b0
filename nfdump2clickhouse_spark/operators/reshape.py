"""Reshape + subquery + sampling + skew-handling operators.

Query-surface breadth beyond SURVEY §2's core tables: pivot/unpivot
(ClickHouse users express these as conditional aggregation / ARRAY JOIN
[P]), scalar and correlated subqueries, deterministic sampling for
training-data curation, and a salted join demonstrating the skew recipe
the 100 TB mandate calls for (SURVEY §4.2 — AQE handles skew reactively;
salting is the proactive variant and must stay result-identical).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import register_views, table
from ..registry import register

# --- pivot / unpivot ---------------------------------------------------------


@register(
    "reshape_pivot",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS "O",
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS "F",
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders: one row per priority, one column per order status.

    The pivot values are DECLARED (`pivot(col, values)`), not discovered —
    at 100 TB the two-pass value-discovery scan is a full extra read of
    the fact table; with explicit values the plan is a single partial+final
    hash aggregation, same as any groupBy."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 4))
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'qty' AS metric,
           ROUND(l_quantity, 4) AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', ROUND(l_extendedprice, 4) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', ROUND(l_discount, 4) FROM lineitem
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three lineitem measures into (metric, value) rows —
    `df.unpivot` plans as a single-pass Expand (3 output rows per input
    row, no shuffle, no self-union rescan of the table)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 4).alias("qty"),
        F.round("l_extendedprice", 4).alias("price"),
        F.round("l_discount", 4).alias("disc"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"], ["qty", "price", "disc"], "metric", "value"
    )


# --- subqueries --------------------------------------------------------------


@register(
    "sub_scalar",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS price,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4) AS delta
    FROM orders WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders ≥1.8× the global mean price.
    Catalyst executes the subquery once and folds the scalar into the
    predicate — the fact-table pass stays a pushdown-able single scan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS price,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4) AS delta
        FROM orders WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@register(
    "sub_correlated",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 4) AS price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 2 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def sub_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders >2× their own customer's average.
    `RewriteCorrelatedScalarSubquery` decorrelates this into an aggregate
    + equi-join (SURVEY §4.2) — no per-row re-execution, one shuffle on
    o_custkey shared by the aggregate and the join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 4) AS price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


# --- deterministic sampling --------------------------------------------------

#: Knuth's multiplicative constant — the hash is plain integer arithmetic so
#: the oracle reproduces it exactly (engine-hash sampling can't be checked).
_MULT = 2654435761


@register(
    "sample_hash_bucket",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    WHERE ((l_orderkey * 10 + l_linenumber) * {_MULT}) % 4294967296 % 100 < 10
    """,
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by multiplicative key-hash bucket.

    `df.sample()` is seed-dependent per partition-split and not
    reproducible across engines or even re-reads; curation pipelines need
    the sample membership to be a pure function of the KEY so reruns,
    backfills, and held-out splits agree. Scan-local arithmetic: no
    shuffle, and the predicate stays in whole-stage codegen."""
    li = table(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    bucket = (key * F.lit(_MULT)) % F.lit(4294967296) % 100
    return li.filter(bucket < 10).select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("price")
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           ROUND(SUM(l_extendedprice), 4) AS price_sum
    FROM lineitem
    WHERE (l_orderkey * 10 + l_linenumber) * {_MULT} % 4294967296 % 100
          < CASE l_returnflag WHEN 'R' THEN 50 WHEN 'A' THEN 20 ELSE 5 END
    GROUP BY l_returnflag
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (R: 50%,
    A: 20%, rest: 5%) — the class-rebalancing primitive for training-data
    curation. Same key-hash as sample_hash_bucket with a per-stratum
    threshold; still a scan-local filter followed by one aggregation."""
    li = table(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    bucket = (key * F.lit(_MULT)) % F.lit(4294967296) % 100
    rate = (
        F.when(F.col("l_returnflag") == "R", 50)
        .when(F.col("l_returnflag") == "A", 20)
        .otherwise(5)
    )
    return (
        li.filter(bucket < rate)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("l_extendedprice"), 4).alias("price_sum"),
        )
    )


# --- skew handling -----------------------------------------------------------


@register(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice), 4) AS price_sum
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join, result-identical to the plain join (the oracle IS
    the plain join): the probe side gets a deterministic salt in [0, S),
    the build side is exploded ×S, and the join key becomes (key, salt) —
    a hot key's rows spread over S reducers instead of one straggler.

    This is the proactive skew recipe for when AQE's reactive skew-join
    split (enabled in session.py) can't help — e.g. a skewed aggregation
    feeding the join, or a build side too big to broadcast but with a few
    pathological keys. S=8 here; at 100 TB, size S to the observed hot-key
    multiplicity."""
    S = 8
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    salted_li = li.withColumn("salt", (F.col("l_linenumber") % S).cast("int"))
    salted_o = o.withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(S)])))
    joined = salted_li.join(
        salted_o,
        (salted_li.l_orderkey == salted_o.o_orderkey)
        & (salted_li.salt == salted_o.salt),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 4).alias("price_sum"),
    )


# --- upsert / merge ----------------------------------------------------------


@register(
    "merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, ROUND(c_acctbal + 100, 4) AS acctbal, 'updated' AS src
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 0.0, 'inserted' FROM customer
      WHERE c_custkey % 50 = 0
    )
    SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
           ROUND(COALESCE(u.acctbal, b.c_acctbal), 4) AS acctbal,
           COALESCE(u.src, 'unchanged') AS src
    FROM customer b FULL JOIN updates u ON b.c_custkey = u.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE/upsert semantics (update-matched, insert-unmatched,
    keep-rest) composed from a full outer join + coalesce — the
    row-level-update primitive plain parquet lacks (ClickHouse gets it
    from ReplacingMergeTree merges [P]; lakehouse formats from MERGE).
    One shuffle per side on the key; applied per dt= partition in
    production so a trickle of updates never rewrites the whole table."""
    c = table(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 100, 4).alias("acctbal"),
            F.lit("updated").alias("src"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit(0.0).alias("acctbal"),
                F.lit("inserted").alias("src"),
            )
        )
    )
    b = c.select("c_custkey", "c_acctbal")
    u = updates.withColumnRenamed("c_custkey", "u_key")
    return b.join(u, b.c_custkey == u.u_key, "full").select(
        F.coalesce("u_key", "c_custkey").alias("c_custkey"),
        F.round(F.coalesce("acctbal", "c_acctbal"), 4).alias("acctbal"),
        F.coalesce("src", F.lit("unchanged")).alias("src"),
    )


@register(
    "pack_token_budget",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    c AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
      FROM t
    )
    SELECT CAST(FLOOR(st / 2048.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY 1
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: assign documents, in canonical
    doc_id order, to fixed token-budget bins (budget 2048; a bin may
    overrun by at most its last doc — contiguous greedy packing, the
    standard pre-tokenization batching pass).

    The primitive is a GLOBAL exclusive prefix sum, and the naive
    formulation — a window with ORDER BY and no PARTITION BY — funnels
    the whole corpus through one task, the classic 100 TB deadlock.
    r11 (guide §1.2/§2.4): the ``prefix_sums`` mechanism ran four
    serial driver jobs (localCheckpoint, boundary sample, subtotal
    collect, final); the two-phase scan is now fully IN-PLAN — range
    ids are equi-width-bin literals over the doc_id [min,max] read from
    the parquet footers (driver metadata, no job; stats-less files fall
    back to one min/max aggregation over just the doc_id column), the
    per-bin start offsets come from a bounded nbins-row window +
    broadcast join (allowlisted unpartitioned window: one row per bin,
    bins scale with the cluster, never the data), and the binning
    exchange is shared by the offsets arm and the in-bin window, so
    tokenization runs ONCE and the whole pack is one executed job.
    Monotone bin ids preserve the doc_id global order exactly; bin
    balance only affects parallelism, never the prefix values, so the
    result stays independent of the physical split."""
    from ..catalog import parquet_column_stats
    from ..functions.text import words

    budget = 2048
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words(F.col("text"))).alias("n_tok")
    )
    stats = parquet_column_stats(sf_dir, "documents", "doc_id")
    if stats is None:
        row = (
            table(spark, sf_dir, "documents")
            .agg(F.min("doc_id"), F.max("doc_id"))
            .collect()[0]
        )
        lo, hi = row[0], row[1]
    else:
        lo, hi = stats[0], stats[1]
    nbins = max(spark.sparkContext.defaultParallelism, 2) * 8
    if lo is None or hi is None or hi == lo:
        pid = F.lit(0)
    else:
        width = (float(hi) - float(lo)) / nbins
        # NULL doc_id sorts first (Spark ASC NULLS FIRST) → bin 0
        pid = F.when(F.col("doc_id").isNull(), 0).otherwise(
            F.least(
                F.floor((F.col("doc_id").cast("double") - float(lo)) / width),
                F.lit(nbins - 1),
            )
        ).cast("int")
    sp = d.withColumn("_pid", pid).repartition("_pid")
    # one window pass yields BOTH the in-bin exclusive prefix and the
    # bin total (full-frame second spec, same sort, no new exchange);
    # the tiny offsets arm then branches ABOVE the window, so its
    # pruned copy shares the binning exchange byte-for-byte with the
    # main arm (ReusedExchange at runtime — tokenization runs once)
    w_run = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the bin-total frame carries the SAME orderBy as the running frame
    # (value-identical: the frame is unbounded) so both arms demand the
    # same columns below the exchange — required for the reuse match
    w_bin = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wout = sp.select(
        "doc_id",
        "n_tok",
        "_pid",
        F.coalesce(F.sum("n_tok").over(w_run), F.lit(0)).alias("lc"),
        F.coalesce(F.sum("n_tok").over(w_bin), F.lit(0)).alias("bt"),
    )
    offw = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        wout.select("_pid", "bt")
        .distinct()
        .select("_pid", F.coalesce(F.sum("bt").over(offw), F.lit(0)).alias("off"))
    )
    p = wout.join(F.broadcast(offs), "_pid").withColumn(
        "_ps_n_tok", (F.col("off") + F.col("lc")).cast("bigint")
    )
    return (
        p.withColumn("bin_id", F.floor(F.col("_ps_n_tok") / budget))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
