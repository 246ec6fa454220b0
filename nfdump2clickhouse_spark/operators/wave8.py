"""Wave-8 operators (round 2): Spark 4 SQL surface (recursive CTEs, pipe
syntax, collations, approx_top_k, lateral correlated subqueries) and
operational scan robustness (schema evolution, malformed CSV).

Same SURVEY §5.3 conventions as waves 4-7.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register


def _register_tpch_views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "supplier"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"w8_{t}")


# --- recursive CTE -----------------------------------------------------------


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ),
    reach(node, hops) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT e.b, r.hops + 1
      FROM reach r JOIN edges e ON e.a = r.node
      WHERE r.hops < 2
    )
    SELECT node, MIN(hops) AS hops FROM reach GROUP BY node
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0's WITH RECURSIVE): bounded transitive
    closure — trade-reachability from nation 0 with minimum hop count
    over the directed customer→supplier nation graph. The iterative
    cousin of `graph_pagerank`/`dedup_cluster_cc` expressed purely in
    SQL: each recursion step is a join of the frontier against the edge
    list, exactly the plan the hand-rolled loop emits, but planned and
    iterated by the engine.

    Scale notes: the corpus-sized work is the edge extraction (star
    join + distinct, shared shape with `graph_triangle_count`); the
    recursion then touches only |frontier|×|E| rows per step. The hop
    bound is the termination guarantee — unbounded recursion on a
    cyclic graph never reaches a fixpoint under UNION ALL semantics
    (both engines would loop; UNION-dedup recursion is the cycle-safe
    variant)."""
    _register_tpch_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT DISTINCT c_nationkey AS a, s_nationkey AS b
          FROM w8_lineitem
          JOIN w8_orders ON l_orderkey = o_orderkey
          JOIN w8_customer ON o_custkey = c_custkey
          JOIN w8_supplier ON l_suppkey = s_suppkey
          WHERE c_nationkey <> s_nationkey
        ),
        reach(node, hops) AS (
          SELECT CAST(0 AS BIGINT), 0
          UNION ALL
          SELECT e.b, r.hops + 1
          FROM reach r JOIN edges e ON e.a = r.node
          WHERE r.hops < 2
        )
        SELECT node, MIN(hops) AS hops FROM reach GROUP BY node
        """
    )


# --- pipe syntax -------------------------------------------------------------


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operators, the GoogleSQL-style
    linear form): the pricing-summary rollup written as a top-to-bottom
    pipeline — FROM |> WHERE |> AGGREGATE. Pure syntax: Catalyst lowers
    it to the identical logical plan as the ANSI form (the oracle IS
    that form), so every optimization (pushdown, partial agg) applies
    unchanged. Matters operationally because generated/templated queries
    compose by appending a stage instead of rewriting nested SELECTs."""
    _register_tpch_views(spark, sf_dir)
    return spark.sql(
        """
        FROM w8_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE COUNT(*) AS n,
                     ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
           GROUP BY l_returnflag, l_linestatus
        """
    ).select("l_returnflag", "l_linestatus", "n", "revenue")


# --- collation-aware grouping ------------------------------------------------


@register(
    "str_collation",
    oracle="""
    SELECT lower(mixed) AS k, COUNT(*) AS n
    FROM (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS mixed
      FROM events
    )
    GROUP BY lower(mixed)
    """,
)
def str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE): group a mixed-case
    column under UTF8_LCASE so 'CLICK' and 'click' land in one group —
    the engine-level answer to case-insensitive dimensions (vs
    scattering lower() into every query; with collated columns declared
    at the table level the comparison semantics follow the data).
    Output is canonicalized with lower() because the group
    REPRESENTATIVE under a case-insensitive collation is
    engine/order-dependent — only the equivalence class is defined.
    Collation compares hash like ordinary strings: still one
    partial+final agg."""
    e = table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("event_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    return (
        e.select(mixed.alias("mixed"))
        .select(F.expr("mixed COLLATE UTF8_LCASE").alias("mixed"))
        .groupBy("mixed")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower("mixed").alias("k"), "n")
    )


# --- approximate top-k -------------------------------------------------------


@register(
    "agg_approx_topk",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS cnt
    FROM events GROUP BY event_type
    ORDER BY cnt DESC, item
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (Spark 4): frequency-sketch top-k as a single
    aggregate. The sketch is EXACT while distinct items fit its capacity
    (maxItemsTracked=10000 ≫ the 5 event types), which is what makes
    this key hash-checkable; past capacity it degrades gracefully —
    that regime is `topk_spacesaving`'s contract (same guarantee family,
    engine-native vs hand-built). Output exploded to (item, cnt) rows
    and re-sorted with a deterministic tiebreak — the array's internal
    tie order is not part of the function's contract."""
    e = table(spark, sf_dir, "events")
    topk = e.agg(F.expr("approx_top_k(event_type, 10)").alias("tk"))
    return (
        topk.select(F.explode("tk").alias("x"))
        .select(F.col("x.item").alias("item"), F.col("x.count").alias("cnt"))
        .orderBy(F.desc("cnt"), "item")
    )


# --- correlated LATERAL subquery join ----------------------------------------


@register(
    "join_lateral",
    oracle="""
    SELECT o_orderkey, l.l_linenumber, l.price
    FROM orders o,
         LATERAL (SELECT l_linenumber, ROUND(l_extendedprice, 2) AS price
                  FROM lineitem
                  WHERE l_orderkey = o_orderkey
                  ORDER BY l_extendedprice DESC, l_linenumber
                  LIMIT 2) l
    WHERE o_orderkey % 500 = 0
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join — 'for each order, its 2 most
    expensive lineitems' written as a per-row subquery (§2.3 surface;
    the procedural-reading twin of `topk_per_group`). Catalyst
    DECORRELATES it: the per-row subquery is rewritten into a
    partitioned window/limit over one join — the plan never executes
    15 000 subqueries. That rewrite is the whole story at 100 TB: the
    naive nested-loop reading would be O(orders × lineitem scans)."""
    _register_tpch_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, l.l_linenumber, l.price
        FROM w8_orders,
             LATERAL (SELECT l_linenumber, ROUND(l_extendedprice, 2) AS price
                      FROM w8_lineitem
                      WHERE l_orderkey = o_orderkey
                      ORDER BY l_extendedprice DESC, l_linenumber
                      LIMIT 2) l
        WHERE o_orderkey % 500 = 0
        """
    )


# --- schema evolution --------------------------------------------------------


@register("scan_schema_evolution")  # rows-only: temp-file layout; the
# invariants (unified schema, null back-fill) are pinned in tests
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches: batch 1 writes
    (event_id, value), batch 2 adds a `quality` column; reading the
    directory with mergeSchema=true yields the unified schema with NULL
    back-fill for pre-evolution files — the append-only table lifecycle
    every long-lived ingest hits (the reference's at-rest table gains
    columns across nfdump versions [P §1.2]).

    Scale note: mergeSchema reconciles FOOTERS (one per file), not data;
    production tables pin the merged schema in a metastore instead of
    re-merging per query — the read path after that is identical."""
    base = tempfile.mkdtemp(prefix="sf_evo_")
    path = os.path.join(base, "t")
    e = table(spark, sf_dir, "events")
    e.select("event_id", "value").filter(F.col("event_id") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(path)
    e.select(
        "event_id", "value", (F.col("value") * 2).alias("quality")
    ).filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("quality").alias("n_evolved"),
        (F.count(F.lit(1)) - F.count("quality")).alias("n_backfilled"),
        F.lit(len(merged.columns)).alias("n_cols"),
    )


# --- malformed-input handling ------------------------------------------------


@register("scan_csv_malformed")  # rows-only: corrupt-record semantics are
# engine-specific by design (DuckDB's CSV error model differs)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-CSV handling, the operational reality of `nfdump -o csv`
    pipes (truncated rotations, mid-write reads): PERMISSIVE mode loads
    every line, routing unparseable ones into _corrupt_record instead of
    failing the 100 TB job at file 99 of 100 — vs DROPMALFORMED
    (silently narrower) and FAILFAST (the default disaster). Emits the
    audit row: total/good/corrupt under PERMISSIVE and the DROPMALFORMED
    row count, which is the quarantine report the service logs per
    rotation."""
    base = tempfile.mkdtemp(prefix="sf_csv_")
    p = os.path.join(base, "rows.csv")
    good = [f"{i},2024-03-01 00:0{i % 10}:00,{i * 10}" for i in range(20)]
    bad = ["not_an_int,xx,yy", "7,2024-03-01 00:00:00", "8,bad_ts,oops,extra"]
    with open(p, "w") as f:
        f.write("\n".join(good[:10] + bad[:2] + good[10:] + bad[2:]) + "\n")
    schema = (
        "event_id INT, ts TIMESTAMP, amount INT, _corrupt_record STRING"
    )
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(p)
        .cache()  # required: corrupt-record column is unstable across
        # re-scans of an un-cached CSV relation (Spark documents this)
    )
    n_total = perm.count()
    n_corrupt = perm.filter(F.col("_corrupt_record").isNotNull()).count()
    # collect(), not count(): CSV count() prunes ALL columns, the parser
    # never runs, and DROPMALFORMED silently counts the bad rows too
    # (documented Spark behavior)
    n_dropped = len(
        spark.read.schema("event_id INT, ts TIMESTAMP, amount INT")
        .option("mode", "DROPMALFORMED")
        .csv(p)
        .collect()
    )
    return spark.createDataFrame(
        [(n_total, n_total - n_corrupt, n_corrupt, n_dropped)],
        "n_total long, n_good long, n_corrupt long, n_dropmalformed long",
    )


@register(
    "udf_sql_function",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
      FROM lineitem WHERE l_quantity >= 30
    )
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(charged), 2) AS total_charged
    FROM t GROUP BY l_returnflag
    """,
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined function (CREATE FUNCTION ... RETURN, Spark 3.5+/4):
    business logic shared across queries WITHOUT leaving Catalyst — the
    function body is INLINED into the plan, so unlike every Python UDF
    tier (§2.10) it costs nothing: codegen, pushdown, and constant
    folding see straight through it. The right tool whenever the logic
    is expressible in SQL — the Python ladder exists for when it isn't.
    The oracle states the inlined form, pinning the inlining semantics."""
    _register_tpch_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION w8_charged(
          p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(SUM(w8_charged(l_extendedprice, l_discount, l_tax)), 2)
                 AS total_charged
        FROM w8_lineitem WHERE l_quantity >= 30
        GROUP BY l_returnflag
        """
    )
