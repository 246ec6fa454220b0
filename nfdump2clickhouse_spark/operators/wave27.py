"""Wave-27 keys (round 5): Spark 4 SQL surface (scripting, dynamic
identifiers, listagg, try_* safety) + keyword salience.

- ``sql_scripting_control_flow``: Spark 4 SQL scripting
  (BEGIN/DECLARE/WHILE/END) driving an iterative doubling search —
  pinned EQUIVALENT to a single declarative cumulative query (the
  procedural-vs-Catalyst equivalence, stated as a hash oracle).
- ``sql_identifier_dynamic``: `IDENTIFIER(:name)` parameter binding for
  table/column names — dynamic SQL without string interpolation (the
  injection-safe form) [P — Spark 4 IDENTIFIER clause].
- ``agg_listagg``: the SQL-standard LISTAGG ... WITHIN GROUP aggregate
  (native in Spark 4) — the declarative sibling of
  `agg_group_concat`'s collect_set composition.
- ``text_keywords_topk``: corpus keyword-salience report — for every
  document, its top TF-IDF term (integer-exact ranking), rolled up to
  'how many docs does each keyword headline'.
- ``sql_try_functions``: error-safe arithmetic/casts (try_divide,
  try_add, try_cast) — the dirty-data discipline that keeps a 100 TB
  job from dying on row 3 billion under ANSI mode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# sql_scripting_control_flow
# ---------------------------------------------------------------------------


@register(
    "sql_scripting_control_flow",
    oracle="""
    WITH v AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    b AS (  -- rows with bit_length(cents) <= j  <=>  cents < 2^j
      SELECT length(printf('%b', cents)) AS bl, COUNT(*) AS n
      FROM v GROUP BY 1
    ),
    c AS (
      SELECT bl AS j, SUM(n) OVER (ORDER BY bl) AS cum,
             SUM(n) OVER () AS total
      FROM b
    )
    SELECT CAST(MIN(j) AS BIGINT) AS j,
           CAST(1::BIGINT << CAST(MIN(j) AS INT) AS BIGINT) AS threshold_cents,
           CAST(MIN(cum) AS BIGINT) AS n_covered,
           CAST(MIN(total) AS BIGINT) AS n_total
    FROM c WHERE cum * 10 >= total * 9
    HAVING COUNT(*) > 0  -- empty input -> empty, matching the script's IF guard
    """,
)
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN / DECLARE / WHILE / END): a
    procedural doubling search for the smallest power-of-two price
    threshold covering >= 90% of lineitem rows — each WHILE iteration
    issues a real aggregate query against the registered view. The hash
    oracle is the DECLARATIVE form of the same computation (one
    bit-length bucket cumulative) — the pinned equivalence IS the
    point: control flow belongs in the script layer, but anything a
    loop of scans can compute, one cumulative scan computes cheaper
    (the 100 TB guidance this key documents; the script runs O(log
    range) scans, the oracle exactly one). `cents < 2^j` is matched to
    `bit_length(cents) <= j` exactly — integer semantics, no float
    boundary."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    # the loop re-queries the same single column O(log range) times —
    # checkpoint it once so each iteration counts a materialized
    # column, not a fresh parquet decode (the Lloyd-iteration lesson)
    # NULL prices are gated two-sided: a NULL never satisfies `cents < p`,
    # so counting NULL rows in `n` makes the 90% guard unreachable and
    # the doubling loop overflows long (nullmix ARITHMETIC_OVERFLOW at
    # `SET p = p * 2`; EDGE_SWEEP_r10 class B — mirrored WHERE in the
    # oracle's `v`)
    cents = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    cents.createOrReplaceTempView("w27_cents")
    return spark.sql(
        """
        BEGIN
          DECLARE n BIGINT DEFAULT 0;
          DECLARE m BIGINT DEFAULT 0;
          DECLARE j INT DEFAULT 0;
          DECLARE p BIGINT DEFAULT 1;
          DECLARE cnt BIGINT DEFAULT 0;
          SET n = (SELECT COUNT(*) FROM w27_cents);
          SET m = (SELECT MIN(cents) FROM w27_cents);
          -- start at the smallest power of two ABOVE the minimum value
          -- (exact integer bit-length arithmetic): any 90%-covering
          -- threshold must exceed the smallest value, so every octave
          -- skipped here is provably below the answer — and every
          -- scripting statement is a round-trip, so closed-form beats
          -- a counting loop
          SET j = length(conv(m, 10, 2));
          SET p = shiftleft(1L, j);
          SET cnt = (SELECT COUNT(*) FROM w27_cents WHERE cents < p);
          WHILE cnt * 10 < n * 9 DO
            SET j = j + 1;
            SET p = p * 2;
            SET cnt = (SELECT COUNT(*) FROM w27_cents WHERE cents < p);
          END WHILE;
          -- zero rows: no threshold exists; emit NO row (the oracle's
          -- HAVING COUNT(*) > 0 mirrors this — r7 edge sweep)
          IF n > 0 THEN
            SELECT CAST(j AS BIGINT) AS j, p AS threshold_cents,
                   cnt AS n_covered, n AS n_total;
          ELSE
            SELECT CAST(NULL AS BIGINT) AS j,
                   CAST(NULL AS BIGINT) AS threshold_cents,
                   CAST(NULL AS BIGINT) AS n_covered,
                   CAST(NULL AS BIGINT) AS n_total
            WHERE 1 = 0;
          END IF;
        END
        """
    )


# ---------------------------------------------------------------------------
# sql_identifier_dynamic
# ---------------------------------------------------------------------------


@register(
    "sql_identifier_dynamic",
    oracle="""
    SELECT o_orderpriority AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1
    """,
)
def sql_identifier_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL via the Spark 4 `IDENTIFIER(:param)` clause: the
    table AND the grouping column are runtime PARAMETERS, bound
    injection-safely (never string-interpolated into the query text) —
    how a metrics layer renders 'group revenue by <dimension> from
    <table>' requests [P — Spark IDENTIFIER clause]. The plan is
    identical to the static query (Catalyst resolves the identifier at
    analysis time — parameterization costs nothing at execution);
    `sql_parameterized` binds VALUES, this binds NAMES."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("w27_orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:dim) AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(IDENTIFIER(:measure)), 2) AS total
        FROM IDENTIFIER(:tbl) GROUP BY 1
        """,
        args={
            "tbl": "w27_orders",
            "dim": "o_orderpriority",
            "measure": "o_totalprice",
        },
    )


# ---------------------------------------------------------------------------
# agg_listagg
# ---------------------------------------------------------------------------


@register(
    "agg_listagg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard LISTAGG ... WITHIN GROUP aggregate, native in
    Spark 4 — deterministic because DISTINCT + the WITHIN GROUP order
    clause fix the rendering (an unordered listagg is
    partition-order-dependent and never hashable, the same trap as raw
    collect_list — SURVEY §5.3). `agg_group_concat` builds the identical
    result compositionally (collect_set -> array_sort -> array_join);
    this key is the declarative one-call surface a SQL user reaches
    for. The distinct set rides the partial aggregate either way."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("w27_orders_la")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(DISTINCT o_orderpriority, '|')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM w27_orders_la GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# text_keywords_topk
# ---------------------------------------------------------------------------

_KW_TOP = 20


@register(
    "text_keywords_topk",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT d.doc_id, w AS word
      FROM documents d,
           LATERAL (SELECT unnest(string_split_regex(lower(d.text),
                                                     '[^a-z0-9]+')) AS w) t
      WHERE w <> '' AND length(w) >= 3
    ),
    tf AS (  -- binary tf on the distinct word set; df across docs
      SELECT doc_id, word, COUNT(*) OVER (PARTITION BY word) AS df
      FROM words
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM words),
    scoredw AS (
      SELECT doc_id, word,
             CAST(FLOOR(ln(CAST(nd AS DOUBLE) / df) * 1000000) AS BIGINT)
               AS idf_e6
      FROM tf, n
    ),
    top1 AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, word,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY idf_e6 DESC, word) AS rn
        FROM scoredw
      ) WHERE rn = 1
    )
    SELECT word AS keyword, CAST(COUNT(*) AS BIGINT) AS n_docs_headlined
    FROM top1 GROUP BY word
    ORDER BY n_docs_headlined DESC, keyword LIMIT {_KW_TOP}
    """,
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-salience report: each document's single most
    distinctive term (highest IDF among its words — binary-TF TF-IDF,
    the form that needs no length normalization), rolled up to 'how
    many documents does each keyword headline', top-{_KW_TOP}. The
    per-doc distinctive term is what search snippets, tagging, and
    topic drift monitors consume; `text_tfidf` scores the full (doc,
    term) matrix — this key extracts the argmax signal.

    Ranking is INTEGER-exact: idf as floor(ln(N/df)*1e6) (one
    transcendental per distinct df value, same double both engines),
    ties by word — so the per-doc argmax is deterministic. Per-doc
    top-1 rides a row_number window pruned to WindowGroupLimit; the
    final top-{_KW_TOP} is TakeOrderedAndProject."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower("text"), "[^a-z0-9]+"))
            ).alias("word"),
        )
        .filter((F.col("word") != "") & (F.length("word") >= 3))
    )
    wdf = Window.partitionBy("word")
    tf = words.select(
        "doc_id", "word", F.count(F.lit(1)).over(wdf).alias("df")
    )
    nd = words.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("nd")
    )
    scoredw = tf.crossJoin(F.broadcast(nd)).select(
        "doc_id",
        "word",
        F.floor(
            F.log(F.col("nd").cast("double") / F.col("df")) * 1000000
        ).cast("bigint").alias("idf_e6"),
    )
    w1 = Window.partitionBy("doc_id").orderBy(F.desc("idf_e6"), "word")
    top1 = (
        scoredw.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("doc_id", "word")
    )
    return (
        top1.groupBy(F.col("word").alias("keyword"))
        .agg(F.count(F.lit(1)).alias("n_docs_headlined"))
        .orderBy(F.desc("n_docs_headlined"), "keyword")
        .limit(_KW_TOP)
    )


# ---------------------------------------------------------------------------
# sql_try_functions
# ---------------------------------------------------------------------------


@register(
    "sql_try_functions",
    oracle="""
    WITH dirty AS (
      SELECT event_id, user_id, value,
             CASE WHEN user_id % 5 = 0 THEN NULL
                  ELSE value / (user_id % 5) END AS safe_div,
             TRY_CAST(CASE WHEN event_id % 7 = 0
                           THEN CAST(user_id AS VARCHAR) || 'x'
                           ELSE CAST(user_id AS VARCHAR) END
                      AS BIGINT) AS safe_cast
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(safe_div) AS BIGINT) AS n_div_null,
           CAST(COUNT(*) - COUNT(safe_cast) AS BIGINT) AS n_cast_null,
           ROUND(SUM(safe_div), 4) AS div_sum,
           CAST(SUM(safe_cast) AS BIGINT) AS cast_sum
    FROM dirty
    """,
)
def sql_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic and casts — `try_divide` / `try_cast`
    return NULL instead of raising under ANSI mode, the discipline that
    keeps a 100 TB job from dying on row 3 billion because one record
    divides by zero or carries '12x' in a numeric field [P — Spark
    try_* function family; ANSI dialect]. The report counts how much
    data each failure mode silently drops (the thing to alert on —
    NULL-swallowing without accounting is how pipelines rot) and
    aggregates over the survivors. Dirt is synthesized arithmetically
    (every 5th user divides by zero, every 7th event's numeral is
    corrupted) so the oracle replays it with explicit CASE semantics —
    pinning that try_* equals the guarded form, per value."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dirty = e.select(
        "event_id",
        "user_id",
        "value",
        F.try_divide("value", F.col("user_id") % 5).alias("safe_div"),
        F.expr(
            "try_cast(CASE WHEN event_id % 7 = 0"
            " THEN concat(cast(user_id AS string), 'x')"
            " ELSE cast(user_id AS string) END AS BIGINT)"
        ).alias("safe_cast"),
    )
    return dirty.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("safe_div")).alias("n_div_null"),
        (F.count(F.lit(1)) - F.count("safe_cast")).alias("n_cast_null"),
        F.round(F.sum("safe_div"), 4).alias("div_sum"),
        F.sum("safe_cast").cast("bigint").alias("cast_sum"),
    )
