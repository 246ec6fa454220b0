"""Wave-28 keys (round 5): series downsampling, association rules,
WoE encoding, raw-log parsing, optimizer statistics.

- ``ts_downsample_lttb``: largest-triangle downsampling of a time
  series to B visual points [P — Steinarsson 2013 LTTB; implemented as
  the parallel centroid-anchored variant, disclosed below] — what every
  dashboard does before plotting a year of per-day points.
- ``events_association_rules``: pairwise association rules
  (support / confidence / lift) over per-user event-type baskets
  [P — Agrawal/Srikant Apriori, the 1-pass pair level] — the
  market-basket primitive behind "users who X also Y".
- ``ml_feature_woe_binning``: Weight-of-Evidence encoding + Information
  Value per feature bin [P — standard credit-scoring encoding] —
  completes the feature-engineering family (`features_target_encoding`
  is the regression form; WoE is the odds form with the IV
  feature-selection number attached).
- ``scan_text_regex_parse``: raw unstructured log ingestion —
  `spark.read.text` + regexp field extraction + malformed-line
  accounting; the entry path for logs that are neither CSV nor JSON.
- ``maint_analyze_stats``: `ANALYZE TABLE ... COMPUTE STATISTICS FOR
  COLUMNS` + catalog read-back — the CBO statistics surface (row
  counts, per-column NDV/min/max) that join reordering feeds on.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# ts_downsample_lttb
# ---------------------------------------------------------------------------

_LTTB_BUCKETS = 20


@register(
    "ts_downsample_lttb",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(epoch(CAST(CAST(ts AS DATE) AS TIMESTAMP)) // 86400
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT x, y,
             ROW_NUMBER() OVER (ORDER BY x) AS i,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    mid AS (  -- interior points bucketed into B equal index ranges
      SELECT x, y, i, n,
             (i - 2) * {_LTTB_BUCKETS} // (n - 2) AS b
      FROM idx WHERE i > 1 AND i < n
    ),
    anchors AS (  -- per-bucket integer centroid (floor), the parallel
                  -- stand-in for LTTB's sequential selected-point
      SELECT b, SUM(x) // COUNT(*) AS ax, SUM(y) // COUNT(*) AS ay
      FROM mid GROUP BY b
    ),
    scored AS (
      SELECT m.x, m.y, m.b,
             abs((m.x - p.ax) * (nx.ay - p.ay)
                 - (nx.ax - p.ax) * (m.y - p.ay)) AS area2
      FROM mid m
      LEFT JOIN anchors p ON p.b = m.b - 1
      LEFT JOIN anchors nx ON nx.b = m.b + 1
      WHERE p.b IS NOT NULL AND nx.b IS NOT NULL
    ),
    picked AS (
      SELECT b, x, y FROM (
        SELECT b, x, y,
               ROW_NUMBER() OVER (PARTITION BY b
                                  ORDER BY area2 DESC, x) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    ends AS (
      SELECT -1 AS b, x, y FROM idx WHERE i = 1
      UNION ALL
      SELECT {_LTTB_BUCKETS} AS b, x, y FROM idx WHERE i = n
      UNION ALL
      -- first and last interior buckets have no both-side anchor;
      -- keep their centroids so the output still spans them
      SELECT b, ax AS x, ay AS y FROM anchors
      WHERE b = 0 OR b = {_LTTB_BUCKETS - 1}
    )
    SELECT b AS bucket, CAST(x AS BIGINT) AS x_day, CAST(y AS BIGINT) AS y
    FROM (SELECT * FROM picked UNION ALL SELECT * FROM ends)
    """,
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-triangle downsampling of the daily event-volume series
    to ~{_LTTB_BUCKETS} visually-representative points [P — Steinarsson
    2013]. True LTTB anchors each bucket's choice on the PREVIOUS
    bucket's selected point — a sequential chain; this is the standard
    parallel variant that anchors on neighbor-bucket CENTROIDS instead
    (disclosed; selection quality is near-identical on smooth series
    and the plan is fully data-parallel). Endpoints are kept exactly;
    edge buckets fall back to centroids.

    All geometry is INTEGER: x in epoch days, y in counts, the triangle
    area via the 2x cross product (no float, no ulp) — the argmax per
    bucket is deterministic with an x tie-break and prunes via
    WindowGroupLimit. Corpus-sized work is the ONE daily aggregation;
    everything after runs on <=365 rows with two broadcast anchor
    joins. NULL timestamps have no x — pinned out two-sided (the NULL
    day otherwise lands at opposite ends of the ROW_NUMBER ordering on
    the two engines, swapping the endpoint picks; EDGE_SWEEP_r10
    class D)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = e.groupBy(
        (F.unix_timestamp(F.to_date("ts").cast("timestamp")) / 86400)
        .cast("bigint")
        .alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    widx = Window.orderBy("x")  # <=365 rows: bounded by construction
    idx = daily.select(
        "x",
        "y",
        F.row_number().over(widx).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).localCheckpoint(eager=False)  # tiny frame, four consumers
    mid = idx.filter((F.col("i") > 1) & (F.col("i") < F.col("n"))).select(
        "x",
        "y",
        F.expr(f"(i - 2) * {_LTTB_BUCKETS} DIV (n - 2)").alias("b"),
    )
    anchors = mid.groupBy("b").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("ax"),
        F.expr("SUM(y) DIV COUNT(*)").alias("ay"),
    )
    p = anchors.select(
        (F.col("b") + 1).alias("b"), F.col("ax").alias("pax"),
        F.col("ay").alias("pay"),
    )
    nx = anchors.select(
        (F.col("b") - 1).alias("b"), F.col("ax").alias("nax"),
        F.col("ay").alias("nay"),
    )
    scored = (
        mid.join(F.broadcast(p), "b")
        .join(F.broadcast(nx), "b")
        .select(
            "b",
            "x",
            "y",
            F.abs(
                (F.col("x") - F.col("pax")) * (F.col("nay") - F.col("pay"))
                - (F.col("nax") - F.col("pax")) * (F.col("y") - F.col("pay"))
            ).alias("area2"),
        )
    )
    wb = Window.partitionBy("b").orderBy(F.desc("area2"), "x")
    picked = (
        scored.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("b", "x", "y")
    )
    ends = (
        idx.filter(F.col("i") == 1)
        .select(F.lit(-1).alias("b"), "x", "y")
        .unionAll(
            idx.filter(F.col("i") == F.col("n")).select(
                F.lit(_LTTB_BUCKETS).alias("b"), "x", "y"
            )
        )
        .unionAll(
            anchors.filter(
                (F.col("b") == 0) | (F.col("b") == _LTTB_BUCKETS - 1)
            ).select("b", F.col("ax").alias("x"), F.col("ay").alias("y"))
        )
    )
    return picked.unionAll(ends).select(
        F.col("b").cast("bigint").alias("bucket"),
        F.col("x").cast("bigint").alias("x_day"),
        F.col("y").cast("bigint").alias("y"),
    )


# ---------------------------------------------------------------------------
# events_association_rules
# ---------------------------------------------------------------------------


@register(
    "events_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM baskets),
    singles AS (
      SELECT event_type, COUNT(*) AS n FROM baskets GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS ante, b.event_type AS cons, COUNT(*) AS n_both
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ante, p.cons,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(p.n_both * 1000000 // nu.n_users AS BIGINT) AS support_e6,
           CAST(p.n_both * 1000000 // sa.n AS BIGINT) AS confidence_e6,
           CAST(CAST(p.n_both AS HUGEINT) * nu.n_users * 1000000
                // (CAST(sa.n AS HUGEINT) * sc.n) AS BIGINT) AS lift_e6
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.ante
    JOIN singles sc ON sc.event_type = p.cons
    CROSS JOIN nu
    WHERE p.n_both * 100 >= nu.n_users  -- min support 1%
    """,
)
def events_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over per-user event-type baskets
    [P — the pair level of Apriori]: support, confidence and lift in
    exact e6 integers, min-support 1%. 'Users who do X also do Y' —
    the recommendation/cross-sell primitive, and lift is the number
    that separates real affinity from popularity (lift≈1e6 means
    independent).

    Scale shape: baskets are (user, item) DISTINCT rows (one shuffle);
    the per-user item set is BOUNDED by the event-type vocabulary, so
    pair generation is a row-local explode of collect_set combinations
    — never a data-sized self-join; the pair aggregation and two tiny
    singles joins (broadcast) finish it. With an unbounded item
    vocabulary you'd cap per-basket arity first (the standard guard)."""
    e = table(spark, sf_dir, "events")
    # three consumers (user total, singles, per-user sets) — checkpoint
    # the basket distinct so it shuffles once
    # a NULL user owns no basket and a NULL item names nothing
    # (nullmix fold, §17.1(b)): filtered two-sided — the oracle's
    # equi-self-join drops NULL users (NULL = NULL is NULL) and its
    # COUNT(DISTINCT) drops NULL, where Spark's groupBy/distinct keep
    # a NULL group
    baskets = (
        e.filter(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        )
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    nu = baskets.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    singles = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sets = baskets.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("items")
    )
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (a, i) ->"
                    " transform(slice(items, i + 2,"
                    "                 greatest(size(items) - i - 1, 0)),"
                    " b -> struct(a AS ante, b AS cons))))"
                )
            ).alias("pr")
        )
        .select("pr.*")
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("ante"), F.col("n").alias("na"))
    sc = singles.select(F.col("event_type").alias("cons"), F.col("n").alias("nc"))
    return (
        pairs.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .crossJoin(F.broadcast(nu))
        .filter(F.col("n_both") * 100 >= F.col("n_users"))
        .select(
            "ante",
            "cons",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.expr("CAST(n_both * 1000000 DIV n_users AS BIGINT)").alias(
                "support_e6"
            ),
            F.expr("CAST(n_both * 1000000 DIV na AS BIGINT)").alias(
                "confidence_e6"
            ),
            # decimal(38,0)/HUGEINT lift numerator (r10 class audit, the
            # r9 hurst convention): n_both·n_users·1e6 ~ users²·1e6
            # crossed int64 past ~3e6 users on both engines (and na·nc
            # past ~3e9); support/confidence terms are 1e6·count —
            # representable to ~9e12 users, left on the int64 path
            F.expr(
                "CAST(CAST(n_both AS DECIMAL(38,0)) * n_users * 1000000"
                " DIV (CAST(na AS DECIMAL(38,0)) * nc) AS BIGINT)"
            ).alias("lift_e6"),
        )
    )


# ---------------------------------------------------------------------------
# ml_feature_woe_binning
# ---------------------------------------------------------------------------


@register(
    "ml_feature_woe_binning",
    oracle="""
    WITH lab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             LEAST(CAST(FLOOR(value / 10) AS BIGINT), 9) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT bin, CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
      FROM lab GROUP BY bin
    ),
    t AS (SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn FROM b)
    -- NULLIF guards mirror the engine's try_divide/log NULL chain: an
    -- empty-class bin (n_pos = 0 under the nullmix fixture) makes the
    -- odds ratio 0, where Spark's log() yields NULL but a bare DuckDB
    -- ln(0) raises; a zero neg share likewise NULLs the divisor the
    -- way try_divide does (EDGE_SWEEP_r10 class D)
    SELECT bin, n_pos, n_neg,
           CAST(FLOOR(ln(NULLIF((CAST(n_pos AS DOUBLE) / tp)
                         / NULLIF(CAST(n_neg AS DOUBLE) / tn, 0), 0)) * 1000000)
                AS BIGINT) AS woe_e6,
           CAST(FLOOR((CAST(n_pos AS DOUBLE) / tp
                       - CAST(n_neg AS DOUBLE) / tn)
                      * ln(NULLIF((CAST(n_pos AS DOUBLE) / tp)
                           / NULLIF(CAST(n_neg AS DOUBLE) / tn, 0), 0)) * 1000000)
                AS BIGINT) AS iv_term_e6
    FROM b, t
    """,
)
def ml_feature_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding + per-bin Information Value [P —
    standard scorecard encoding]: per feature bin, WoE = ln((pos_share)
    / (neg_share)) and its IV contribution — the odds-space sibling of
    `features_target_encoding` (which encodes in mean-space), plus the
    IV number used for feature selection (IV < 0.02 = useless, > 0.5 =
    suspicious). One grouped label aggregation + a 1-row totals
    broadcast; WoE/IV are row-local arithmetic on the 10-bin table,
    released as floored e6 integers (one ln per bin on count RATIOS —
    same double both engines). Bins are fixed-width integer buckets
    (deterministic everywhere; production would feed quantile edges
    from `agg_quantile_sketch_merge`)."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    lab = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        F.least(F.floor(F.col("value") / 10).cast("bigint"), F.lit(9)).alias(
            "bin"
        ),
    )
    b = lab.groupBy("bin").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("bigint").alias("n_neg"),
    ).localCheckpoint(eager=False)  # 10 rows, two consumers
    t = b.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    # try_divide: a one-class corpus (tp or tn zero) leaves WoE/IV NULL,
    # matching DuckDB's NULL-on-zero-divisor division (r7 edge sweep —
    # ANSI `/` raised instead)
    ps = F.try_divide(F.col("n_pos").cast("double"), F.col("tp"))
    ns = F.try_divide(F.col("n_neg").cast("double"), F.col("tn"))
    return b.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_pos",
        "n_neg",
        F.floor(F.log(F.try_divide(ps, ns)) * 1000000)
        .cast("bigint")
        .alias("woe_e6"),
        F.floor((ps - ns) * F.log(F.try_divide(ps, ns)) * 1000000)
        .cast("bigint")
        .alias("iv_term_e6"),
    )


# ---------------------------------------------------------------------------
# scan_text_regex_parse
# ---------------------------------------------------------------------------

_LOG_RE = r"^(\d{4}-\d{2}-\d{2}) level=(\w+) user=(\d+) msg=\"([^\"]*)\"$"


@register("scan_text_regex_parse")  # rows-only: reads a generated temp
# file (the driver's DuckDB session sees only the registered views);
# parse-vs-source reconciliation is pinned in tests
def scan_text_regex_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw log ingestion: `spark.read.text` over unstructured lines +
    `regexp_extract` field parsing + malformed-line accounting — the
    entry path for logs that are neither CSV nor JSON (auth logs,
    app logs, legacy syslog). Lines are generated deterministically
    from the events table (1 line per event, every 13th line corrupted)
    so tests reconcile parsed fields against the source exactly.

    Parsing is scan-local regexp in codegen (one pass, no UDF);
    malformed lines are COUNTED, never dropped silently (the
    `sql_try_functions` accounting discipline); the one aggregation
    rolls up by level. At 100 TB this is `spark.read.text` over a
    rotated log directory — the same two-stage plan."""
    e = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id", "event_id", "event_type"
    )
    lines = e.select(
        F.when(
            F.col("event_id") % 13 == 0,
            F.concat(F.lit("CORRUPT "), F.col("event_id").cast("string")),
        )
        .otherwise(
            F.format_string(
                '%s level=%s user=%d msg="%s"',
                F.date_format("d", "yyyy-MM-dd"),
                F.upper(F.substring("event_type", 1, 4)),
                "user_id",
                "event_type",
            )
        )
        .alias("value")
    )
    d = tempfile.mkdtemp(prefix="sf_rawlog_")
    lines.coalesce(2).write.mode("overwrite").text(os.path.join(d, "logs"))
    raw = spark.read.text(os.path.join(d, "logs"))
    parsed = raw.select(
        F.regexp_extract("value", _LOG_RE, 1).alias("day"),
        F.regexp_extract("value", _LOG_RE, 2).alias("level"),
        F.regexp_extract("value", _LOG_RE, 3).alias("user"),
        F.regexp_extract("value", _LOG_RE, 4).alias("msg"),
    )
    return (
        parsed.withColumn("ok", F.col("level") != "")
        .groupBy(F.when(F.col("ok"), F.col("level")).otherwise("_MALFORMED").alias("level"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count_distinct(
                F.when(F.col("ok"), F.col("user"))
            ).alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# maint_analyze_stats
# ---------------------------------------------------------------------------


@register("maint_analyze_stats")  # rows-only: NDV is an engine sketch
# estimate; exact-count + NDV-bounds contracts are pinned in tests
def maint_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-based-optimizer statistics surface: `ANALYZE TABLE ...
    COMPUTE STATISTICS FOR COLUMNS` on a saved table, then read the
    catalog back (`DESCRIBE EXTENDED <col>`) — row counts and
    per-column NDV/min/max, the numbers Catalyst's CBO feeds on for
    join reordering and broadcast decisions [P — Spark CBO]. At 100 TB
    ANALYZE is the cheap scan you run once per partition load so the
    optimizer stops guessing build sides.

    The table is a bounded projection saved to the session warehouse
    (same seam as `maint_compaction`); NDV comes from the engine's HLL
    sketch, so the key is rows-only with exact row-count and NDV
    error-bound contracts pinned in tests."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tbl = "w28_stats_orders"
    # a managed-table LOCATION can survive from a previous session's
    # warehouse while being absent from this session's catalog — drop
    # both sides so overwrite never trips LOCATION_ALREADY_EXISTS
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        os.path.join(wh.removeprefix("file:"), tbl), ignore_errors=True
    )
    o.write.mode("overwrite").saveAsTable(tbl)
    spark.sql(
        f"ANALYZE TABLE {tbl} COMPUTE STATISTICS"
        " FOR COLUMNS o_orderkey, o_custkey, o_orderstatus"
    )
    rows = []
    nrows = int(
        spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
        .filter(F.col("col_name") == "Statistics")
        .collect()[0]["data_type"]
        .split(",")[1]
        .strip()
        .split(" ")[0]
    )
    for c in ["o_orderkey", "o_custkey", "o_orderstatus"]:
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE EXTENDED {tbl} {c}").collect()
        }
        rows.append(
            (
                c,
                nrows,
                int(desc.get("distinct_count", "0")),
                int(desc.get("num_nulls", "0")),
            )
        )
    return spark.createDataFrame(
        rows, "column STRING, n_rows BIGINT, ndv BIGINT, n_nulls BIGINT"
    )
