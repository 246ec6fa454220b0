"""Wave-19 keys (round 4): interval-overlap join, one-way ANOVA, and
multiline-quoted CSV robustness.

- ``join_interval_overlap``: interval × interval OVERLAP join (both
  endpoints ranges — `join_interval_bin` covers the point-in-interval
  case) realized scale-first: explode each interval onto the fixed-width
  bins it covers, equi-join on the bin, residual overlap predicate,
  dedupe. The oracle deliberately uses the direct non-equi join — two
  formulations must agree.
- ``stats_anova_f``: one-way ANOVA F across 3+ groups from per-group
  (n, Σ, Σ²) partials — the k-group generalization of
  `agg_welch_ttest`.
- ``scan_csv_multiline_quoted``: RFC-4180 quoting round-trip — embedded
  newlines, quotes, and commas inside quoted fields (the classic ingest
  breaker) through Spark's multiLine CSV reader, hash-checked against
  the oracle recomputing the same synthesized content relationally.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

_BIN_DAYS = 7  # overlap-join bin width


@register(
    "join_interval_overlap",
    oracle="""
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS wstart,
             COUNT(*) AS n
      FROM orders GROUP BY 1
      ORDER BY n DESC, wstart LIMIT 20
    ),
    camp AS (
      SELECT wstart AS c_start, wstart + INTERVAL 14 DAY AS c_end FROM wk
    ),
    ov AS (  -- the direct non-equi overlap join (oracle formulation)
      SELECT c.c_start, o.o_orderkey, o.o_totalprice
      FROM camp c JOIN orders o
        ON o.o_orderdate < c.c_end
       AND o.o_orderdate + INTERVAL 7 DAY > c.c_start
    )
    SELECT CAST(c_start AS TIMESTAMP) AS c_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) + 0 AS revenue
    FROM ov GROUP BY c_start
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: order activity windows [orderdate,
    orderdate+7d) against the 20 busiest campaign fortnights
    [week_start, +14d) — match where the RANGES overlap (s1 < e2 AND
    s2 < e1), the ask behind "which campaigns did this order's activity
    touch". `join_interval_bin` handles point-in-interval; this is the
    interval × interval form.

    Scale shape: a naive overlap join is a cross product with a theta
    filter (BroadcastNestedLoopJoin — dies when neither side fits).
    Engine formulation: explode each side onto the 7-day bins its
    interval covers (sequence + explode, row-local; an interval of
    length L lands on ≤ L/bin+2 bins), equi-join on the bin key —
    shuffle-partitionable on both sides at any scale — apply the exact
    overlap predicate as a residual, and dedupe the (campaign, order)
    pairs that met in more than one bin via the final aggregation
    keyed on the pair. The oracle runs the DIRECT non-equi join, so
    the two formulations check each other."""
    o = table(spark, sf_dir, "orders")
    wk = (
        o.groupBy(F.date_trunc("week", "o_orderdate").alias("wstart"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "wstart")
        .limit(20)
    )
    camp = wk.select(
        F.col("wstart").alias("c_start"),
        F.col("wstart").cast("date").alias("c_s_day"),
        F.date_add(F.col("wstart").cast("date"), 14).alias("c_e_day"),
    )
    # bin ids are epoch-day DIV bin-width; explode each interval over its bins
    cbins = camp.select(
        "c_start",
        "c_s_day",
        "c_e_day",
        F.explode(
            F.sequence(
                F.floor(F.unix_date("c_s_day") / _BIN_DAYS),
                # end is EXCLUSIVE: the last covered day is c_e_day - 1
                F.floor((F.unix_date("c_e_day") - 1) / _BIN_DAYS),
            )
        ).alias("bin"),
    )
    obins = o.select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_s_day"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("o_e_day"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.unix_date("o_s_day") / _BIN_DAYS),
                F.floor((F.unix_date("o_e_day") - 1) / _BIN_DAYS),
            )
        ).alias("bin"),
    )
    pairs = (
        cbins.join(obins, "bin")
        .filter(
            (F.col("o_s_day") < F.col("c_e_day"))
            & (F.col("c_s_day") < F.col("o_e_day"))
        )
        # a pair meeting in several bins collapses here: group on the pair
        .groupBy("c_start", "o_orderkey")
        .agg(F.first("o_totalprice").alias("o_totalprice"))
    )
    return pairs.groupBy("c_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.round(F.sum("o_totalprice"), 2) + 0).alias("revenue"),
    )


@register(
    "stats_anova_f",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS grp,
             COUNT(*)::BIGINT AS n,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS s,
             SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                 * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS ss
      FROM lineitem GROUP BY 1
    ),
    t AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s) AS stot,
             CAST(SUM(ss) AS DOUBLE) AS sstot,
             -- grp-ORDERED fold: a plain SUM lets each engine pick its
             -- own 3-term addition order, and the last-ulp difference
             -- survives into the rounded statistic
             list_reduce(
               list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE) ORDER BY grp),
               (a, b) -> a + b) AS sq_over_n
      FROM g
    ),
    m AS (
      SELECT k, nn,
             (sq_over_n - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
              / CAST(nn AS DOUBLE)) / (k - 1) AS msb_raw,
             (sstot - sq_over_n) / (nn - k) AS msw_raw,
             sq_over_n - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
              / CAST(nn AS DOUBLE) AS ssb,
             sstot - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
              / CAST(nn AS DOUBLE) AS sst
      FROM t
    )
    SELECT CAST(k AS INT) AS k, CAST(nn AS BIGINT) AS n,
           ROUND(msb_raw / msw_raw, 4) + 0 AS f_stat,
           CAST(ROUND(10000 * ssb / sst) AS BIGINT) AS eta2_bp
    FROM m
    """,
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the return-flag price groups — the
    k-group generalization of `agg_welch_ttest` (is ANY group mean
    different?). Sums run in exact integer cents, so the only floats
    are the three final divisions — the same expression order in both
    engines makes the rounded statistic hash-stable (the
    `agg_entropy` float discipline).

    Scale shape: one partial+final agg to per-group (n, Σ, Σ²), then a
    3-row reduce — nothing else touches the data."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    c19 = cents.cast("decimal(19,0)")  # cents² ≤ 1e14·rows: exact in dec38
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).alias("s"),
        F.sum(c19 * c19).alias("ss"),
    )
    term = (
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double")
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.sum("ss").cast("double").alias("sstot"),
        # grp-ORDERED fold (array_sort on (grp, term) structs, then a
        # left-to-right aggregate): a plain SUM lets each engine pick
        # its own addition order over the k group terms, and that
        # last-ulp difference survives into the rounded statistic —
        # observed at sf0.1 before this fix
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("grp"), term.alias("v")))
                ),
                lambda x: x["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_over_n"),
    )
    ssb = (
        F.col("sq_over_n")
        - F.col("stot").cast("double")
        * F.col("stot").cast("double")
        / F.col("nn").cast("double")
    )
    sst = (
        F.col("sstot")
        - F.col("stot").cast("double")
        * F.col("stot").cast("double")
        / F.col("nn").cast("double")
    )
    # try_divide (r9 edge batch, SURVEY §17.1): a single-group input
    # (one-row/constk) zeroes BOTH df denominators (k-1, nn-k) and the
    # within-group variance, where DuckDB x/0 yields NULL and ANSI
    # threw; identical operand order keeps real-SF values bit-stable.
    msb_raw = F.try_divide(ssb, F.col("k") - 1)
    msw_raw = F.try_divide(
        F.col("sstot") - F.col("sq_over_n"), F.col("nn") - F.col("k")
    )
    return t.select(
        F.col("k").cast("int").alias("k"),
        F.col("nn").cast("bigint").alias("n"),
        (F.round(F.try_divide(msb_raw, msw_raw), 4) + 0).alias("f_stat"),
        F.round(F.try_divide(10000 * ssb, sst)).cast("bigint").alias("eta2_bp"),
    )


@register(
    "scan_csv_multiline_quoted",
    oracle="""
    WITH s AS (
      SELECT l_orderkey, l_linenumber,
             'note for ' || CAST(l_orderkey AS VARCHAR) || chr(10)
             || 'line "' || CAST(l_linenumber AS VARCHAR) || '", with, commas'
               AS note
      FROM lineitem
      WHERE (l_orderkey * 2654435761) % 4294967296 % 100 < 5
    )
    SELECT l_orderkey, l_linenumber,
           CAST(LENGTH(note) AS BIGINT) AS note_len,
           CAST(LENGTH(note) - LENGTH(REPLACE(note, ',', '')) AS BIGINT)
             AS n_commas,
           CAST(LENGTH(note) - LENGTH(REPLACE(note, chr(10), '')) AS BIGINT)
             AS n_newlines
    FROM s
    """,
)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-4180 quoting round-trip: a CSV whose quoted fields embed
    newlines, double quotes, and commas — the classic silent ingest
    breaker (a non-multiLine reader splits records mid-field and
    corrupts every following row). The engine WRITES the file with
    Python's csv module (strict RFC quoting), reads it back with
    Spark's multiLine CSV source, and reports per-row content
    measurements that the oracle recomputes relationally from the same
    deterministic construction — so any parse drift (lost newline,
    doubled quote, split row) breaks the hash.

    Scale note: multiLine=true makes a CSV file unsplittable (records
    can span arbitrary byte ranges), so production keeps such files at
    rotation size — exactly the nfcapd-style one-file-per-5-min layout
    the service stages; the option cost is documented, not hidden."""
    import csv as _csv

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .filter(
            (F.col("l_orderkey") * F.lit(2654435761)) % F.lit(4294967296) % 100
            < 5
        )
        .collect()
    )
    d = tempfile.mkdtemp(prefix="sf_csvml_")
    path = os.path.join(d, "notes.csv")
    with open(path, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["l_orderkey", "l_linenumber", "note"])
        for r in li:
            note = (
                f"note for {r.l_orderkey}\n"
                f'line "{r.l_linenumber}", with, commas'
            )
            w.writerow([r.l_orderkey, r.l_linenumber, note])
    got = (
        spark.read.schema("l_orderkey long, l_linenumber int, note string")
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')  # RFC 4180 doubles quotes; escape char = quote
        .csv(path)
    )
    return got.select(
        "l_orderkey",
        "l_linenumber",
        F.length("note").cast("bigint").alias("note_len"),
        (
            F.length("note") - F.length(F.replace(F.col("note"), F.lit(",")))
        )
        .cast("bigint")
        .alias("n_commas"),
        (
            F.length("note") - F.length(F.replace(F.col("note"), F.lit("\n")))
        )
        .cast("bigint")
        .alias("n_newlines"),
    )


@register(
    "privacy_l_diversity",
    oracle="""
    WITH q AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(COALESCE(value, -100) / 100) AS BIGINT) AS vb,
             COUNT(DISTINCT event_type) AS l,
             COUNT(*) AS g
      FROM events GROUP BY 1, 2
    ),
    ls(l_min) AS (VALUES (2), (3), (5))
    SELECT CAST(ls.l_min AS INT) AS l_min,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(count_if(q.l < ls.l_min) AS BIGINT) AS n_groups_below,
           CAST(COALESCE(SUM(CASE WHEN q.l < ls.l_min THEN q.g END), 0)
                AS BIGINT) AS n_rows_below,
           CAST(10000 * COALESCE(SUM(CASE WHEN q.l < ls.l_min THEN q.g END), 0)
                // SUM(q.g) AS BIGINT) AS rows_bp
    FROM q, ls GROUP BY ls.l_min
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the step AFTER `privacy_k_anonymity`: a QI
    group can be large (k-anonymous) yet expose its members anyway if
    every row shares the same SENSITIVE value; l-diversity requires ≥ l
    distinct sensitive values per group [P — Machanavajjhala 2007].
    Here QI = (day, value-bucket), sensitive = event_type; report the
    group and row share below l for a threshold grid.

    Scale shape: ONE (QI → distinct-sensitive-count, size) aggregation
    (count_distinct rides the same shuffle as the size), then the tiny
    broadcast threshold grid + final agg — the `privacy_k_anonymity`
    plan with a distinct-count added."""
    e = table(spark, sf_dir, "events")
    q = e.groupBy(
        F.to_date("ts").alias("day"),
        F.floor(F.coalesce(F.col("value"), F.lit(-100)) / 100)
        .cast("bigint")
        .alias("vb"),
    ).agg(
        F.countDistinct("event_type").alias("l"),
        F.count(F.lit(1)).alias("g"),
    )
    ls = spark.createDataFrame([(2,), (3,), (5,)], "l_min int")
    return (
        q.crossJoin(F.broadcast(ls))
        .groupBy("l_min")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.count_if(F.col("l") < F.col("l_min"))
            .cast("bigint")
            .alias("n_groups_below"),
            F.coalesce(
                F.sum(F.when(F.col("l") < F.col("l_min"), F.col("g"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_rows_below"),
            F.expr(
                "CAST(10000 * COALESCE(SUM(CASE WHEN l < l_min THEN g END), 0)"
                " DIV SUM(g) AS BIGINT)"
            ).alias("rows_bp"),
        )
    )


@register("ts_holt_winters")  # rows-only: the recursion is not
# SQL-expressible; pinned against an independent pandas loop in tests
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonality,
    fixed α=0.3 β=0.1 γ=0.2) per event-type daily series, forecasting
    the next 7 days — the classical baseline every anomaly detector and
    capacity forecast is judged against [P — Holt/Winters literature].
    Fixed smoothing constants keep the key deterministic (parameter
    fitting would need an optimizer — out of contract).

    Scale shape: the corpus-sized work is the ONE (series, day) count
    agg; the recursion is inherently sequential IN TIME but independent
    ACROSS series, so it runs as applyInPandas per series key — the
    canonical Spark shape for per-entity recurrences (thousands of
    series parallelize; each series is one short numpy loop)."""
    import pandas as pd

    from pyspark.sql import functions as _F

    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.col("event_type").alias("series"), F.to_date("ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    m, alpha, beta, gamma, horizon = 7, 0.3, 0.1, 0.2, 7

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = pdf["y"].to_numpy()
        if len(y) < 2 * m:  # not enough history for seasonal init
            return pd.DataFrame(
                {"series": [], "h": [], "forecast_r": []}
            ).astype({"series": str, "h": "int32", "forecast_r": float})
        level = y[:m].mean()
        trend = (y[m : 2 * m].mean() - y[:m].mean()) / m
        seas = [y[i] - level for i in range(m)]
        for t in range(len(y)):
            s = seas[t % m]
            new_level = alpha * (y[t] - s) + (1 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1 - beta) * trend
            seas[t % m] = gamma * (y[t] - new_level) + (1 - gamma) * s
            level = new_level
        n = len(y)
        return pd.DataFrame(
            {
                "series": pdf["series"].iloc[0],
                "h": list(range(1, horizon + 1)),
                "forecast_r": [
                    round(level + h * trend + seas[(n + h - 1) % m], 4)
                    for h in range(1, horizon + 1)
                ],
            }
        )

    return daily.groupBy("series").applyInPandas(
        hw, "series string, h int, forecast_r double"
    )


@register("maint_rowgroup_skipping")  # rows-only: engine-reported scan
# metrics; the sorted<unsorted skipping contract is pinned in tests
def maint_rowgroup_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED row-group skipping — the proof behind the MergeTree
    sparse-index analogy (SURVEY §4.3.1): the same flow data written
    sorted-by-(sa_num) vs unsorted, scanned under the same narrow
    address-range predicate, reporting each scan's OWN numOutputRows
    metric (rows the parquet reader actually emitted after min/max
    row-group pruning). On the sorted layout matching rows concentrate
    in few row groups and the reader skips the rest; unsorted, every
    row group straddles the range and nothing skips. This converts the
    layout claim the plan tests assert structurally into an engine-
    reported number (`observe_metrics` discipline: read the engine's
    telemetry, don't re-derive it).

    Scale note: small parquet.block.size here only makes the effect
    visible on a fixture-sized file; at production block sizes the
    mechanism is identical — it is exactly what
    `write_flows_partitioned`'s sortWithinPartitions buys."""
    from ..functions.ip import ipv4_to_num
    from ..schemas import FLOWS
    from ..sources.flows import write_flow_files

    src = tempfile.mkdtemp(prefix="sf_rgskip_src_")
    write_flow_files(spark, src, n_files=2, rows_per_file=4000)
    raw = spark.read.schema(FLOWS).parquet(os.path.join(src, "*")).withColumns(
        {"sa_num": ipv4_to_num(F.col("sa"))}
    )
    layouts = {}
    for name, df in (
        ("sorted", raw.repartition(1).sortWithinPartitions("sa_num")),
        ("unsorted", raw.repartition(1)),
    ):
        out = os.path.join(tempfile.mkdtemp(prefix="sf_rgskip_"), "t")
        df.write.option("parquet.block.size", 64 * 1024).parquet(out)
        layouts[name] = out

    def measure(path):
        q = (
            spark.read.parquet(path)
            .filter(
                (F.col("sa_num") >= 167772160) & (F.col("sa_num") < 167772260)
            )
            .select("sa", "ipkt")
        )
        n_result = len(q.collect())
        leaf = q._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        n_scan = int(leaf.metrics().apply("numOutputRows").value())
        return n_scan, n_result

    rows = []
    for name, path in layouts.items():
        n_scan, n_result = measure(path)
        rows.append((name, n_scan, n_result))
    return spark.createDataFrame(
        rows, "layout string, scan_rows bigint, result_rows bigint"
    )
