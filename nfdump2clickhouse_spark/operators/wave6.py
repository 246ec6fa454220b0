"""Wave-6 operators (round 2): drift monitoring, snapshot reconciliation,
attribution, changepoint detection, null-safe join semantics, windowed
quantiles, mean families, mergeable sketches, and heavy-hitter summaries.

Same SURVEY §5.3 conventions as waves 4-5: floats rounded, identical
aliases both sides, md5/xxhash-of-key randomness, unique window
tiebreakers, `+ 0` after any round that can produce -0.0.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# --- windowed quantiles ------------------------------------------------------


@register(
    "win_rolling_median",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT day, n,
           ROUND(quantile_cont(n, 0.5) OVER
             (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS med7
    FROM d
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of the daily event rate — the
    robust-baseline flavor of `win_moving_avg` (a single spike day drags
    a mean but not a median; this is the denominator used by robust
    anomaly monitors).

    `percentile` as a true window aggregate (Spark keeps the frame's
    value buffer per row; linear-interpolation semantics match DuckDB's
    quantile_cont exactly). Same scale shape as all ts_ keys: the window
    runs over the post-aggregation day series, so the corpus-sized work
    is one day-grain shuffle."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return d.select(
        "day", "n", F.round(F.percentile("n", F.lit(0.5)).over(w), 4).alias("med7")
    )


# --- drift monitoring --------------------------------------------------------


@register(
    "drift_psi",
    oracle="""
    WITH s AS (
      SELECT least(CAST(floor(l_extendedprice / 10000) AS BIGINT), 9) AS bucket,
             CAST(('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                    AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS grp
      FROM lineitem
    ),
    c AS (
      SELECT bucket,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_cur
      FROM s GROUP BY bucket
    ),
    t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM c)
    SELECT bucket,
           ROUND(n_ref * 1.0 / tr, 6) AS p_ref,
           ROUND(n_cur * 1.0 / tc, 6) AS p_cur,
           -- one-sided cell: ln of a zero ratio ERRORS in DuckDB where
           -- Spark ln(0) is NULL; the PSI term is undefined there, NULL
           -- on both engines (r9 edge batch)
           CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL
                ELSE ROUND((n_cur * 1.0 / tc - n_ref * 1.0 / tr)
                     * ln((n_cur * 1.0 / tc) / (n_ref * 1.0 / tr))
                     * 10000, 4) + 0
           END AS psi_term_e4
    FROM c, t
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two deterministic hash-halves
    of the corpus, per fixed price bucket — the train/serve drift monitor
    run on every model-feeding pipeline (PSI < 0.1 stable, > 0.25 act).
    Here the halves are a hash split, so psi ≈ 0 IS the assertion: the
    split is unbiased.

    ONE scan: bucket + group are row-local, a single (bucket, grp)-keyed
    partial+final agg produces 10×2 cells, and the PSI algebra runs on
    that tiny table (broadcast totals). Never two passes over the corpus
    — the naive 'profile each side separately' formulation scans twice."""
    li = table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    grp = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 2
    ).alias("grp")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / 10_000).cast("bigint"), F.lit(9)
    ).alias("bucket")
    c = (
        li.select(bucket, grp)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_cur"),
        )
    )
    # totals via an empty-frame window over the 10-row cell table: a
    # separate agg + crossJoin re-ran the corpus aggregation on both DAG
    # arms (4 Exchanges → 2, plan-pinned)
    wt = Window.partitionBy()
    c = c.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wt).alias("tr"),
        F.sum("n_cur").over(wt).alias("tc"),
    )
    # degenerate parity (r9 edge batch): try_divide — an empty half
    # (tr or tc = 0, one-row fixture) threw ANSI DIVIDE_BY_ZERO where
    # DuckDB yields NULL. For a one-sided CELL, F.log of the zero (or
    # NULL) ratio is NULL, matching the oracle's explicit CASE around
    # DuckDB's erroring ln(0); real-SF cells are two-sided, so both are
    # semantic no-ops.
    pr = F.try_divide(F.col("n_ref"), F.col("tr"))
    pc = F.try_divide(F.col("n_cur"), F.col("tc"))
    return c.select(
        "bucket",
        F.round(pr, 6).alias("p_ref"),
        F.round(pc, 6).alias("p_cur"),
        (
            F.round((pc - pr) * F.log(F.try_divide(pc, pr)) * 10_000, 4)
            + F.lit(0)
        ).alias("psi_term_e4"),
    )


# --- snapshot reconciliation -------------------------------------------------


@register(
    "snapshot_diff",
    oracle="""
    WITH b AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 13 = 0 THEN value + 1 ELSE value END AS value
      FROM events WHERE event_id % 17 <> 0
      UNION ALL
      SELECT event_id + 10000000, event_type, value
      FROM events WHERE event_id % 19 = 0
    ),
    d AS (
      SELECT COALESCE(a.event_type, b.event_type) AS event_type,
             CASE WHEN a.event_id IS NULL THEN 'added'
                  WHEN b.event_id IS NULL THEN 'removed'
                  WHEN a.value <> b.value THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM events a FULL OUTER JOIN b ON a.event_id = b.event_id
    )
    SELECT event_type, change, COUNT(*) AS n
    FROM d GROUP BY event_type, change
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every row across two table
    versions as added / removed / changed / unchanged — the audit primitive
    behind CDC backfills and the 'did the rewrite change anything?'
    check after a pipeline migration. Snapshot B is derived from A with
    deterministic rules (drop %17, bump value %13, insert %19 clones) so
    both engines build the identical pair.

    Scale shape: ONE full-outer sort-merge join keyed on the primary key
    — both snapshots shuffle once on event_id, the change column is a
    row-local CASE, and the per-(type, change) rollup is a second tiny
    agg. Row-level hash compare (md5 of concatenated values) replaces
    the single-column compare when schemas are wide; same plan."""
    a = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    src = table(spark, sf_dir, "events")
    b = (
        src.filter(F.col("event_id") % 17 != 0)
        .select(
            "event_id",
            "event_type",
            F.when(F.col("event_id") % 13 == 0, F.col("value") + 1)
            .otherwise(F.col("value"))
            .alias("value"),
        )
        .unionAll(
            src.filter(F.col("event_id") % 19 == 0).select(
                (F.col("event_id") + 10_000_000).alias("event_id"),
                "event_type",
                "value",
            )
        )
    )
    bb = b.select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_type"),
        F.col("value").alias("b_value"),
    )
    d = a.join(bb, a.event_id == bb.b_id, "full_outer").select(
        F.coalesce("event_type", "b_type").alias("event_type"),
        F.when(F.col("event_id").isNull(), "added")
        .when(F.col("b_id").isNull(), "removed")
        .when(F.col("value") != F.col("b_value"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )
    return d.groupBy("event_type", "change").agg(F.count(F.lit(1)).alias("n"))


# --- marketing-style attribution ---------------------------------------------


@register(
    "events_attribution",
    oracle="""
    WITH t AS (
      SELECT event_id, event_type,
             first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                         IGNORE NULLS) OVER w AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS last_touch
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT COALESCE(first_touch, '(none)') AS first_touch,
           COALESCE(last_touch, '(none)') AS last_touch,
           COUNT(*) AS purchases
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: for every purchase, which
    non-purchase event type opened the user's path and which one
    immediately preceded the conversion — the channel-credit query behind
    marketing spend allocation.

    ONE user-keyed sort window serves both touches (first_value and
    last_value with IGNORE NULLS over the same preceding frame share the
    sort/exchange); the purchase filter then reduces to a tiny rollup.
    No self-join of events to events — the window formulation is the one
    that survives 100 TB of clickstream."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    t = e.select(
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        t.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("purchases"))
    )


# --- changepoint detection ---------------------------------------------------


@register(
    "ts_changepoint",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    m AS (SELECT AVG(n) AS mu FROM d),
    c AS (
      SELECT day, n,
             SUM(n - mu) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum
      FROM d, m
    )
    SELECT day, n,
           ROUND(cum - MIN(cum) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                      PRECEDING AND CURRENT ROW), 4) + 0
             AS ph,
           (cum - MIN(cum) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW)) > 100 AS shifted
    FROM c
    """,
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley changepoint statistic on the daily event rate: the
    cumulative deviation from the global mean minus its running minimum —
    rises persistently only when the level shifts up, unlike a z-score
    which forgets (`events_anomaly_zscore` flags spikes; this flags
    regime changes).

    The textbook CUSUM recurrence S_t = max(0, S_{t-1} + dev) is a
    clamped fold no window function expresses; the Page-Hinkley form
    cum - running_min(cum) is algebraically its two-sided-reset cousin
    and is TWO prefix windows over the same sort — fully declarative.
    Corpus work: one day-grain agg; windows run on the day series."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = d.agg(F.avg("n").alias("mu"))
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.crossJoin(F.broadcast(m)).select(
        "day", "n", F.sum(F.col("n") - F.col("mu")).over(wp).alias("cum")
    )
    ph = F.col("cum") - F.min("cum").over(wp)
    return c.select(
        "day",
        "n",
        (F.round(ph, 4) + F.lit(0)).alias("ph"),
        (ph > 100).alias("shifted"),
    )


# --- null-safe join semantics ------------------------------------------------


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT nullif(event_type, 'view') AS k, value FROM events
    ),
    b AS (
      SELECT DISTINCT nullif(event_type, 'view') AS k,
             COALESCE(nullif(event_type, 'view'), 'browse') AS label
      FROM events
    )
    SELECT b.label, COUNT(*) AS n, ROUND(SUM(a.value), 4) AS sum_value
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY b.label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension-
    lookup joins need when 'unknown' is itself a dimension member
    (a plain equi-join silently drops every NULL-keyed fact row; with a
    LEFT join they survive but never enrich).

    eqNullSafe keys hash like ordinary keys (NULL hashes to a regular
    bucket), so the join stays a standard shuffled/broadcast hash join —
    no BNLJ penalty for the null-safety. All NULLs land in ONE bucket:
    at 100 TB a null-heavy fact column skews that task, so the standard
    mitigation (split the NULL stratum with a broadcast arm) applies."""
    e = table(spark, sf_dir, "events")
    a = e.select(F.nullif("event_type", F.lit("view")).alias("k"), "value")
    b = (
        e.select(F.nullif("event_type", F.lit("view")).alias("k"))
        .distinct()
        .select("k", F.coalesce("k", F.lit("browse")).alias("label"))
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# --- mean families -----------------------------------------------------------


@register(
    "agg_mean_family",
    oracle="""
    SELECT l_returnflag,
           ROUND(AVG(l_extendedprice), 4) AS arith,
           ROUND(exp(AVG(ln(l_extendedprice))), 4) AS geo,
           ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 4) AS harm,
           ROUND(sqrt(AVG(l_extendedprice * l_extendedprice)), 4) AS quad
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean mean family per group — geometric (multiplicative
    growth), harmonic (rate averaging), quadratic (RMS energy) alongside
    the arithmetic mean. All four are single-accumulator algebraic
    aggregates (avg-of-ln, sum-of-reciprocal, avg-of-square), so the
    whole family is one partial+final agg pass — the 100 TB cost of ONE
    groupBy, not four."""
    li = table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg(p), 4).alias("arith"),
        F.round(F.exp(F.avg(F.log(p))), 4).alias("geo"),
        F.round(F.count(F.lit(1)) / F.sum(1.0 / p), 4).alias("harm"),
        F.round(F.sqrt(F.avg(p * p)), 4).alias("quad"),
    )


# --- mergeable distinct sketches ---------------------------------------------


@register("agg_hll_sketch_merge")  # rows-only: sketch estimates are
# implementation-defined; the 5% error contract is pinned in tests
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-shard Apache DataSketches
    HLL states (`hll_sketch_agg`) union-merged (`hll_union_agg`) into a
    global estimate — the incremental form of COUNT DISTINCT. This is
    how 100 TB pipelines keep daily uniques: each partition/day persists
    a KB-sized sketch, and any rollup (week, month, ad-hoc cohort) is a
    union of sketches, never a re-scan of raw data. Contrast
    `agg_approx_distinct` (one-shot HLL++) and `agg_partial_merge`
    (algebraic states): sketches are the only option when the merge has
    to cross job/storage boundaries."""
    li = table(spark, sf_dir, "lineitem")
    shards = li.groupBy((F.col("l_orderkey") % 8).alias("shard")).agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count(F.lit(1)).alias("rows_in"),
    )
    return shards.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("rows_in").alias("rows_total"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("est_distinct_parts"),
    )


# --- deterministic heavy hitters (Misra-Gries) -------------------------------


def mg_summaries(df: DataFrame, k: int = 20) -> DataFrame:
    """Per-partition Misra-Gries summaries of `df.item`: (item, c) rows,
    ≤ k per partition, O(k) memory per task regardless of partition
    size. Counts are LOWER bounds (the decrement-all step is what buys
    the memory bound); summing them across partitions preserves both the
    lower-bound property and the freq > n/k no-false-negative guarantee
    (each partial loses < n_partition/k per item)."""
    import pandas as pd

    def mg_partition(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            for item in pdf["item"].to_numpy():
                item = int(item)
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "c": list(counters.values())}
            )

    return df.mapInPandas(mg_partition, "item long, c long")


@register("topk_spacesaving")  # rows-only: MG estimates are summary-
# dependent; the no-false-negative + error-bound contract is in tests
def topk_spacesaving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Misra-Gries summaries, the deterministic
    alternative to `agg_freq_items`: each partition keeps k=20 counters
    (mapInPandas, Arrow-batched — O(k) memory regardless of partition
    size), the P×k partial summaries are then merged and the global
    guarantee holds: any item with true frequency > n/k survives, and
    every estimate is within n_partial/k of truth.

    The merge sums per-item summary counts (a tiny groupBy — P×k rows)
    and keeps the top k; at 100 TB the summaries are still P×k rows, so
    the reduction never touches the corpus twice. Emits the top 10 with
    LOWER-BOUND counts (decrements make MG estimates conservative)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("item")
    )
    merged = (
        mg_summaries(li, k=20)
        .groupBy("item")
        .agg(F.sum("c").alias("est_count"))
    )
    return (
        merged.orderBy(F.desc("est_count"), "item")
        .limit(10)
        .select("item", "est_count")
    )
