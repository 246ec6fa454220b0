"""Wave-13 operators (round 2): Matryoshka embedding truncation,
negative-example mining, RFM segmentation, and beaconing detection.

Same SURVEY §5.3 conventions as waves 4-12.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.similarity import as_double
from ..registry import register

# --- Matryoshka truncation ---------------------------------------------------

_MRL_DIM = 16


@register(
    "emb_matryoshka_truncate",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding[1:{_MRL_DIM}], x -> CAST(x AS DOUBLE))
               AS emb
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, emb,
             sqrt(list_aggregate(list_transform(emb, x -> x * x), 'sum'))
               AS nrm
      FROM e
    )
    SELECT vec_id, ROUND(nrm, 4) AS sub_l2,
           ROUND(emb[1] / nrm, 4) + 0 AS u0,
           ROUND(emb[2] / nrm, 4) + 0 AS u1
    FROM n WHERE nrm > 0
    """,
)
def emb_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation: keep the first 16 of 64 dims and
    re-L2-normalize — the 4× index/bandwidth saving modern embedding
    models are trained to tolerate (candidate retrieval runs on the
    prefix; full-dim rescoring only on survivors). Row-local slice +
    HOF fold, zero shuffle; the retained-recall contract vs full-dim
    brute force is pinned in tests — the number that decides whether
    the cheap prefix index is usable."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(as_double("embedding"), 1, _MRL_DIM).alias("emb")
    )
    nrm = F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    return (
        e.select("vec_id", "emb", nrm.alias("nrm"))
        .filter(F.col("nrm") > 0)
        .select(
            "vec_id",
            F.round("nrm", 4).alias("sub_l2"),
            (F.round(F.get("emb", 0) / F.col("nrm"), 4) + 0).alias("u0"),
            (F.round(F.get("emb", 1) / F.col("nrm"), 4) + 0).alias("u1"),
        )
    )


# --- negative-example mining -------------------------------------------------


@register(
    "sample_negative_mining",
    oracle="""
    WITH pos AS (
      SELECT event_id AS label_id, user_id FROM events
      WHERE event_type = 'purchase'
    ),
    neg AS (
      SELECT e.event_id AS neg_id, e.user_id,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
               ORDER BY md5(CAST(e.event_id AS VARCHAR)), e.event_id) AS rk
      FROM events e WHERE e.event_type <> 'purchase'
    )
    SELECT p.label_id, p.user_id, n.neg_id
    FROM pos p JOIN neg n ON p.user_id = n.user_id AND n.rk <= 2
    """,
)
def sample_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-example mining for contrastive/ranking training: each
    positive (purchase) is paired with 2 deterministic same-user
    negatives — hash-rank sampling makes the negative set a pure
    function of the data (rebuilds and both engines agree; engine RNG
    cannot), which is what makes training sets reproducible.

    Shape: negatives come from ONE user-keyed window (literal rank
    bound → WindowGroupLimit, same plan as `sample_mixture_quota`),
    then a user-keyed join fans them onto positives. In-batch /
    hard-negative mining swaps the rank key for a similarity score —
    identical plan."""
    e = table(spark, sf_dir, "events")
    pos = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"), "user_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    neg = (
        e.filter(F.col("event_type") != "purchase")
        .select(
            F.col("event_id").alias("neg_id"),
            "user_id",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 2)
    )
    return pos.join(neg, "user_id").select("label_id", "user_id", "neg_id")


# --- RFM segmentation --------------------------------------------------------


@register(
    "events_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      -- integer cents (SURVEY §5.3 r2 rule): float sums/avgs diverge at
      -- round boundaries between engines
      SELECT user_id,
             date_diff('day', MAX(CASE WHEN event_type = 'purchase' THEN ts END),
                       TIMESTAMP '2024-02-01') AS recency_days,
             count_if(event_type = 'purchase') AS frequency,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS monetary_c
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary_c,
             ntile(3) OVER (ORDER BY recency_days ASC, user_id) AS r_seg,
             ntile(3) OVER (ORDER BY frequency DESC, user_id) AS f_seg,
             ntile(3) OVER (ORDER BY monetary_c DESC, user_id) AS m_seg
      FROM rfm WHERE frequency > 0
    )
    SELECT r_seg, f_seg, m_seg, COUNT(*) AS n_users,
           CAST((2 * SUM(monetary_c) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS avg_monetary_c
    FROM scored GROUP BY r_seg, f_seg, m_seg
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency / frequency / monetary terciles, the
    classic behavioral-cohort matrix (who to re-engage, who to protect).
    The corpus-scale work is ONE user-keyed agg; the three terciles then
    run over the user table (rows = users, not events). Even that table
    is billions of rows at scale, so the r2 global ntile windows are
    replaced (VERDICT r2 next-#3, closed) by
    ``functions.distributed.binned_exact_ntile`` — the in-plan binned
    global rank plus closed-form ntile arithmetic, exact tiles with no
    unpartitioned window (r12, VERDICT r11 next-#4: the sampler
    machinery ran a serial driver chain PER TERCILE — 3× sample +
    checkpoint + collect; the binned chain is ONE executed job, with
    each tercile's bounds from the helper's in-plan broadcast min/max
    arm over its derived metric); approx-quantile range cuts remain
    the cheaper swap when exact counts aren't required. Unique
    (metric, user_id) tiebreaks keep both engines' tiles identical."""
    e = table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    cents = F.round(F.col("value") * 100).cast("bigint")
    rfm = (
        e.groupBy("user_id")
        .agg(
            F.datediff(
                F.lit("2024-02-01").cast("timestamp"),
                F.max(F.when(is_p, F.col("ts"))),
            ).alias("recency_days"),
            F.count_if(is_p).alias("frequency"),
            F.sum(F.when(is_p, cents).otherwise(F.lit(0))).alias("monetary_c"),
        )
        .filter(F.col("frequency") > 0)
    )
    from ..functions.distributed import binned_exact_ntile

    # each tercile runs over a LEAN (user_id, metric) projection and
    # joins back on user_id: chaining the three ntiles instead nests
    # every level's offsets+bounds arms inside the next level's copies
    # (measured: a 304-Exchange static plan, 28 executed stages); the
    # lean branches keep each binned scan's arms demand-symmetric
    # (ReusedExchange per branch) and the static plan linear
    scored = rfm.select("user_id", "monetary_c")
    for out_col, lead, desc in [
        ("r_seg", "recency_days", False),
        ("f_seg", "frequency", True),
        ("m_seg", "monetary_c", True),
    ]:
        seg = binned_exact_ntile(
            rfm.select("user_id", lead), 3, lead, ["user_id"], out_col,
            desc=desc,
        ).select("user_id", out_col)
        scored = scored.join(seg, "user_id")
    scored = scored.select("monetary_c", "r_seg", "f_seg", "m_seg")
    return scored.groupBy("r_seg", "f_seg", "m_seg").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr(
            "CAST((2 * SUM(monetary_c) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("avg_monetary_c"),
    )


# --- beaconing detection -----------------------------------------------------


@register(
    "flows_beaconing_detection",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    stats AS (
      SELECT user_id, event_type,
             COUNT(gap_us) AS n_gaps,
             ROUND(AVG(gap_us) / 1000000.0, 2) AS mean_gap_s,
             ROUND(stddev_samp(gap_us) / greatest(AVG(gap_us), 1), 4) AS cv
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY user_id, event_type
      HAVING COUNT(gap_us) >= 10
    )
    SELECT user_id, event_type, n_gaps, mean_gap_s, cv, cv < 0.5 AS beacon
    FROM stats
    """,
)
def flows_beaconing_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beaconing detection — the C2-hunting staple on flow data: a
    (src, dst) channel whose inter-arrival gaps have a LOW coefficient
    of variation is machine-periodic, not human (here per (user,
    event_type) channel over the events fixture; on flows the key is
    (sa, da, dp)). Complements `flows_portscan` (fan-out) and
    `events_anomaly_zscore` (volume): this one sees timing regularity.

    ONE channel-keyed sort window computes gaps; the CV aggregate rides
    the same partitioning (no second shuffle), and the ≥10-gap floor
    kills the noise channels before they reach the report."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = e.select(
        "user_id", "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    cv = F.round(
        F.stddev_samp("gap_us") / F.greatest(F.avg("gap_us"), F.lit(1)), 4
    )
    return (
        gaps.groupBy("user_id", "event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1_000_000.0, 2).alias("mean_gap_s"),
            cv.alias("cv"),
        )
        .filter(F.col("n_gaps") >= 10)
        .withColumn("beacon", F.col("cv") < 0.5)
    )


@register(
    "stats_ks_test",
    oracle="""
    WITH s AS (
      SELECT l_extendedprice AS v,
             CAST(('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                    AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS grp
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    c AS (
      SELECT v, grp,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY v) AS c0,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
               OVER (ORDER BY v) AS c1
      FROM s
    ),
    t AS (
      SELECT CAST(count_if(grp = 0) AS BIGINT) AS n0,
             CAST(count_if(grp = 1) AS BIGINT) AS n1
      FROM s
    )
    SELECT t.n0, t.n1,
           CAST(MAX(ABS(CAST(c0 AS HUGEINT) * t.n1
                        - CAST(c1 AS HUGEINT) * t.n0)) AS BIGINT) AS max_diff,
           CAST((2 * MAX(ABS(CAST(c0 AS HUGEINT) * t.n1
                             - CAST(c1 AS HUGEINT) * t.n0)) * 1000000
                 + CAST(t.n0 AS HUGEINT) * t.n1)
                // (2 * CAST(t.n0 AS HUGEINT) * t.n1) AS BIGINT) AS ks_e6
    FROM c, t GROUP BY t.n0, t.n1
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the two hash
    halves of the price distribution — the distribution-level drift test
    next to `drift_psi` (PSI needs binning; KS is bin-free and catches
    shape shifts PSI's 10 buckets smear out). On an unbiased hash split,
    a tiny D IS the assertion.

    Exact formulation, fully distributed (VERDICT r2 next-#2 closed —
    the r2 version ran a corpus-sized unpartitioned window): D only
    changes at distinct values of v, so ties collapse to per-distinct-
    value group counts before the scan. r11 (guide §1.2/§2.4): the
    prefix_sums mechanism here ran FOUR serial driver jobs
    (localCheckpoint, boundary sample, O(P) subtotal collect, final) —
    at sf0.1 that serial chain, not compute, owned the wall clock. The
    two-phase scan is now fully IN-PLAN, ONE executed job: the range id
    is an equi-width-bin literal over the [min,max] read from the
    PARQUET FOOTERS (driver metadata, no job; stats-less files fall
    back to one min/max aggregation). Monotonicity of the bin id in v
    is all the prefix decomposition needs — bin BALANCE only affects
    parallelism, never correctness, and the window input is
    distinct-VALUE rows, so a value-mass hot spot still collapses to
    one row per price. Per-bin start offsets AND the n0/n1 grand
    totals come from one bounded nbins-row window + broadcast join
    instead of driver collects. The binning exchange is shared by the
    tie-collapse agg, the offsets arm and the in-bin window
    (hashpartitioning(_pid) clusters every downstream key), so the
    whole statistic is one corpus scan over one corpus shuffle. nbins
    derives from defaultParallelism — scale-adaptive, not a local
    constant. D stays the INTEGER max of |c0·n1 − c1·n0|; ks_e6 is the
    exact round-half-up scaled statistic.

    Degenerate-input parity (r9 edge batch, SURVEY §17.1): a NULL price
    is not a sample point (two-sided IS NOT NULL — nullmix mode: Spark
    would otherwise sort the NULL group first where DuckDB cumulates it
    last); on an empty sample GROUP BY(n0, n1) over zero cumulative
    rows emits zero rows, exactly the oracle's empty cross join; and
    with one group empty the scaled DIV's denominator is 0, where
    DuckDB `//` yields NULL — the CASE gate reproduces that NULL."""
    from ..catalog import parquet_column_stats

    li = table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    s = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_extendedprice").alias("v"),
        (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 2).alias(
            "grp"
        ),
    )
    # value-domain bounds from the parquet footers (driver metadata, no
    # job); a stats-less file falls back to one min/max aggregation job
    stats = parquet_column_stats(sf_dir, "lineitem", "l_extendedprice")
    if stats is None:
        row = s.agg(F.min("v"), F.max("v"), F.count(F.lit(1))).collect()[0]
        lo, hi, nrows = row[0], row[1], int(row[2])
    else:
        lo, hi, nrows = stats
    # ~8 bin keys per shuffle partition so the hash spreads evenly
    # (guide §2.5); floor 16 keeps the tiny-cluster edge sane
    nbins = max(spark.sparkContext.defaultParallelism, 2) * 8
    if lo is None or hi is None or hi == lo:
        pid = F.lit(0)
    else:
        width = (float(hi) - float(lo)) / nbins
        pid = F.least(
            F.floor((F.col("v").cast("double") - float(lo)) / width),
            F.lit(nbins - 1),
        ).cast("int")
    sp = s.withColumn("_pid", pid).repartition("_pid")
    # ties collapse: per-distinct-value counts per group (no exchange —
    # _pid is a function of v, so the repartition already clusters v)
    dv = sp.groupBy("_pid", "v").agg(
        F.count_if(F.col("grp") == 0).alias("d0"),
        F.count_if(F.col("grp") == 1).alias("d1"),
    )
    # one window pass over dv yields the in-bin running counts AND the
    # per-bin totals (full-frame second spec, same sort, no new
    # exchange); the tiny offsets arm branches ABOVE the window, so its
    # pruned copy shares the binning exchange + tie-collapse agg
    # byte-for-byte with the main arm (ReusedExchange at runtime — the
    # md5 scan and shuffle run once)
    w_run = Window.partitionBy("_pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_bin = Window.partitionBy("_pid")
    wout = dv.select(
        "_pid",
        F.sum("d0").over(w_run).alias("lc0"),
        F.sum("d1").over(w_run).alias("lc1"),
        F.coalesce(F.sum("d0").over(w_bin), F.lit(0)).alias("t0"),
        F.coalesce(F.sum("d1").over(w_bin), F.lit(0)).alias("t1"),
    )
    # bounded nbins-row offsets scan (allowlisted unpartitioned window:
    # one row per bin, never corpus-sized). The same sorted single
    # partition yields the exclusive start offsets AND the n0/n1 grand
    # totals — no driver collect, no extra exchange.
    offw = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    totw = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = (
        wout.select("_pid", "t0", "t1")
        .distinct()
        .select(
            "_pid",
            F.coalesce(F.sum("t0").over(offw), F.lit(0)).alias("off0"),
            F.coalesce(F.sum("t1").over(offw), F.lit(0)).alias("off1"),
            F.sum("t0").over(totw).alias("n0c"),
            F.sum("t1").over(totw).alias("n1c"),
        )
    )
    c = (
        wout.join(F.broadcast(offs), "_pid")
        .select(
            (F.col("off0") + F.col("lc0")).cast("bigint").alias("c0"),
            (F.col("off1") + F.col("lc1")).cast("bigint").alias("c1"),
            F.col("n0c").alias("n0"),
            F.col("n1c").alias("n1"),
        )
    )
    # r10 (ADVICE r9 low, the r9 hurst/pacf/cusum convention): the
    # cumulative products and the 2·D·1e6 scaled numerator can exceed
    # int64 — max_diff approaches n0·n1, so the scaled numerator
    # 2·D·1e6 + n0·n1 cliffs once n0·n1 > (2^63−1)/(2e6+1) ≈ 4.6e12
    # (~4e6 rows). r11: the width stays a plan-time branch, but the
    # bound is now the FOOTER row count (n0·n1 ≤ nrows²/4, exact and
    # collect-free) — int64 below the cliff (the common case, no
    # decimal tax), decimal(38,0) above it; both paths are exact
    # integer arithmetic producing identical values, so the HUGEINT
    # oracle needs no fork. The final casts stay BIGINT (ks_e6 ≤ 1e6
    # by construction; max_diff representable while n0·n1 < 2^63,
    # documented bound). Degenerate guards moved from Python to SQL
    # with n0/n1 now columns: one-group-empty → CASE yields the NULL
    # DuckDB `// 0` produces; empty sample → GROUP BY over zero rows
    # emits zero rows, exactly the oracle's empty cross join.
    int64_safe = nrows * nrows <= 4 * (((1 << 63) - 1) // 2_000_001)
    cum_t = "bigint" if int64_safe else "decimal(38,0)"
    ks_e6 = F.expr(
        "CASE WHEN n0 = 0 OR n1 = 0 THEN CAST(NULL AS BIGINT) ELSE "
        f"CAST((2 * max_diff_d * 1000000 + CAST(n0 AS {cum_t}) * CAST(n1 AS {cum_t})) DIV"
        f" (2 * CAST(n0 AS {cum_t}) * CAST(n1 AS {cum_t})) AS BIGINT) END"
    )
    return (
        c.groupBy("n0", "n1")
        .agg(
            F.max(
                F.abs(
                    F.col("c0").cast(cum_t) * F.col("n1").cast(cum_t)
                    - F.col("c1").cast(cum_t) * F.col("n0").cast(cum_t)
                )
            ).alias("max_diff_d")
        )
        .select(
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            F.col("max_diff_d").cast("bigint").alias("max_diff"),
            ks_e6.alias("ks_e6"),
        )
    )
