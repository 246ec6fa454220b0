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
    ``functions.distributed.exact_ntile`` — the two-phase range-
    partitioned global rank plus closed-form ntile arithmetic, exact
    tiles with no unpartitioned window; approx-quantile range cuts
    remain the cheaper swap when exact counts aren't required. Unique
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
    from ..functions.distributed import exact_ntile

    scored = rfm
    for out_col, order in [
        ("r_seg", [F.asc("recency_days"), F.asc("user_id")]),
        ("f_seg", [F.desc("frequency"), F.asc("user_id")]),
        ("m_seg", [F.desc("monetary_c"), F.asc("user_id")]),
    ]:
        scored = exact_ntile(scored, 3, order, out_col)
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
    changes at distinct values of v, so first aggregate to per-distinct-
    value group counts (one shuffle; ties collapse here, which the RANGE
    frame handled in the oracle), then compute BOTH cumulative counts
    with ``functions.distributed.prefix_sums`` (the shared two-phase
    scan: literal-boundary range ids, one O(P) subtotal collect,
    pid-partitioned windows), so no task ever sees more than its value
    range. D stays the INTEGER max of |c0·n1 − c1·n0| — no float CDF
    subtraction to drift cross-engine; ks_e6 is the exact round-half-up
    scaled statistic. n0/n1 fall out of the subtotal pass for free.

    Degenerate-input parity (r9 edge batch, SURVEY §17.1): a NULL price
    is not a sample point (two-sided IS NOT NULL — nullmix mode: Spark
    would otherwise sort the NULL group first where DuckDB cumulates it
    last); on an empty sample the oracle's cross join with the empty
    CDF CTE yields zero rows, mirrored by the n0+n1>0 gate; and with
    one group empty the scaled DIV's denominator is 0, where DuckDB
    `//` yields NULL — guarded in Python (n0/n1 are driver ints)."""
    li = table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    s = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_extendedprice").alias("v"),
        (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 2).alias(
            "grp"
        ),
    )
    # ties collapse: per-distinct-value counts per group
    dv = s.groupBy("v").agg(
        F.count_if(F.col("grp") == 0).alias("d0"),
        F.count_if(F.col("grp") == 1).alias("d1"),
    )
    from ..functions.distributed import prefix_sums

    p, tot = prefix_sums(dv, ["v"], ["d0", "d1"])
    n0, n1 = tot["d0"], tot["d1"]  # group sizes, free from the subtotal pass
    c = p.select(F.col("_ps_d0").alias("c0"), F.col("_ps_d1").alias("c1"))
    n0l = F.lit(n0).cast("bigint")
    n1l = F.lit(n1).cast("bigint")
    # n0/n1 are driver ints, so the degenerate guards are plain Python:
    # one-group-empty → DuckDB `// 0` is NULL; empty sample → the
    # oracle's cross join with the empty CDF CTE emits zero rows.
    # r10 (ADVICE r9 low, the r9 hurst/pacf/cusum convention): the
    # cumulative products and the 2·D·1e6 scaled numerator can exceed
    # int64 — max_diff approaches n0·n1, so the scaled numerator
    # 2·D·1e6 + n0·n1 cliffs once n0·n1 > (2^63−1)/(2e6+1) ≈ 4.6e12
    # (~4e6 rows). r11 (VERDICT r10 next-#6): n0·n1 is a DRIVER int, so
    # the width is a plan-time Python branch — int64 below the cliff
    # (the common case, no decimal tax), decimal(38,0) above it. Both
    # paths are exact integer arithmetic producing identical values,
    # so the HUGEINT oracle needs no fork. The final casts stay BIGINT
    # (ks_e6 ≤ 1e6 by construction; max_diff representable while
    # n0·n1 < 2^63, documented bound).
    prod = n0 * n1  # exact Python int, immune to int64
    int64_safe = prod <= ((1 << 63) - 1) // 2_000_001
    cum_t = "bigint" if int64_safe else "decimal(38,0)"
    lit_sfx = "L" if int64_safe else "BD"
    ks_e6 = (
        F.expr(
            f"CAST((2 * max_diff_d * 1000000 + {prod}{lit_sfx}) DIV"
            f" (2 * {prod}{lit_sfx}) AS BIGINT)"
        )
        if prod > 0
        else F.lit(None).cast("bigint")
    )
    return (
        c.agg(
            F.max(
                F.abs(
                    F.col("c0").cast(cum_t) * n1l
                    - F.col("c1").cast(cum_t) * n0l
                )
            ).alias("max_diff_d")
        )
        .where(F.lit(n0 + n1) > 0)
        .select(
            n0l.alias("n0"),
            n1l.alias("n1"),
            F.col("max_diff_d").cast("bigint").alias("max_diff"),
            ks_e6.alias("ks_e6"),
        )
    )
