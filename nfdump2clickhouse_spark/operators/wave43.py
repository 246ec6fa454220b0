"""Wave-43 keys (round 5): PMI collocations, 95th-percentile billing,
adoption curves, Mann–Kendall trend, dedup provenance.

- ``text_pmi_collocations``: pointwise-mutual-information word
  collocations [P — Church & Hanks 1990; the standard collocation
  score].
- ``flows_billing_95th``: 95th-percentile (burstable) bandwidth
  billing [P — the ISP industry's standard billing rule: bill the
  95th percentile of interval samples, burst the top 5% free].
- ``events_adoption_curve``: cumulative feature-adoption S-curves
  [P — standard product analytics].
- ``ts_mann_kendall``: Mann–Kendall nonparametric trend test
  [P — Mann 1945, Kendall 1975; the hydrology/ops standard for 'is
  this series trending?' without distribution assumptions].
- ``dedup_provenance_split``: near-duplicate mass split into
  within-source vs cross-source [P — the curation diagnostic deciding
  whether dedup is an intra-crawl or inter-crawl problem].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# text_pmi_collocations
# ---------------------------------------------------------------------------


@register(
    "text_pmi_collocations",
    oracle="""
    WITH dw AS (
      SELECT DISTINCT doc_id, t.w AS word
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(w)
      WHERE t.w <> ''
    ),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM dw),
    wc AS (SELECT word, COUNT(*) AS c FROM dw GROUP BY word),
    pairs AS (
      SELECT a.word AS w1, b.word AS w2, COUNT(*) AS c12
      FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.w1, p.w2, p.c12,
             ROUND(LN(p.c12 * 1.0 * nd.n / (ca.c * 1.0 * cb.c)), 4) AS pmi
      FROM pairs p
      JOIN wc ca ON p.w1 = ca.word
      JOIN wc cb ON p.w2 = cb.word
      CROSS JOIN nd
      WHERE p.c12 >= 20
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rn
      FROM scored
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, pmi
    FROM ranked WHERE rn <= 20 ORDER BY pmi DESC, w1, w2
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word collocations by document-level PMI: for word pairs
    co-occurring in ≥20 documents, PMI = ln(P(a,b)/(P(a)P(b))) over
    document presence — positive PMI means the words seek each other
    out (collocations, entities, idioms), ~0 means independence; the
    Church–Hanks score that feeds phrase detection and tokenizer
    merge-candidate mining (the statistical cousin of
    `tokenizer_bpe_merges`' frequency rule). Top-20 reported.

    Presence pairs come from ONE doc-keyed self-join of the (doc,
    word) distinct — bounded by per-doc vocabulary, never corpus² —
    then marginals join in from the word-count rollup (tiny,
    broadcast); top-20 is TakeOrderedAndProject on the rounded PMI."""
    dw = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
        .localCheckpoint()  # pairs + marginals + doc count share it
    )
    nd = dw.agg(F.count_distinct(F.col("doc_id")).alias("n"))
    # marginals checkpointed: BOTH pair sides read them broadcast, and
    # a re-derived aggregate would double the (bounded) marginal pass
    wc = (
        dw.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    a = dw.select(F.col("doc_id"), F.col("word").alias("w1"))
    b = dw.select(F.col("doc_id"), F.col("word").alias("w2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 20)
    )
    ca = wc.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    cb = wc.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    scored = (
        pairs.join(F.broadcast(ca), "w1")
        .join(F.broadcast(cb), "w2")
        .crossJoin(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.round(
                F.log(
                    F.col("c12") * 1.0 * F.col("n") / (F.col("c1") * 1.0 * F.col("c2"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


# ---------------------------------------------------------------------------
# flows_billing_95th
# ---------------------------------------------------------------------------


@register(
    "flows_billing_95th",
    oracle="""
    WITH buckets AS (
      SELECT '10.0.' || CAST(user_id % 10 AS VARCHAR) AS customer,
             CAST(FLOOR(epoch_us(ts) / 600000000) AS BIGINT) AS b10,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 1000) AS BIGINT)) AS bytes
      FROM events GROUP BY 1, 2
    )
    SELECT customer,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           ROUND(quantile_cont(bytes, 0.95), 4) AS p95_bytes,
           CAST(MAX(bytes) AS BIGINT) AS peak_bytes,
           ROUND(MAX(bytes) - quantile_cont(bytes, 0.95), 4)
             AS burst_headroom
    FROM buckets GROUP BY customer ORDER BY customer
    """,
)
def flows_billing_95th(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95th-percentile (burstable) bandwidth billing — the ISP
    industry's standard rule: sample traffic per customer per 10-minute
    interval, bill the 95th percentile of the samples, and the top 5%
    of intervals burst free. Reports the billable p95, the absolute
    peak, and the headroom the customer burned for free — THE number a
    flow-accounting deployment (the reference's whole reason to exist)
    produces monthly.

    One (customer, bucket) rollup (integer byte sums over integer
    bucket ids), then an exact per-customer percentile over the
    bounded per-customer sample sets — two exchanges; at 100 TB the
    sample table is |customers|·|intervals|, tiny next to flows."""
    b = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.concat(F.lit("10.0."), (F.col("user_id") % 10).cast("string")).alias(
                "customer"
            ),
            F.floor(F.unix_micros("ts") / 600000000).cast("bigint").alias("b10"),
        )
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1000).cast("bigint")
            ).alias("bytes")
        )
    )
    return (
        b.groupBy("customer")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_samples"),
            F.sum("bytes").cast("bigint").alias("total_bytes"),
            F.round(F.expr("percentile(bytes, 0.95)"), 4).alias("p95_bytes"),
            F.max("bytes").cast("bigint").alias("peak_bytes"),
            F.round(
                F.max("bytes") - F.expr("percentile(bytes, 0.95)"), 4
            ).alias("burst_headroom"),
        )
        .orderBy("customer")
    )


# ---------------------------------------------------------------------------
# events_adoption_curve
# ---------------------------------------------------------------------------


@register(
    "events_adoption_curve",
    oracle="""
    WITH firsts AS (
      SELECT event_type, user_id,
             MIN(CAST(ts AS DATE)) AS first_d
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
            AND ts IS NOT NULL
      GROUP BY event_type, user_id
    ),
    daily AS (
      SELECT event_type, strftime(first_d, '%Y-%m-%d') AS day,
             COUNT(*) AS new_adopters
      FROM firsts GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, COUNT(*) AS total_adopters
      FROM firsts GROUP BY event_type
    )
    SELECT d.event_type, d.day,
           CAST(d.new_adopters AS BIGINT) AS new_adopters,
           CAST(SUM(d.new_adopters) OVER (PARTITION BY d.event_type
                                          ORDER BY d.day) AS BIGINT)
             AS cum_adopters,
           CAST(10000 * SUM(d.new_adopters)
                  OVER (PARTITION BY d.event_type ORDER BY d.day)
                // t.total_adopters AS BIGINT) AS adoption_bp
    FROM daily d JOIN tot t USING (event_type)
    ORDER BY d.event_type, d.day
    """,
)
def events_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption S-curves: per event type, daily NEW adopters
    (each user counts once, on their first use of that type) and the
    cumulative adoption share in basis points of the type's eventual
    adopter base — the product-analytics chart that separates a
    launch spike from durable adoption; the per-feature sibling of
    `events_growth_accounting`'s corpus-level 'new'.

    One (type, user) first-day aggregate, a bounded (type, day)
    rollup, then cumulative windows over the ≤types×days curve table;
    the adopter totals ride a window over the same table (no second
    pass)."""
    firsts = (
        table(spark, sf_dir, "events")
        # two-sided gate: adoption needs an adopter, a feature, and a
        # date; under mixed NULLs the oracle's JOIN USING(event_type)
        # silently drops the NULL-type curve row that the engine's
        # window keeps (r8 nullmix sweep)
        .filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .groupBy("event_type", "user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("first_d"))
    )
    daily = firsts.groupBy(
        "event_type", F.date_format("first_d", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_adopters"))
    wc = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    curve = daily.withColumn(
        "cum_adopters", F.sum("new_adopters").over(wc)
    ).withColumn("total_adopters", F.sum("new_adopters").over(wt))
    return curve.select(
        "event_type",
        "day",
        F.col("new_adopters").cast("bigint").alias("new_adopters"),
        F.col("cum_adopters").cast("bigint").alias("cum_adopters"),
        F.expr("10000 * cum_adopters DIV total_adopters")
        .cast("bigint")
        .alias("adoption_bp"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# ts_mann_kendall
# ---------------------------------------------------------------------------


@register(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.rev > a.rev THEN 1
                  WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    s AS (
      SELECT SUM(sgn) AS s_stat,
             (SELECT COUNT(*) FROM daily) AS n
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           ROUND(n * (n - 1) * (2 * n + 5) / 18.0, 4) AS var_s,
           ROUND(CASE WHEN s_stat > 0
                      THEN (s_stat - 1) / SQRT(n * (n - 1) * (2 * n + 5) / 18.0)
                      WHEN s_stat < 0
                      THEN (s_stat + 1) / SQRT(n * (n - 1) * (2 * n + 5) / 18.0)
                      ELSE 0.0 END, 4) + 0 AS z,
           ROUND(s_stat * 2.0 / (n * (n - 1)), 4) + 0 AS kendall_tau
    FROM s
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on daily revenue: S = Σ_{i<j}
    sign(x_j − x_i) over all day pairs, with the no-ties variance
    n(n−1)(2n+5)/18 and the continuity-corrected z — the hydrology/ops
    standard for 'is this series monotonically trending?' with NO
    distribution or linearity assumption (complement:
    `stats_runs_test` asks 'is it random?', `agg_linreg` fits a slope
    that outliers own). Kendall's τ = 2S/(n(n−1)) reported as the
    effect size.

    The day-pair comparison is a self-join of the BOUNDED daily table
    (one row per day — 30×29/2 pairs here, ~66k for a 1-year window;
    the corpus-sized work is the one day-grain aggregate). Integer
    cents make every sign exact; ties contribute 0 on both engines
    identically."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .localCheckpoint()  # pair join reads both sides from one compute
    )
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    sgn = (
        F.when(F.col("rb") > F.col("ra"), 1)
        .when(F.col("rb") < F.col("ra"), -1)
        .otherwise(0)
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(sgn.alias("sgn"))
    n_days = daily.count()
    s = pairs.agg(F.sum("sgn").alias("s_stat"))
    n = F.lit(n_days)
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    ss = F.col("s_stat")
    z = (
        F.when(ss > 0, (ss - 1) / F.sqrt(var_s))
        .when(ss < 0, (ss + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return s.select(
        n.cast("bigint").alias("n_days"),
        ss.cast("bigint").alias("s_stat"),
        F.round(var_s, 4).alias("var_s"),
        (F.round(z, 4) + F.lit(0)).alias("z"),
        (F.round(ss * 2.0 / (n * (n - 1)), 4) + F.lit(0)).alias("kendall_tau"),
    )


# ---------------------------------------------------------------------------
# dedup_provenance_split
# ---------------------------------------------------------------------------


@register(
    "dedup_provenance_split",
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
    ),
    pairs AS (
      SELECT id1, id2
      FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE c * 10 >= 3 * (x.n + y.n - c)
    ),
    src AS (SELECT doc_id, source FROM documents),
    tagged AS (
      SELECT (s1.source = s2.source) AS same_source
      FROM pairs p
      JOIN src s1 ON p.id1 = s1.doc_id
      JOIN src s2 ON p.id2 = s2.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
           CAST(COALESCE(count_if(same_source), 0) AS BIGINT) AS within_source,
           CAST(COALESCE(count_if(NOT same_source), 0) AS BIGINT) AS cross_source,
           CAST(10000 * COALESCE(count_if(same_source), 0)
                // greatest(COUNT(*), 1) AS BIGINT) AS within_bp
    FROM tagged
    """,
)
def dedup_provenance_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup provenance diagnostic: near-duplicate pairs (J ≥ 0.3,
    integer cross-multiplied) split into WITHIN-source vs CROSS-source
    — the curation decision this number drives is real: within-source
    duplication is a crawler/boilerplate problem fixed upstream
    (per-shard dedup suffices — cheap), cross-source duplication is
    syndication/mirroring that only GLOBAL dedup catches (expensive).
    `dedup_threshold_curve` says how many pairs; this says WHERE they
    come from.

    Reuses the shared inverted-shingle pair core; the (doc → source)
    dimension is a 2-column broadcast joined onto the qualifying-pair
    table only (never onto the posting lists); 1-row integer report."""
    from .dedup_extra import shingle_pair_counts

    pairs = shingle_pair_counts(spark, sf_dir, min_len_ratio=0.3).filter(
        F.col("c") * 10 >= 3 * (F.col("n1") + F.col("n2") - F.col("c"))
    )
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    s1 = src.select(F.col("doc_id").alias("id1"), F.col("source").alias("src1"))
    s2 = src.select(F.col("doc_id").alias("id2"), F.col("source").alias("src2"))
    tagged = (
        pairs.join(F.broadcast(s1), "id1")
        .join(F.broadcast(s2), "id2")
        .select((F.col("src1") == F.col("src2")).alias("same_source"))
    )
    same = F.col("same_source")
    return tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.count_if(same).cast("bigint").alias("within_source"),
        F.count_if(~same).cast("bigint").alias("cross_source"),
        F.expr(
            "10000 * count_if(same_source) DIV greatest(count(1), 1)"
        )
        .cast("bigint")
        .alias("within_bp"),
    )
