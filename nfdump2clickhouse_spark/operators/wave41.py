"""Wave-41 keys (round 5): empirical-Bayes shrinkage, sequential
testing, word burstiness, Brier decomposition, log-scale histograms.

- ``stats_bayes_shrunk_rates``: empirical-Bayes beta-binomial
  shrinkage of per-user conversion rates [P — Efron & Morris 1975;
  the method-of-moments prior is the standard 'add the right k'].
- ``stats_sprt_early_stop``: Wald's sequential probability ratio test
  replayed over the event stream [P — Wald 1945; the early-stopping
  machinery under every sequential A/B platform].
- ``text_burstiness_dispersion``: per-word dispersion index
  (variance-to-mean of per-doc counts) [P — corpus linguistics'
  burstiness: topical words clump, function words spread].
- ``ml_calibration_brier``: Brier score with the Murphy
  reliability/resolution/uncertainty decomposition [P — Murphy 1973].
- ``agg_log_histogram``: order-of-magnitude (decade) histograms
  [P — the right bucketing for heavy-tailed byte/latency columns,
  where equi-width `agg_histogram` puts everything in bin 1].
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_bayes_shrunk_rates
# ---------------------------------------------------------------------------


@register(
    "stats_bayes_shrunk_rates",
    oracle="""
    WITH u AS (
      SELECT user_id, COUNT(*) AS n,
             count_if(event_type = 'purchase') AS k
      FROM events GROUP BY user_id
    ),
    prior AS (
      SELECT AVG(k * 1.0 / n) AS mu,
             (SUM((k * 1.0 / n - (SELECT AVG(k * 1.0 / n) FROM u))
                  * (k * 1.0 / n - (SELECT AVG(k * 1.0 / n) FROM u)))
              / (COUNT(*) - 1)) AS v
      FROM u
    ),
    ab AS (
      SELECT mu, v,
             mu * (mu * (1 - mu) / v - 1) AS alpha,
             (1 - mu) * (mu * (1 - mu) / v - 1) AS beta
      FROM prior
    ),
    s AS (
      SELECT u.user_id, u.n, u.k,
             ROUND(u.k * 1.0 / u.n, 4) AS raw_rate,
             ROUND((u.k + ab.alpha) / (u.n + ab.alpha + ab.beta), 4)
               AS shrunk_rate
      FROM u CROSS JOIN ab
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY shrunk_rate DESC, user_id) AS rn
      FROM s
    )
    SELECT user_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           raw_rate, shrunk_rate
    FROM r WHERE rn <= 50 ORDER BY shrunk_rate DESC, user_id
    """,
)
def stats_bayes_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates: fit a Beta
    prior by method of moments on the raw rates (α, β from their mean
    and variance), then shrink every user toward it —
    (k+α)/(n+α+β) — so a 1-for-1 user no longer outranks a 95-for-100
    one. THE fix for every 'top converters' leaderboard dominated by
    tiny-n flukes; ranks by the shrunk rate, top-50 reported.

    One user rollup; the prior is a 1-row moment pass over the rollup
    broadcast back (two bounded aggregates, never a second corpus
    scan); top-50 is TakeOrderedAndProject on the rounded shrunk rate
    + id tiebreak."""
    u = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("event_type") == "purchase").alias("k"),
        )
        .localCheckpoint()  # prior pass + scoring pass share one compute
    )
    rate = F.col("k") * 1.0 / F.col("n")
    prior = u.agg(
        F.avg(rate).alias("mu"), F.var_samp(rate).alias("v")
    )
    # method-of-moments factor X = mu(1-mu)/v, NULL when the rate
    # variance is zero or undefined (single user / identical rates) —
    # try_divide matches DuckDB's NULL-on-zero-divisor division; alpha
    # and beta are the oracle's DIRECT forms mu*(X-1) and (1-mu)*(X-1)
    # (the old beta rewrite alpha*(1-mu)/mu divided by a zero mu on an
    # all-miss corpus — r7 edge sweep)
    x_m1 = F.try_divide(F.col("mu") * (1 - F.col("mu")), F.col("v")) - 1
    ab = prior.select(
        (F.col("mu") * x_m1).alias("alpha"),
        ((1 - F.col("mu")) * x_m1).alias("beta"),
    )
    s = u.crossJoin(F.broadcast(ab)).select(
        "user_id",
        "n",
        "k",
        F.round(rate, 4).alias("raw_rate"),
        F.round(
            F.try_divide(
                F.col("k") + F.col("alpha"),
                F.col("n") + F.col("alpha") + F.col("beta"),
            ),
            4,
        ).alias("shrunk_rate"),
    )
    return (
        s.orderBy(F.desc("shrunk_rate"), "user_id")
        .limit(50)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n"),
            F.col("k").cast("bigint").alias("k"),
            "raw_rate",
            "shrunk_rate",
        )
        .orderBy(F.desc("shrunk_rate"), "user_id")
    )


# ---------------------------------------------------------------------------
# stats_sprt_early_stop
# ---------------------------------------------------------------------------


_SPRT_LA = math.log(0.25 / 0.20)  # per-hit LLR term
_SPRT_LB = math.log(0.75 / 0.80)  # per-miss LLR term
_SPRT_HI = math.log(19.0)
_SPRT_LO = math.log(1.0 / 19.0)


@register(
    "stats_sprt_early_stop",
    # llr in CLOSED FORM from the integer running totals (h hits in t
    # trials → llr = h·la + (t−h)·lb) with the log constants pinned as
    # shortest-roundtrip literals on BOTH sides — no sequential float
    # accumulation to drift between engines, and the engine side can
    # run it from integer prefix sums
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit,
             ts, event_id
      FROM events
    ),
    r AS (
      SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS t,
             SUM(hit) OVER (ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS h
      FROM s
    ),
    dec AS (
      SELECT t,
             h * {_SPRT_LA!r} + (t - h) * {_SPRT_LB!r} AS llr,
             CASE WHEN h * {_SPRT_LA!r} + (t - h) * {_SPRT_LB!r}
                       >= {_SPRT_HI!r} THEN 'accept_h1'
                  WHEN h * {_SPRT_LA!r} + (t - h) * {_SPRT_LB!r}
                       <= {_SPRT_LO!r} THEN 'accept_h0'
             END AS decision
      FROM r
    )
    SELECT CAST(COALESCE(MAX(t), 0) AS BIGINT) AS n_total,  -- 0 trials, not NULL
           CAST(MIN(CASE WHEN decision IS NOT NULL THEN t END) AS BIGINT)
             AS stopped_at,
           min_by(decision, CASE WHEN decision IS NOT NULL THEN t END)
             AS decision,
           ROUND(min_by(llr, CASE WHEN decision IS NOT NULL THEN t END), 4)
             AS llr_at_stop
    FROM dec
    """,
)
def stats_sprt_early_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT replayed over the event stream: testing
    H0: p(purchase)=0.20 vs H1: p=0.25 at α=β=0.05, the log-likelihood
    ratio random-walks one term per event and the test STOPS the first
    time it exits (ln(1/19), ln(19)) — the sequential machinery that
    lets an A/B platform stop in a fraction of the fixed-horizon
    sample size, with error rates still guaranteed. Reports the
    stopping time, the decision, and the LLR at the boundary.

    The LLR at trial t is a pure function of the integer running
    totals (h hits in t trials → llr = h·la + (t−h)·lb), so the walk
    needs no float accumulation at all: ONE
    `functions.distributed.binned_prefix_sums` pass over (ts,
    event_id) yields h and t (r12, VERDICT r11 next-#4: the sampler
    `prefix_sums` ran FOUR serial driver jobs; the in-plan binned scan
    is ONE executed job — bin-id literals from the parquet-footer
    [min,max] of `ts`, offsets from a bounded nbins-row window +
    broadcast join, and the grand total riding the same broadcast as a
    column; COALESCE(,0) on it reproduces the oracle's 0-trials-not-
    NULL empty semantics), the closed-form llr and boundary test run
    in codegen, and the first exit is a conditional MIN — no
    iteration, no driver loop, no single-task sort."""
    import datetime

    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_prefix_sums

    s = (
        table(spark, sf_dir, "events")
        .select(
            "ts",
            "event_id",
            (F.col("event_type") == "purchase").cast("int").alias("hit"),
        )
        .withColumn("one", F.lit(1))
    )
    stats = parquet_column_stats(sf_dir, "events", "ts")
    lo = hi = None  # stats-less/odd-typed footer: in-plan broadcast bounds
    if stats is not None and isinstance(stats[0], datetime.datetime):
        lo, hi = stats[0], stats[1]
    p = binned_prefix_sums(
        s, ["ts", "event_id"], ["hit", "one"], lo, hi, totals=["one"]
    )
    llr = F.col("_ps_hit") * F.lit(_SPRT_LA) + (
        F.col("_ps_one") - F.col("_ps_hit")
    ) * F.lit(_SPRT_LB)
    dec = p.select(
        F.col("_ps_one").alias("t"),
        F.col("_ps_tot_one").alias("nt"),
        llr.alias("llr"),
        F.when(llr >= _SPRT_HI, F.lit("accept_h1"))
        .when(llr <= _SPRT_LO, F.lit("accept_h0"))
        .alias("decision"),
    )
    d = F.col("decision")
    # min_by on the FIRST decided t: a plain MIN over decided rows
    # returns the walk's deepest excursion, not the boundary value —
    # the bug the independent python-replay pin caught
    t_decided = F.when(d.isNotNull(), F.col("t"))
    return dec.agg(
        F.coalesce(F.max("nt"), F.lit(0)).cast("bigint").alias("n_total"),
        F.min(t_decided).cast("bigint").alias("stopped_at"),
        F.min_by(d, t_decided).alias("decision"),
        F.round(F.min_by(F.col("llr"), t_decided), 4).alias("llr_at_stop"),
    )


# ---------------------------------------------------------------------------
# text_burstiness_dispersion
# ---------------------------------------------------------------------------


@register(
    "text_burstiness_dispersion",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.w AS word
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(w)
      WHERE t.w <> ''
    ),
    per_doc AS (
      SELECT word, doc_id, COUNT(*) AS c FROM tok GROUP BY word, doc_id
    ),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
    stats AS (
      SELECT p.word,
             SUM(p.c) AS total,
             COUNT(*) AS docs_with,
             SUM(p.c) * 1.0 / nd.n_docs AS mean_c,
             (SUM(p.c * p.c) - SUM(p.c) * SUM(p.c) * 1.0 / nd.n_docs)
               / (nd.n_docs - 1) AS var_c
      FROM per_doc p CROSS JOIN nd
      GROUP BY p.word, nd.n_docs
    ),
    ranked AS (
      SELECT word, total, docs_with,
             ROUND(var_c / mean_c, 4) AS dispersion,
             ROW_NUMBER() OVER (ORDER BY total DESC, word) AS rn
      FROM stats
    )
    SELECT word, CAST(total AS BIGINT) AS total,
           CAST(docs_with AS BIGINT) AS docs_with, dispersion
    FROM ranked WHERE rn <= 30 ORDER BY total DESC, word
    """,
)
def text_burstiness_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness via the dispersion index var/mean of per-doc
    counts (zero-count docs included through the moment algebra):
    D ≈ 1 is Poisson-spread (function words — everywhere, evenly);
    D ≫ 1 is bursty (topical words — absent mostly, clumped where
    they occur). The corpus-linguistics signal that separates
    stopword-like tokens from content words WITHOUT a stopword list —
    feeds `text_keywords_topk`-style weighting. Top-30 by frequency.

    One (word, doc) count, then per-word moments where the zero-doc
    mass enters via closed form (Σc over ALL docs with n_docs in the
    denominator — no explode of zero cells); top-30 is a
    TakeOrderedAndProject. n_docs rides in as a 1-row broadcast."""
    tok = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    per_doc = tok.groupBy("word", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    nd = tok.agg(F.count_distinct(F.col("doc_id")).alias("n_docs"))
    c, n = F.col("c"), F.col("n_docs")
    stats = (
        per_doc.crossJoin(F.broadcast(nd))
        .groupBy("word", "n_docs")
        .agg(
            F.sum(c).alias("total"),
            F.count(F.lit(1)).alias("docs_with"),
            F.sum(c * c).alias("scc"),
        )
    )
    mean_c = F.col("total") * 1.0 / n
    # try_divide: a single-document corpus (n==1) leaves the cross-doc
    # variance undefined -> NULL, matching DuckDB (r7 edge sweep)
    var_c = F.try_divide(
        F.col("scc") - F.col("total") * F.col("total") * 1.0 / n, n - 1
    )
    return (
        stats.select(
            "word",
            F.col("total").cast("bigint").alias("total"),
            F.col("docs_with").cast("bigint").alias("docs_with"),
            F.round(var_c / mean_c, 4).alias("dispersion"),
        )
        .orderBy(F.desc("total"), "word")
        .limit(30)
        .orderBy(F.desc("total"), "word")
    )


# ---------------------------------------------------------------------------
# ml_calibration_brier
# ---------------------------------------------------------------------------


@register(
    "ml_calibration_brier",
    oracle="""
    WITH scored AS (
      SELECT LEAST(GREATEST(value / 200.0, 0.0), 1.0) AS p,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin, p, y
      FROM scored
    ),
    b AS (
      SELECT bin, COUNT(*) AS nk, AVG(p) AS pk, AVG(y) AS yk
      FROM binned GROUP BY bin
    ),
    b2 AS (
      SELECT bin, nk, pk, yk,
             SUM(nk) OVER () AS n,
             SUM(nk * yk) OVER () / SUM(nk) OVER () AS ybar
      FROM b
    ),
    tot AS (
      SELECT MAX(n) AS n, MAX(ybar) AS ybar,
             SUM(nk * (pk - yk) * (pk - yk)) AS rel_num,
             SUM(nk * (yk - ybar) * (yk - ybar)) AS res_num
      FROM b2 GROUP BY ()
    ),
    bs AS (SELECT AVG((p - y) * (p - y)) AS brier FROM scored)
    SELECT CAST(tot.n AS BIGINT) AS n,
           ROUND(bs.brier, 4) AS brier,
           ROUND(tot.rel_num / tot.n, 4) AS reliability,
           ROUND(tot.res_num / tot.n, 4) AS resolution,
           ROUND(tot.ybar * (1 - tot.ybar), 4) AS uncertainty
    FROM tot CROSS JOIN bs
    """,
)
def ml_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with Murphy's decomposition: for the p = value/200
    purchase 'forecast', BS = E(p−y)² splits (within-bin) into
    reliability (calibration error — how far bin forecasts sit from
    bin outcomes, smaller better), resolution (how much the bins
    separate outcomes, larger better) and uncertainty ȳ(1−ȳ) — the
    decomposition that says WHY a Brier score is bad, where
    `ml_eval_calibration`'s curve only shows it. (Exact identity
    BS = REL − RES + UNC holds for bin-conditional forecasts; with
    continuous p inside bins the small residual is the within-bin
    variance — the suite checks the identity to that tolerance.)

    One pass computes the raw Brier; a sibling 10-bin aggregate
    computes the decomposition (bin table is 10 rows; its windows are
    bounded). Both engines share the binning (floor×10, top-capped)."""
    scored = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.least(F.greatest(F.col("value") / 200.0, F.lit(0.0)), F.lit(1.0)).alias(
                "p"
            ),
            (F.col("event_type") == "purchase").cast("double").alias("y"),
        )
        .localCheckpoint()  # brier pass + bin pass share one compute
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        "y",
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nk"),
        F.avg("p").alias("pk"),
        F.avg("y").alias("yk"),
    )
    wt = Window.partitionBy()
    b = b.withColumn("n", F.sum("nk").over(wt)).withColumn(
        "ybar", F.sum(F.col("nk") * F.col("yk")).over(wt) / F.col("n")
    )
    tot = b.agg(
        F.max("n").alias("n"),
        F.max("ybar").alias("ybar"),
        F.sum(
            F.col("nk") * (F.col("pk") - F.col("yk")) * (F.col("pk") - F.col("yk"))
        ).alias("rel_num"),
        F.sum(
            F.col("nk") * (F.col("yk") - F.col("ybar")) * (F.col("yk") - F.col("ybar"))
        ).alias("res_num"),
    )
    bs = scored.agg(
        F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias("brier")
    )
    return tot.crossJoin(F.broadcast(bs)).select(
        F.col("n").cast("bigint").alias("n"),
        F.round("brier", 4).alias("brier"),
        F.round(F.col("rel_num") / F.col("n"), 4).alias("reliability"),
        F.round(F.col("res_num") / F.col("n"), 4).alias("resolution"),
        F.round(F.col("ybar") * (1 - F.col("ybar")), 4).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# agg_log_histogram
# ---------------------------------------------------------------------------


@register(
    "agg_log_histogram",
    oracle="""
    WITH d AS (
      SELECT CAST(FLOOR(LOG10(o_totalprice)) AS INT) AS decade
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (SELECT decade, COUNT(*) AS n FROM d GROUP BY decade),
    t AS (
      SELECT decade, n, SUM(n) OVER () AS nn,
             SUM(n) OVER (ORDER BY decade) AS cum
      FROM c
    )
    SELECT CAST(decade AS INT) AS decade,
           CAST(POW(10, decade) AS BIGINT) AS bucket_lo,
           CAST(n AS BIGINT) AS n,
           CAST(10000 * n // nn AS BIGINT) AS share_bp,
           CAST(10000 * cum // nn AS BIGINT) AS cum_bp
    FROM t ORDER BY decade
    """,
)
def agg_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-magnitude histogram of order values: decade buckets
    (floor(log10 x)) with per-bucket and cumulative shares — the right
    bucketing for heavy-tailed columns (bytes, latencies, revenues),
    where the equi-width `agg_histogram` puts 99% of mass in bin 1 and
    the tail vanishes. The log-scale twin of `agg_hill_tail_index`'s
    parametric tail fit.

    Decade extraction is scan-local floor/log10 codegen; one ≤20-group
    aggregate; shares from windows over the bucket table (the
    no-second-scan rule); all-integer bp arithmetic."""
    d = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(F.floor(F.log10("o_totalprice")).cast("int").alias("decade"))
    )
    c = d.groupBy("decade").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy()
    wc = Window.orderBy("decade").rowsBetween(Window.unboundedPreceding, 0)
    t = c.withColumn("nn", F.sum("n").over(wt)).withColumn(
        "cum", F.sum("n").over(wc)
    )
    return t.select(
        F.col("decade").cast("int").alias("decade"),
        F.pow(F.lit(10), F.col("decade")).cast("bigint").alias("bucket_lo"),
        F.col("n").cast("bigint").alias("n"),
        F.expr("10000 * n DIV nn").cast("bigint").alias("share_bp"),
        F.expr("10000 * cum DIV nn").cast("bigint").alias("cum_bp"),
    ).orderBy("decade")
