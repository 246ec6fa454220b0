"""Wave-34 keys (round 5): Wilson intervals, frequency capping,
retrieval MRR, Benford screening, dedup threshold tuning.

- ``stats_binomial_ci_wilson``: Wilson score confidence intervals for
  daily conversion rates [P — Wilson 1927; the interval that behaves
  at small n and extreme p, unlike the Wald interval].
- ``events_frequency_capping``: per-user daily exposure capping report
  [P — standard ads/notification frequency analysis].
- ``ml_ranking_mrr``: mean reciprocal rank + hit@k of label-match
  retrieval over the embedding table [P — standard retrieval eval,
  complements `ml_eval_ndcg`].
- ``stats_benford_test``: first-significant-digit Benford χ² screen
  [P — Benford 1938; the classic bulk-data fraud/fabrication screen].
- ``dedup_threshold_curve``: near-dup pair/doc counts as a function of
  the Jaccard threshold — the tuning curve that decides where a
  production dedup sets its cut.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_binomial_ci_wilson
# ---------------------------------------------------------------------------

_Z = 1.96  # 95% normal quantile, fixed literal so both engines agree


@register(
    "stats_binomial_ci_wilson",
    oracle=f"""
    WITH d AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n,
             count_if(event_type = 'purchase') AS k
      FROM events GROUP BY 1
    )
    SELECT day, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS conversions,
           ROUND(k * 1.0 / n, 4) AS p_hat,
           ROUND((k * 1.0 / n + {_Z} * {_Z} / (2 * n)
                  - {_Z} * SQRT((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                + {_Z} * {_Z} / (4.0 * n * n)))
                 / (1 + {_Z} * {_Z} / n), 4) AS ci_lo,
           ROUND((k * 1.0 / n + {_Z} * {_Z} / (2 * n)
                  + {_Z} * SQRT((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                + {_Z} * {_Z} / (4.0 * n * n)))
                 / (1 + {_Z} * {_Z} / n), 4) AS ci_hi
    FROM d ORDER BY day
    """,
)
def stats_binomial_ci_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-conversion rate with a Wilson 95% score interval —
    the binomial CI that stays inside [0,1] and behaves at small n /
    extreme p where the naive Wald interval collapses; what a metrics
    dashboard should draw around every rate.

    One conditional-count daily aggregate; the interval is closed-form
    scan-local arithmetic on (k, n) — integer inputs, identical float
    expression both engines, z fixed at the 1.96 literal. At 100 TB
    the only shuffle carries one row per (day)."""
    d = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("event_type") == "purchase").alias("k"),
        )
    )
    n, k = F.col("n"), F.col("k")
    p = k * 1.0 / n
    z2 = F.lit(_Z * _Z)
    center = p + z2 / (2 * n)
    half = F.lit(_Z) * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    denom = 1 + z2 / n
    return d.select(
        "day",
        n.cast("bigint").alias("n"),
        k.cast("bigint").alias("conversions"),
        F.round(p, 4).alias("p_hat"),
        F.round((center - half) / denom, 4).alias("ci_lo"),
        F.round((center + half) / denom, 4).alias("ci_hi"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# events_frequency_capping
# ---------------------------------------------------------------------------


@register(
    "events_frequency_capping",
    oracle="""
    WITH exp AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
             COUNT(*) AS c
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_exposures,
           CAST(count_if(c > 5) AS BIGINT) AS n_users_over_cap,
           CAST(SUM(GREATEST(c - 5, 0)) AS BIGINT) AS n_capped_exposures,
           CAST(10000 * SUM(GREATEST(c - 5, 0)) // SUM(c) AS BIGINT)
             AS waste_bp
    FROM exp GROUP BY day ORDER BY day
    """,
)
def events_frequency_capping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capping report: per day, how many 'view' exposures a
    cap of 5 per user would have suppressed — users over cap, capped
    exposure count, and the waste share in basis points. The standard
    ads/notification-fatigue analysis that decides cap policy before
    enforcement moves to the serving layer.

    One (day, user) rollup then a day rollup — two bounded exchanges,
    all-integer arithmetic end to end (the waste share uses integer
    basis-point division, no float comparison anywhere)."""
    exp = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c = F.col("c")
    return (
        exp.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(c).cast("bigint").alias("n_exposures"),
            F.count_if(c > 5).cast("bigint").alias("n_users_over_cap"),
            F.sum(F.greatest(c - 5, F.lit(0))).cast("bigint").alias(
                "n_capped_exposures"
            ),
            F.expr("10000 * SUM(GREATEST(c - 5, 0)) DIV SUM(c)")
            .cast("bigint")
            .alias("waste_bp"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# ml_ranking_mrr
# ---------------------------------------------------------------------------


@register(
    "ml_ranking_mrr",
    oracle="""
    WITH ranked AS (
      SELECT q.vec_id AS query_id,
             (c.label = q.label) AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_cosine_similarity(
                          CAST(q.embedding AS DOUBLE[]),
                          CAST(c.embedding AS DOUBLE[])), 4) DESC,
                        c.vec_id) AS rnk
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ),
    firsts AS (
      SELECT query_id,
             MIN(CASE WHEN rel THEN rnk END) AS first_rel
      FROM ranked GROUP BY query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(AVG(CASE WHEN first_rel IS NULL THEN 0.0
                     ELSE 1.0 / first_rel END), 4) AS mrr,
           ROUND(AVG(CASE WHEN first_rel = 1 THEN 1.0 ELSE 0.0 END), 4)
             AS hit_at_1,
           ROUND(AVG(CASE WHEN first_rel <= 5 THEN 1.0 ELSE 0.0 END), 4)
             AS hit_at_5
    FROM firsts
    """,
)
def ml_ranking_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation by MRR and hit@k: for 20 query vectors,
    rank ALL other vectors by exact cosine (rounded + id tiebreak, the
    `ann_cosine_topk` ranking discipline), call a result relevant when
    it shares the query's cluster label, and report mean reciprocal
    rank of the first relevant hit plus hit@1 / hit@5 — the other half
    of the retrieval-eval story next to `ml_eval_ndcg` (graded gains)
    and `ann_recall_report` (index-vs-exact fidelity).

    The 20-query batch broadcasts onto the corpus scan (one pass, no
    corpus self-join); per-query ranking prunes nothing here because
    MRR needs the first relevant rank wherever it falls, but the
    reciprocal-rank extraction is a per-query MIN — one combinable
    aggregate after the window."""
    from .ann import as_double

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qemb"),
    )
    c = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("clabel"),
        F.col("emb").alias("cemb"),
    )
    dot = F.aggregate(
        F.zip_with("qemb", "cemb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("cand_id"))
    scored = pairs.select(
        "query_id",
        (F.col("clabel") == F.col("qlabel")).alias("rel"),
        F.round(dot / (norm(F.col("qemb")) * norm(F.col("cemb"))), 4).alias("cos"),
        "cand_id",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    firsts = ranked.groupBy("query_id").agg(
        F.min(F.when(F.col("rel"), F.col("rnk"))).alias("first_rel")
    )
    fr = F.col("first_rel")
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.round(
            F.avg(F.when(fr.isNull(), F.lit(0.0)).otherwise(1.0 / fr)), 4
        ).alias("mrr"),
        F.round(F.avg(F.when(fr == 1, 1.0).otherwise(0.0)), 4).alias("hit_at_1"),
        F.round(F.avg(F.when(fr <= 5, 1.0).otherwise(0.0)), 4).alias("hit_at_5"),
    )


# ---------------------------------------------------------------------------
# stats_benford_test
# ---------------------------------------------------------------------------


@register(
    "stats_benford_test",
    oracle="""
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice
                        / POW(10, FLOOR(LOG10(o_totalprice)))) AS INT)
               AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS nn FROM c)
    SELECT c.digit,
           CAST(c.n AS BIGINT) AS n,
           ROUND(c.n * 1.0 / t.nn, 4) AS observed_share,
           ROUND(LOG10(1 + 1.0 / c.digit), 4) AS benford_share,
           ROUND(POW(c.n * 1.0 / t.nn - LOG10(1 + 1.0 / c.digit), 2)
                 / LOG10(1 + 1.0 / c.digit) * t.nn, 4) AS chi2_term
    FROM c CROSS JOIN t ORDER BY c.digit
    """,
)
def stats_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screen over order values: the
    observed digit distribution vs Benford's log10(1+1/d) expectation,
    with per-digit χ² contributions (Σ over the 9 rows is the test
    statistic, 8 df) — the classic bulk-data fabrication/fraud screen;
    synthetic uniform-ish prices FAIL it loudly, which is itself the
    demonstration.

    First-digit extraction is scan-local codegen (floor/log10/pow —
    no string casts); one 9-group aggregate + a 1-row total broadcast.
    At 100 TB the shuffle carries 9 rows per partition."""
    d = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(10, F.floor(F.log10("o_totalprice")))
            )
            .cast("int")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # total via a window over the 9-row group table — a sibling
    # aggregate would re-scan and re-aggregate the whole input
    c = c.withColumn(
        "nn",
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    obs = F.col("n") * 1.0 / F.col("nn")
    ben = F.log10(1 + 1.0 / F.col("digit"))
    return (
        c.select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 4).alias("observed_share"),
            F.round(ben, 4).alias("benford_share"),
            F.round(F.pow(obs - ben, 2) / ben * F.col("nn"), 4).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# dedup_threshold_curve
# ---------------------------------------------------------------------------


@register(
    "dedup_threshold_curve",
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
    jac AS (
      SELECT id1, id2, c, x.n + y.n - c AS den
      FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE c * 10000 >= 3000 * (x.n + y.n - c)
    ),
    th(t_bp) AS (VALUES (3000), (5000), (7000), (9000))
    SELECT CAST(t_bp AS INT) AS t_bp,
           CAST(count_if(c * 10000 >= t_bp * den) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN c * 10000 >= t_bp * den
                                    THEN id2 END) AS BIGINT)
             AS n_docs_droppable
    FROM jac CROSS JOIN th GROUP BY t_bp ORDER BY t_bp
    """,
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold tuning curve: near-dup pair counts and droppable
    docs (keep-lowest-id rule: a doc is droppable when it is the
    HIGHER id of some qualifying pair) at Jaccard ∈ {0.30, 0.50, 0.70,
    0.90} — the sensitivity report that decides where a production
    dedup sets its cut before `dedup_pipeline_e2e` commits to one.

    Reuses the shared inverted-shingle-index pair core
    (`dedup_extra.shingle_pair_counts` — bucket-local pair generation,
    max_df cap, NO length-ratio prune here since the curve needs
    J ≥ 0.3 pairs exactly); the threshold sweep is then a 4-row grid
    over the SAME pair table (one pass, no re-scoring per threshold).
    Pair counts use integer basis-point comparison so no float decides
    a boundary."""
    from .dedup_extra import shingle_pair_counts

    pairs = shingle_pair_counts(spark, sf_dir, min_len_ratio=0.3)
    jac = pairs.select(
        "id2",
        (F.col("c") * 10000).alias("c_bp"),
        (F.col("n1") + F.col("n2") - F.col("c")).alias("den"),
    ).filter(F.col("c_bp") >= 3000 * F.col("den"))
    th = spark.createDataFrame([(3000,), (5000,), (7000,), (9000,)], "t_bp int")
    audited = jac.crossJoin(F.broadcast(th))
    qual = F.col("c_bp") >= F.col("t_bp") * F.col("den")
    return (
        audited.groupBy("t_bp")
        .agg(
            F.count_if(qual).cast("bigint").alias("n_pairs"),
            F.countDistinct(F.when(qual, F.col("id2")))
            .cast("bigint")
            .alias("n_docs_droppable"),
        )
        .orderBy("t_bp")
    )
