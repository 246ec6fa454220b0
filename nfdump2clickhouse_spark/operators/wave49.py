"""Wave-49 keys (round 5): dynamic partition overwrite, hapax ratio,
sign test, distance histogram, inter-rater agreement.

- ``sink_dynamic_partition_overwrite``: dynamic partition overwrite —
  replace ONLY the partitions present in the incoming batch [P — the
  Spark write mode behind every idempotent daily re-run].
- ``text_hapax_ratio``: hapax legomena share per language
  [P — classical vocabulary-richness measure next to `text_ttr_diversity`].
- ``stats_sign_test``: the sign test on paired per-user differences
  [P — the assumption-free floor of the paired-test ladder].
- ``emb_distance_histogram``: pairwise-distance histogram over a
  vector sample [P — the hubness/concentration diagnostic run before
  trusting distance thresholds in high dimensions].
- ``ml_cohens_kappa``: Cohen's κ agreement between two classifiers
  [P — Cohen 1960; chance-corrected agreement, the inter-rater /
  model-vs-model comparison].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# sink_dynamic_partition_overwrite
# ---------------------------------------------------------------------------


@register("sink_dynamic_partition_overwrite")  # rows-only: write-path demo
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the write mode behind idempotent
    daily re-runs: with `partitionOverwriteMode=dynamic`, an overwrite
    replaces ONLY the partitions present in the incoming batch and
    leaves every other partition untouched (STATIC mode — the default —
    would wipe the whole table first, the classic
    lost-my-history incident). Demo: write 5 event-type partitions,
    re-run a corrected 'purchase' batch, verify purchase changed and
    the other four are byte-identical in row counts and checksums.

    The mode is set per-write via the DataFrameWriter option (never
    session-wide — the driver's vanilla session must not be mutated);
    partition pruning serves the verification reads, so each check
    scans one directory."""
    import os
    import tempfile

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 5000)
        .select(
            "event_id",
            "event_type",
            F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .localCheckpoint()
    )
    if ev.isEmpty():
        # nothing to write: a zero-partition table cannot demonstrate the
        # mode, and reading it back cannot infer a schema (r7 edge sweep)
        return spark.createDataFrame(
            [],
            "event_type string, rows_before bigint, rows_after bigint,"
            " rows_intact boolean, sums_intact boolean",
        )
    out = os.path.join(tempfile.mkdtemp(prefix="sf_dpo_"), "tbl")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    # MATERIALIZE the before-state: a lazy frame would re-read the
    # table after the overwrite replaced its files (FAILED_READ_FILE)
    before = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n0"), F.sum("cents").alias("c0"))
        .localCheckpoint()
    )
    # the corrected batch: purchase rows with cents doubled
    corrected = ev.filter(F.col("event_type") == "purchase").withColumn(
        "cents", F.col("cents") * 2
    )
    (
        corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(out)
    )
    after = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n1"), F.sum("cents").alias("c1"))
    )
    return (
        before.join(after, "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce(F.col("n0"), F.lit(0)).cast("bigint").alias("rows_before"),
            F.coalesce(F.col("n1"), F.lit(0)).cast("bigint").alias("rows_after"),
            (F.col("n0").eqNullSafe(F.col("n1"))).alias("rows_intact"),
            (F.col("c0").eqNullSafe(F.col("c1"))).alias("sums_intact"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# text_hapax_ratio
# ---------------------------------------------------------------------------


@register(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
      SELECT lang, t.w AS word
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(w)
      WHERE t.w <> ''
    ),
    wc AS (SELECT lang, word, COUNT(*) AS c FROM tok GROUP BY lang, word)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(c) AS BIGINT) AS tokens,
           CAST(count_if(c = 1) AS BIGINT) AS hapax,
           CAST(count_if(c = 2) AS BIGINT) AS dis_legomena,
           CAST(10000 * count_if(c = 1) // COUNT(*) AS BIGINT)
             AS hapax_vocab_bp
    FROM wc GROUP BY lang ORDER BY lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena per language: words occurring exactly once (and
    dis legomena, exactly twice) as a share of vocabulary — the
    classical richness measure next to `text_ttr_diversity`, and the
    practical vocabulary-budget number: hapaxes are the long tail a
    tokenizer's vocab cutoff discards and a Good–Turing smoother
    needs. Natural text keeps hapax/vocab near 40–60%; a synthetic
    closed-vocabulary corpus (this fixture) sits near 0 — the contrast
    IS the diagnostic.

    One (lang, word) combinable count then a bounded per-lang rollup —
    the `text_zipf_slope` scan shape without the window."""
    tok = (
        table(spark, sf_dir, "documents")
        .select(
            "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    wc = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c")
    return (
        wc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(c).cast("bigint").alias("tokens"),
            F.count_if(c == 1).cast("bigint").alias("hapax"),
            F.count_if(c == 2).cast("bigint").alias("dis_legomena"),
            F.expr("10000 * count_if(c = 1) DIV count(1)")
            .cast("bigint")
            .alias("hapax_vocab_bp"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# stats_sign_test
# ---------------------------------------------------------------------------


@register(
    "stats_sign_test",
    oracle="""
    WITH pairs AS (
      SELECT user_id,
             AVG(CASE WHEN event_id % 2 = 0 THEN value END) AS x,
             AVG(CASE WHEN event_id % 2 = 1 THEN value END) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    d AS (
      SELECT ROUND(y - x, 6) AS d FROM pairs
      WHERE x IS NOT NULL AND y IS NOT NULL AND ROUND(y - x, 6) <> 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
           CAST(COALESCE(count_if(d > 0), 0) AS BIGINT) AS n_positive,
           CAST(COALESCE(count_if(d < 0), 0) AS BIGINT) AS n_negative,
           ROUND((count_if(d > 0) - COUNT(*) / 2.0)
                 / SQRT(COUNT(*) / 4.0), 4) + 0 AS z
    FROM d
    """,
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sign test on paired per-user period means: count positive vs
    negative differences, z = (k − n/2)/√(n/4) — the assumption-free
    floor of the paired-test ladder (sign test assumes NOTHING about
    the difference distribution; `stats_wilcoxon_signed_rank` adds
    symmetry for more power; a paired t adds normality for most).
    Run all three and watch where they diverge — that divergence IS
    the distributional diagnosis.

    One user rollup + a 1-row sign count; the same 1e-6 difference
    pre-rounding as Wilcoxon so zero-classification is engine-stable."""
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    pairs = ev.groupBy("user_id").agg(
        F.avg(F.when(F.col("event_id") % 2 == 0, F.col("value"))).alias("x"),
        F.avg(F.when(F.col("event_id") % 2 == 1, F.col("value"))).alias("y"),
    )
    d = (
        pairs.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .select(F.round(F.col("y") - F.col("x"), 6).alias("d"))
        .filter(F.col("d") != 0)
    )
    n = F.count(F.lit(1))
    k = F.count_if(F.col("d") > 0)
    return d.agg(
        n.cast("bigint").alias("n_pairs"),
        k.cast("bigint").alias("n_positive"),
        F.count_if(F.col("d") < 0).cast("bigint").alias("n_negative"),
        # try_divide: zero usable pairs leave z undefined -> NULL,
        # matching DuckDB's NULL-on-zero-divisor division (r7 edge sweep)
        (F.round(F.try_divide(k - n / 2.0, F.sqrt(n / 4.0)), 4) + F.lit(0)).alias(
            "z"
        ),
    )


# ---------------------------------------------------------------------------
# emb_distance_histogram
# ---------------------------------------------------------------------------


@register(
    "emb_distance_histogram",
    oracle="""
    WITH s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 100
    ),
    pairs AS (
      SELECT SQRT(list_sum(list_transform(
               generate_series(1, len(a.e)),
               i -> POW(a.e[i] - b.e[i], 2)))) AS d
      FROM s a JOIN s b ON a.vec_id < b.vec_id
    ),
    m AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax, AVG(d) AS dmean,
                 STDDEV_SAMP(d) AS dstd, COUNT(*) AS n
          FROM pairs),
    binned AS (
      SELECT CASE WHEN m.dmax = m.dmin THEN 0
                  ELSE LEAST(CAST(FLOOR((p.d - m.dmin)
                               / ((m.dmax - m.dmin) / 10)) AS INT), 9)
             END AS bin
      FROM pairs p CROSS JOIN m
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND((SELECT dmean FROM m), 4) AS mean_dist,
           ROUND((SELECT dstd / dmean FROM m), 4) AS rel_spread
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def emb_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-distance histogram over a 100-vector sample with the
    relative spread σ/μ — the distance-CONCENTRATION diagnostic: in
    high dimensions distances crowd toward one value (rel_spread → 0),
    and when they do, nearest-neighbor thresholds and `dedup_embedding_
    cosine` cutoffs stop meaning anything. The sanity check run BEFORE
    the ANN stack's thresholds are trusted; complements
    `emb_dimension_variance` (per-axis view) with the pairwise view.

    The 100-row sample self-joins broadcast (4 950 pairs); distances
    are row-local HOF folds; the 10-bin histogram and moments are
    arithmetic on the pair table. min/max binning is shared exactly by
    both engines (same floor/least clamp)."""
    s = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    a = s.select(F.col("vec_id").alias("ia"), F.col("e").alias("ea"))
    b = s.select(F.col("vec_id").alias("ib"), F.col("e").alias("eb"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = (
        F.broadcast(a)
        .join(b, F.col("ia") < F.col("ib"))
        .select(dist.alias("d"))
        .localCheckpoint()  # moments + binning share one compute
    )
    m = pairs.agg(
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.avg("d").alias("dmean"),
        F.stddev_samp("d").alias("dstd"),
    ).collect()[0]
    if m["dmin"] is None:
        # fewer than two sample vectors: no pairs, no histogram — empty
        # on both sides (r7 edge sweep: None arithmetic crashed here)
        return spark.createDataFrame(
            [], "bin int, n_pairs bigint, mean_dist double, rel_spread double"
        )
    width = (m["dmax"] - m["dmin"]) / 10
    if width == 0:
        # all pairwise distances identical (e.g. duplicate vectors):
        # one degenerate bin 0, mirrored by the oracle's dmax=dmin CASE.
        # (try_divide by 0 would NOT be NULL-parity here: Spark's least()
        # skips NULLs, so floor(NULL) would clamp to 9 — ADVICE r7 #1.)
        binned = pairs.select(F.lit(0).alias("bin"))
    else:
        binned = pairs.select(
            F.least(
                F.floor(
                    F.try_divide(F.col("d") - F.lit(m["dmin"]), F.lit(width))
                ).cast("int"),
                F.lit(9),
            ).alias("bin")
        )
    rel = (
        m["dstd"] / m["dmean"]
        if m["dstd"] is not None and m["dmean"]
        else None
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n_pairs",
            F.round(F.lit(m["dmean"]), 4).alias("mean_dist"),
            F.round(F.lit(rel).cast("double"), 4).alias("rel_spread"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# ml_cohens_kappa
# ---------------------------------------------------------------------------


@register(
    "ml_cohens_kappa",
    oracle="""
    WITH scored AS (
      SELECT (value >= 100) AS rater_a,
             (CAST(FLOOR(value / 50) AS BIGINT) % 2 = 0) AS rater_b
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT COUNT(*) AS n,
             count_if(rater_a AND rater_b) AS tt,
             count_if(rater_a AND NOT rater_b) AS tf,
             count_if(NOT rater_a AND rater_b) AS ft,
             count_if(NOT rater_a AND NOT rater_b) AS ff
      FROM scored
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((tt + ff) * 1.0 / n, 4) AS observed_agreement,
           ROUND(((tt + tf) * 1.0 * (tt + ft)
                  + (ft + ff) * 1.0 * (tf + ff)) / (n * 1.0 * n), 4)
             AS chance_agreement,
           ROUND(((tt + ff) * 1.0 / n
                  - ((tt + tf) * 1.0 * (tt + ft)
                     + (ft + ff) * 1.0 * (tf + ff)) / (n * 1.0 * n))
                 / (1 - ((tt + tf) * 1.0 * (tt + ft)
                         + (ft + ff) * 1.0 * (tf + ff)) / (n * 1.0 * n)),
                 4) + 0 AS kappa
    FROM c
    """,
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two deterministic binary raters (a threshold
    rule and a bucket-parity rule over event value): observed agreement
    corrected for the agreement two INDEPENDENT raters with these
    marginals would reach by chance — κ = (p_o − p_e)/(1 − p_e). Raw
    agreement flatters any pair of raters that both say 'no' most of
    the time; κ is the honest number for labeler QA and
    model-vs-model consistency (the agreement complement to
    `ml_eval_confusion_multi`'s truth-anchored view).

    One scan computes both rater verdicts in codegen; the 2×2 table is
    a 1-row conditional aggregate; κ assembles from integer cells with
    the identical expression both engines (`+ 0` for the κ≈0 case —
    these raters are engineered near-independent, so κ ≈ 0 is the
    expected, pinned outcome)."""
    scored = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("value") >= 100).alias("ra"),
            (F.floor(F.col("value") / 50).cast("bigint") % 2 == 0).alias("rb"),
        )
    )
    a, b = F.col("ra"), F.col("rb")
    c = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(a & b).alias("tt"),
        F.count_if(a & ~b).alias("tf"),
        F.count_if(~a & b).alias("ft"),
        F.count_if(~a & ~b).alias("ff"),
    )
    n = F.col("n")
    tt, tf, ft, ff = F.col("tt"), F.col("tf"), F.col("ft"), F.col("ff")
    # try_divide: zero ratings (n==0) or perfect chance agreement
    # (pe==1) leave the statistic undefined -> NULL, matching DuckDB's
    # NULL-on-zero-divisor division (r7 edge sweep)
    po = F.try_divide((tt + ff) * 1.0, n)
    pe = F.try_divide(
        (tt + tf) * 1.0 * (tt + ft) + (ft + ff) * 1.0 * (tf + ff), n * 1.0 * n
    )
    return c.select(
        n.cast("bigint").alias("n"),
        F.round(po, 4).alias("observed_agreement"),
        F.round(pe, 4).alias("chance_agreement"),
        (F.round(F.try_divide(po - pe, 1 - pe), 4) + F.lit(0)).alias("kappa"),
    )
