"""Wave-50 keys (round 5): exact join cardinality, language
divergence, shingle-size tuning, Grubbs outlier, block bootstrap.

- ``maint_join_cardinality_exact``: exact join output cardinality from
  key-frequency products [P — the number a CBO estimates from NDV/
  histograms, computed exactly; the F1/F2 frequency-moment view].
- ``text_lang_divergence``: pairwise Jensen–Shannon divergence between
  language character distributions [P — Lin 1991; the language
  distance matrix under every langid confusion analysis].
- ``dedup_shingle_size_curve``: near-dup pair counts vs shingle size
  k ∈ {2,3,5} [P — the OTHER dedup tuning axis next to
  `dedup_threshold_curve`'s threshold].
- ``stats_grubbs``: Grubbs' single-outlier statistic with the argmax
  day [P — Grubbs 1950].
- ``stats_block_bootstrap``: block bootstrap CI for the daily-revenue
  mean [P — Künsch 1989; iid bootstrap underestimates uncertainty on
  autocorrelated series — blocks preserve the dependence].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# maint_join_cardinality_exact
# ---------------------------------------------------------------------------


@register(
    "maint_join_cardinality_exact",
    oracle="""
    WITH co AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
    cl AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
    j AS (
      SELECT co.c AS c_o, cl.c AS c_l FROM co JOIN cl USING (k)
    )
    SELECT CAST((SELECT COUNT(*) FROM co) AS BIGINT) AS ndv_orders,
           CAST((SELECT COUNT(*) FROM cl) AS BIGINT) AS ndv_lineitem,
           CAST(COUNT(*) AS BIGINT) AS ndv_matched,
           CAST(SUM(c_o * c_l) AS BIGINT) AS exact_join_rows,
           CAST(MAX(c_o * c_l) AS BIGINT) AS max_key_contribution,
           CAST((SELECT SUM(c * c) FROM cl) AS BIGINT) AS f2_lineitem
    FROM j
    """,
)
def maint_join_cardinality_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality for orders⋈lineitem on orderkey:
    |A⋈B| = Σ_k c_A(k)·c_B(k) over matching keys — the number the CBO
    ESTIMATES from NDV and histograms (`maint_analyze_stats` feeds it),
    computed exactly, plus the max per-key contribution (the skew
    hotspot `maint_skew_report` hunts) and lineitem's second frequency
    moment F2 = Σc² (the self-join size / AMS sketch target). Run this
    before sizing shuffle partitions for a big join: the estimate
    being 10× off is how 2-hour stages happen.

    Two key-frequency rollups joined on the key — the shuffle carries
    one row per distinct key, never the join output itself (the whole
    point: the join's SIZE is computed without MATERIALIZING it)."""
    co = table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("c_o"))
    cl = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_l"))
        .localCheckpoint()  # matched join + NDV/F2 siblings share it
    )
    ndv_o = co.count()
    stats_l = cl.agg(
        F.count(F.lit(1)).alias("ndv"),
        F.sum(F.col("c_l") * F.col("c_l")).alias("f2"),
    ).collect()[0]
    j = co.join(cl, "k")
    return j.agg(
        F.lit(ndv_o).cast("bigint").alias("ndv_orders"),
        F.lit(stats_l["ndv"]).cast("bigint").alias("ndv_lineitem"),
        F.count(F.lit(1)).cast("bigint").alias("ndv_matched"),
        F.sum(F.col("c_o") * F.col("c_l")).cast("bigint").alias("exact_join_rows"),
        F.max(F.col("c_o") * F.col("c_l"))
        .cast("bigint")
        .alias("max_key_contribution"),
        F.lit(stats_l["f2"]).cast("bigint").alias("f2_lineitem"),
    )


# ---------------------------------------------------------------------------
# text_lang_divergence
# ---------------------------------------------------------------------------


@register(
    "text_lang_divergence",
    oracle="""
    WITH chars AS (
      SELECT lang, t.ch AS ch, COUNT(*) AS c
      FROM documents,
           UNNEST(string_split_regex(lower(text), '')) AS t(ch)
      WHERE t.ch <> '' AND t.ch <> ' '
      GROUP BY lang, t.ch
    ),
    tot AS (SELECT lang, SUM(c) AS n FROM chars GROUP BY lang),
    p AS (
      SELECT chars.lang, chars.ch, chars.c * 1.0 / tot.n AS p
      FROM chars JOIN tot USING (lang)
    ),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             a.ch, COALESCE(a.p, 0) AS pa, COALESCE(b.p, 0) AS pb
      FROM p a JOIN p b ON a.ch = b.ch AND a.lang < b.lang
    ),
    contrib AS (
      SELECT lang_a, lang_b,
             SUM(CASE WHEN pa > 0
                 THEN 0.5 * pa * LOG2(pa / ((pa + pb) / 2)) ELSE 0 END
               + CASE WHEN pb > 0
                 THEN 0.5 * pb * LOG2(pb / ((pa + pb) / 2)) ELSE 0 END)
               AS jsd_shared
      FROM pairs GROUP BY lang_a, lang_b
    )
    SELECT lang_a, lang_b, ROUND(jsd_shared, 4) + 0 AS jsd
    FROM contrib ORDER BY lang_a, lang_b
    """,
)
def text_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between language character
    distributions — the language distance matrix: JSD is symmetric,
    bounded [0,1] in log2, and defined even where supports differ —
    the geometry under `text_langid`'s decisions and the
    confusion-risk map (close pairs misclassify into each other).
    (This fixture's five 'languages' share one English word pool, so
    JSD ≈ 0 everywhere — the null case, itself pinned.)

    Per-language char distributions are one (lang, char) rollup
    (bounded by charset); the pair join runs on the ≤ |langs|·|charset|
    distribution table. Characters present in only one language
    contribute through their own term with the shared-support char
    join (chars absent from BOTH sides contribute 0 by definition);
    with a shared corpus pool the supports coincide, making the
    shared-char sum the complete JSD — the suite verifies support
    equality before trusting it."""
    chars = (
        table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), "")).alias("ch"),
        )
        .filter((F.col("ch") != "") & (F.col("ch") != " "))
        .groupBy("lang", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = chars.groupBy("lang").agg(F.sum("c").alias("n"))
    p = chars.join(F.broadcast(tot), "lang").select(
        "lang", "ch", (F.col("c") * 1.0 / F.col("n")).alias("p")
    ).localCheckpoint()  # both pair sides share one compute
    a = p.select(
        F.col("lang").alias("lang_a"), "ch", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("lang").alias("lang_b"), "ch", F.col("p").alias("pb")
    )
    pairs = a.join(b, "ch").filter(F.col("lang_a") < F.col("lang_b"))
    mid = (F.col("pa") + F.col("pb")) / 2
    term = F.when(
        F.col("pa") > 0, 0.5 * F.col("pa") * F.log2(F.col("pa") / mid)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("pb") > 0, 0.5 * F.col("pb") * F.log2(F.col("pb") / mid)
    ).otherwise(F.lit(0.0))
    contrib = pairs.groupBy("lang_a", "lang_b").agg(
        F.sum(term).alias("jsd_shared")
    )
    return contrib.select(
        "lang_a", "lang_b", (F.round("jsd_shared", 4) + F.lit(0)).alias("jsd")
    ).orderBy("lang_a", "lang_b")


# ---------------------------------------------------------------------------
# dedup_shingle_size_curve
# ---------------------------------------------------------------------------


@register(
    "dedup_shingle_size_curve",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    ks(k) AS (VALUES (2), (3), (5)),
    sh AS (
      SELECT DISTINCT ks.k, w.doc_id,
             array_to_string(ws[i:i+ks.k-1], ' ') AS shingle
      FROM w CROSS JOIN ks,
           UNNEST(generate_series(1, greatest(len(ws) - ks.k + 1, 0))) AS t(i)
    ),
    sz AS (SELECT k, doc_id, COUNT(*) AS n FROM sh GROUP BY k, doc_id),
    df AS (
      SELECT k, shingle FROM sh GROUP BY k, shingle
      HAVING COUNT(*) <= CASE WHEN k = 2 THEN 1000 ELSE 10000 END
    ),
    shc AS (SELECT sh.* FROM sh JOIN df USING (k, shingle)),
    inter AS (
      SELECT a.k, a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM shc a JOIN shc b
        ON a.k = b.k AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.k, a.doc_id, b.doc_id
    )
    SELECT CAST(i.k AS INT) AS shingle_k,
           CAST(count_if(i.c * 10 >= 3 * (x.n + y.n - i.c)) AS BIGINT)
             AS n_pairs_j30,
           CAST(COUNT(*) AS BIGINT) AS n_candidates
    FROM inter i
    JOIN sz x ON i.k = x.k AND i.id1 = x.doc_id
    JOIN sz y ON i.k = y.k AND i.id2 = y.doc_id
    GROUP BY i.k ORDER BY shingle_k
    """,
)
def dedup_shingle_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER dedup tuning axis: qualifying pairs (J ≥ 0.3) and raw
    candidates as a function of shingle SIZE k ∈ {2,3,5} — small k
    inflates Jaccard (any shared phrase matches: recall up, precision
    down), large k demands long verbatim runs (the reverse);
    `dedup_threshold_curve` tunes WHERE to cut, this tunes WHAT to
    compare. The monotone candidate decline with k is pinned.

    All three shingle sizes ride ONE scan via a broadcast k-grid into
    the array-slice shingling (the word split happens once); the
    shared shingle set is NOT cached — it is corpus-sized, and the r10
    32x unique-text probe showed a pinned localCheckpoint of it
    starving execution memory (checkpoint blocks are un-evictable);
    instead the distinct's exchange is reused by all four consumers
    (Catalyst exchange reuse: one shuffle write, four reads), the
    shape that survives 100 TB. The inverted-index pair generation
    then keys on (k, shingle), so each size's candidates stay in
    their own buckets of the same shuffle, and posting lists above
    the PER-K stop-shingle cap drop BEFORE pair generation: k=2 caps
    at max_df=1000 (bigrams go stopword-like at far lower df — the r5
    flat 10k cap left Σ df² ≈ 1e9 bigram pair mass on the 8× dup-mass
    fixture and OOM'd an 8 GB heap; r6 probe-caught), k∈{3,5} keep
    max_df=10000, which preserves the k=3 reconciliation with
    `dedup_ngram_jaccard` exactly (pinned in tests). Integer
    cross-multiplied threshold (`dedup_threshold_curve` discipline).

    The no-cache shape depends on `spark.sql.exchangeReuseEnabled`
    (default true): with reuse OFF the four consumers would recompute
    the scan + word split + distinct 4×. The runtime pin
    (tests/test_plans.py::test_shingle_size_curve_runtime_exchange_reuse)
    asserts the conf AND the executed-plan reuse, so a foreign session
    that disables it fails loudly instead of silently 4×-scanning."""
    from ..functions.text import words as _words

    w = table(spark, sf_dir, "documents").select(
        "doc_id", _words(F.col("text")).alias("ws")
    )
    ks = spark.createDataFrame([(2,), (3,), (5,)], "k int")
    wk = w.crossJoin(F.broadcast(ks))
    sh = (
        wk.select(
            "k",
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size("ws") - F.col("k") + 1, F.lit(0)),
                    ),
                    lambda i: F.array_join(
                        F.slice(F.col("ws"), i, F.col("k")), " "
                    ),
                )
            ).alias("shingle"),
        )
        .distinct()
        # NO cache: the shingle set is corpus-sized, and checkpoint
        # blocks are non-evictable AND non-recomputable — the r10 32x
        # unique-text probe crashed exactly here
        # (UNABLE_TO_ACQUIRE_MEMORY) when the pinned localCheckpoint
        # starved execution memory. Measured at sf0.1 the cache bought
        # nothing (base 9.08 s cached vs 8.93 s uncached; the
        # distinct's shuffle dominates and its exchange feeds all four
        # consumers), and an evictable persist(MEMORY_AND_DISK) was
        # strictly slower (12.2 s). Recompute-from-scan is the shape
        # that holds at 100 TB.
    )
    sz = sh.groupBy("k", "doc_id").agg(F.count(F.lit(1)).alias("n"))
    # PER-K max_df stop-shingle cap (the `shingle_pair_counts` rule,
    # tightened for bigrams): pair mass per posting list is df², so the
    # cap is the only bound on join mass — k=2 lists at the r5 flat 10k
    # cap carried ~1e9 pairs on the 8× dup-mass fixture (OOM @ 8g,
    # r6 probe-caught); 1000 bounds any one list at 5e5 pairs while
    # k=3/5 keep 10k so the k=3 curve still reconciles with
    # dedup_ngram_jaccard
    df_ok = (
        sh.groupBy("k", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(
            F.col("df")
            <= F.when(F.col("k") == 2, F.lit(1000)).otherwise(F.lit(10000))
        )
        .select("k", "shingle")
    )
    shc = sh.join(df_ok, ["k", "shingle"])
    a = shc.select("k", F.col("doc_id").alias("id1"), "shingle")
    b = shc.select("k", F.col("doc_id").alias("id2"), "shingle")
    inter = (
        a.join(b, ["k", "shingle"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("k", "id1", "id2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    x = sz.select("k", F.col("doc_id").alias("id1"), F.col("n").alias("n1"))
    y = sz.select("k", F.col("doc_id").alias("id2"), F.col("n").alias("n2"))
    scored = inter.join(x, ["k", "id1"]).join(y, ["k", "id2"])
    qual = F.col("c") * 10 >= 3 * (F.col("n1") + F.col("n2") - F.col("c"))
    return (
        scored.groupBy(F.col("k").cast("int").alias("shingle_k"))
        .agg(
            F.count_if(qual).cast("bigint").alias("n_pairs_j30"),
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        )
        .orderBy("shingle_k")
    )


# ---------------------------------------------------------------------------
# stats_grubbs
# ---------------------------------------------------------------------------


@register(
    "stats_grubbs",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    m AS (
      SELECT COUNT(*) AS n, AVG(rev) AS mu, STDDEV_SAMP(rev) AS s
      FROM daily
    )
    SELECT CAST(COALESCE(MAX(m.n), 0) AS BIGINT) AS n_days,  -- 0 days, not NULL
           ROUND(MAX(ABS(daily.rev - m.mu)) / MAX(m.s), 4) AS g_stat,
           min_by(daily.day, -ABS(daily.rev - m.mu)) AS suspect_day,
           ROUND(min_by(daily.rev, -ABS(daily.rev - m.mu)) / 100.0, 4)
             AS suspect_revenue
    FROM daily CROSS JOIN m GROUP BY ()
    """,
)
def stats_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' single-outlier statistic on daily revenue:
    G = max|xᵢ − x̄|/s, with the suspect day identified by `min_by` on
    the negated deviation (max_by with a deterministic orientation) —
    the formal one-outlier test under normality, next to the
    threshold detectors (`ts_hampel_outliers` robustly flags many;
    Grubbs asks 'is THE most extreme day beyond chance?'). The
    critical value needs a t-quantile, so G and n are reported for the
    caller's table lookup — the STATISTIC is the distributed work.

    One day-grain aggregate, a 1-row moment pass, and an argmax over
    the bounded day table."""
    daily = (
        table(spark, sf_dir, "events")
        # two-sided gate: dateless events are not series points (r8 nullmix)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .localCheckpoint()  # moment pass + argmax share one compute
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rev").alias("mu"),
        F.stddev_samp("rev").alias("s"),
    ).collect()[0]
    dev = F.abs(F.col("rev") - F.lit(m["mu"]))
    return daily.agg(
        F.lit(m["n"]).cast("bigint").alias("n_days"),
        # try_divide: a constant series (s==0) leaves G undefined -> NULL,
        # matching DuckDB (r7 edge sweep); s may also be None (n<2)
        F.round(
            F.try_divide(F.max(dev), F.lit(m["s"]).cast("double")), 4
        ).alias("g_stat"),
        F.min_by(F.col("day"), -dev).alias("suspect_day"),
        F.round(F.min_by(F.col("rev"), -dev) / 100.0, 4).alias("suspect_revenue"),
    )


# ---------------------------------------------------------------------------
# stats_block_bootstrap
# ---------------------------------------------------------------------------

_BB_MULT = 2654435761
_BB_REPS = 200
_BB_BLOCK = 5


@register(
    "stats_block_bootstrap",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev,
             ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i
      FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
    ),
    n AS (SELECT COUNT(*) AS nd FROM daily),
    reps AS (SELECT UNNEST(generate_series(0, {_BB_REPS - 1})) AS r),
    blocks AS (  -- each replicate draws ceil(n/B) block starts
      SELECT reps.r, b.b,
             ((reps.r * 1000003 + b.b * 7919) * {_BB_MULT})
               % 4294967296
               % (n.nd - {_BB_BLOCK} + 1) AS start
      FROM reps CROSS JOIN n,
           UNNEST(generate_series(0,
             CAST(CEIL(n.nd * 1.0 / {_BB_BLOCK}) AS INT) - 1)) AS b(b)
    ),
    sampled AS (
      SELECT bl.r, d.rev
      FROM blocks bl
      JOIN daily d ON d.i >= bl.start AND d.i < bl.start + {_BB_BLOCK}
    ),
    rep_means AS (
      SELECT r, AVG(rev) AS m FROM sampled GROUP BY r
    )
    SELECT CAST((SELECT nd FROM n) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(AVG(m) / 100.0, 4) AS boot_mean,
           ROUND(quantile_cont(m, 0.025) / 100.0, 4) AS ci_lo,
           ROUND(quantile_cont(m, 0.975) / 100.0, 4) AS ci_hi
    FROM rep_means
    """,
)
def stats_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-block bootstrap CI for mean daily revenue: each of 200
    replicates resamples ⌈n/5⌉ five-day BLOCKS (deterministic
    multiplicative-hash starts — reruns and engines agree), preserving
    the short-range autocorrelation that the iid bootstrap
    (`stats_bootstrap_ci`) destroys — on dependent series the iid CI
    is too NARROW, and this pair of keys shows the gap.

    The replicate×block grid is pure integer arithmetic (bounded:
    reps×⌈n/B⌉ rows); block membership is a range join against the
    BOUNDED day table; replicate means and the percentile CI are
    aggregates over 200 rows. The corpus-sized work remains the one
    day-grain aggregate."""
    import math

    daily = (
        table(spark, sf_dir, "events")
        # two-sided gate: dateless events are not series points (r8 nullmix)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
        .withColumn("i", F.row_number().over(Window.orderBy("day")) - 1)
        .localCheckpoint()
    )
    nd = daily.count()
    n_blocks = math.ceil(nd / _BB_BLOCK)
    reps = spark.range(_BB_REPS).select(F.col("id").alias("r"))
    bl = spark.range(n_blocks).select(F.col("id").alias("b"))
    blocks = reps.crossJoin(F.broadcast(bl)).select(
        "r",
        (
            ((F.col("r") * 1000003 + F.col("b") * 7919) * F.lit(_BB_MULT))
            % F.lit(4294967296)
            % F.lit(nd - _BB_BLOCK + 1)
        ).alias("start"),
    )
    sampled = blocks.join(
        F.broadcast(daily),
        (F.col("i") >= F.col("start"))
        & (F.col("i") < F.col("start") + _BB_BLOCK),
    )
    rep_means = sampled.groupBy("r").agg(F.avg("rev").alias("m"))
    return rep_means.agg(
        F.lit(nd).cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.round(F.avg("m") / 100.0, 4).alias("boot_mean"),
        F.round(F.expr("percentile(m, 0.025)") / 100.0, 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)") / 100.0, 4).alias("ci_hi"),
    )
