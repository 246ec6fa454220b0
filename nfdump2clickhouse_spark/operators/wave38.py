"""Wave-38 keys (round 5): two-predictor OLS, cohort retention matrix,
balanced downsampling, phonetic blocking, price elasticity.

- ``stats_ols_two_vars``: two-predictor OLS via closed-form normal
  equations [P — textbook multiple regression], assembled entirely
  from one pass of moments.
- ``events_cohort_retention_matrix``: the weekly cohort × week-offset
  retention triangle [P — the standard growth-analytics artifact].
- ``sample_balanced_downsample``: class-balanced downsampling with
  deterministic hash priorities [P — standard imbalanced-training
  prep].
- ``dedup_phonetic_blocking``: Soundex blocking for entity resolution
  [P — Russell 1918; the classic phonetic blocking key] over part
  names.
- ``agg_price_elasticity``: log-log demand elasticity per brand
  [P — standard econometric elasticity estimation].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_ols_two_vars
# ---------------------------------------------------------------------------


@register(
    "stats_ols_two_vars",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             SUM(l_quantity) AS sx1, SUM(l_discount) AS sx2,
             SUM(l_extendedprice) AS sy,
             SUM(l_quantity * l_quantity) AS sx1x1,
             SUM(l_discount * l_discount) AS sx2x2,
             SUM(l_quantity * l_discount) AS sx1x2,
             SUM(l_quantity * l_extendedprice) AS sx1y,
             SUM(l_discount * l_extendedprice) AS sx2y,
             SUM(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem
    ),
    c AS (
      SELECT n,
             sx1x1 - sx1 * sx1 / n AS s11,
             sx2x2 - sx2 * sx2 / n AS s22,
             sx1x2 - sx1 * sx2 / n AS s12,
             sx1y - sx1 * sy / n AS s1y,
             sx2y - sx2 * sy / n AS s2y,
             syy - sy * sy / n AS syy_c,
             sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my
      FROM m
    ),
    b AS (
      SELECT n, syy_c, mx1, mx2, my, s1y, s2y,
             (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
             (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(my - b1 * mx1 - b2 * mx2, 4) AS beta0,
           ROUND(b1, 4) AS beta_qty,
           ROUND(b2, 4) AS beta_discount,
           ROUND((b1 * s1y + b2 * s2y) / syy_c, 4) AS r2
    FROM b
    """,
)
def stats_ols_two_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor OLS — extended price regressed on quantity and
    discount — via the closed-form 2×2 normal equations: every term
    (centered moments, Cramer's-rule betas, R² = explained/total SS)
    assembles from ONE pass of map-side-combinable sums. The step up
    from `agg_linreg` (one predictor) that stops short of needing a
    matrix library; beyond ~3 predictors the Gram-partial + driver
    solve pattern (`emb_pca_project`) takes over.

    One 1-row moment aggregate over the corpus — no second pass, no
    collect of anything data-sized; both engines run the identical
    expansion-form float expression (the `stats_levene_test`
    discipline)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx1x1"),
        F.sum(x2 * x2).alias("sx2x2"),
        F.sum(x1 * x2).alias("sx1x2"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    c = m.select(
        n,
        (F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n).alias("s11"),
        (F.col("sx2x2") - F.col("sx2") * F.col("sx2") / n).alias("s22"),
        (F.col("sx1x2") - F.col("sx1") * F.col("sx2") / n).alias("s12"),
        (F.col("sx1y") - F.col("sx1") * F.col("sy") / n).alias("s1y"),
        (F.col("sx2y") - F.col("sx2") * F.col("sy") / n).alias("s2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("syy_c"),
        (F.col("sx1") / n).alias("mx1"),
        (F.col("sx2") / n).alias("mx2"),
        (F.col("sy") / n).alias("my"),
    )
    # try_divide: a singular normal matrix (constant predictors, n==1)
    # leaves the betas undefined -> NULL, matching DuckDB (r7 edge sweep)
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = F.try_divide(
        F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12"), det
    )
    b2 = F.try_divide(
        F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12"), det
    )
    b = c.select(
        "n", "syy_c", "mx1", "mx2", "my", "s1y", "s2y",
        b1.alias("b1"), b2.alias("b2"),
    )
    return b.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2"),
            4,
        ).alias("beta0"),
        F.round("b1", 4).alias("beta_qty"),
        F.round("b2", 4).alias("beta_discount"),
        F.round(
            F.try_divide(
                F.col("b1") * F.col("s1y") + F.col("b2") * F.col("s2y"),
                F.col("syy_c"),
            ),
            4,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# events_cohort_retention_matrix
# ---------------------------------------------------------------------------


@register(
    "events_cohort_retention_matrix",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk
      FROM events
    ),
    first_wk AS (
      SELECT user_id, MIN(wk) AS cohort FROM ud GROUP BY user_id
    ),
    cells AS (
      SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
             CAST(datediff('week', f.cohort, u.wk) AS INT) AS week_offset,
             COUNT(*) AS active_users
      FROM ud u JOIN first_wk f USING (user_id)
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_week, active_users AS cohort_size
      FROM cells WHERE week_offset = 0
    )
    SELECT c.cohort_week, c.week_offset,
           CAST(c.active_users AS BIGINT) AS active_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(10000 * c.active_users // s.cohort_size AS BIGINT)
             AS retention_bp
    FROM cells c JOIN sizes s USING (cohort_week)
    ORDER BY c.cohort_week, c.week_offset
    """,
)
def events_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly cohort retention triangle: users grouped by
    first-active week; each (cohort, week-offset) cell counts how many
    came back, with retention in integer basis points of the cohort
    size — the full matrix behind `events_retention`'s D1/D7 scalar
    and `events_cohort_ltv`'s revenue form.

    Two bounded aggregates over the checkpointed (user, week) distinct
    table (never events × events): first-week per user, then the
    (cohort, offset) cell rollup; the cohort size is the offset-0
    diagonal read back via a WINDOW over the cell table itself — a
    filtered-self-join formulation re-derives the whole cell pipeline
    twice (the Exchange budget pin caught exactly that)."""
    ud = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("wk"),
        )
        .distinct()
        .localCheckpoint()
    )
    first_wk = ud.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    cells = (
        ud.join(first_wk, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            ((F.datediff(F.col("wk"), F.col("cohort"))) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    wk_win = Window.partitionBy("cohort_week")
    cells = cells.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("week_offset") == 0, F.col("active_users"))
        ).over(wk_win),
    )
    return (
        cells
        .select(
            "cohort_week",
            "week_offset",
            F.col("active_users").cast("bigint").alias("active_users"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.expr("10000 * active_users DIV cohort_size")
            .cast("bigint")
            .alias("retention_bp"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# sample_balanced_downsample
# ---------------------------------------------------------------------------

_BAL_MULT = 2654435761


@register(
    "sample_balanced_downsample",
    oracle=f"""
    WITH r AS (
      SELECT event_type, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY (event_id * {_BAL_MULT}) % 4294967296, event_id
             ) AS rn
      FROM events
    ),
    kept AS (SELECT event_type, event_id FROM r WHERE rn <= 500)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM kept GROUP BY event_type ORDER BY event_type
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: keep (up to) 500 rows per event
    type, chosen by a deterministic multiplicative-hash priority — the
    standard imbalanced-training prep, reproducible across engines and
    reruns where `sampleBy` is seed/partition-dependent. The report
    hashes the kept ids so the exact membership (not just counts) is
    verified.

    The literal rank bound lets Catalyst rewrite the per-class filter
    into WindowGroupLimit (map-side partial top-500 per class — plan
    pinned), so no class's full row set ever sorts on one reducer;
    the priority is scan-local integer codegen."""
    r = (
        table(spark, sf_dir, "events")
        .select("event_type", "event_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    (F.col("event_id") * F.lit(_BAL_MULT)) % F.lit(4294967296),
                    "event_id",
                )
            ),
        )
    )
    kept = r.filter(F.col("rn") <= 500)
    return (
        kept.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("event_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dedup_phonetic_blocking
# ---------------------------------------------------------------------------


def soundex_py(word: str) -> str:
    """Reference Soundex (American, as implemented by Spark's
    `F.soundex`): first letter + 3 digits, adjacent duplicate codes
    collapsed, h/w transparent between same-coded consonants,
    vowels reset the run."""
    if not word:
        return ""
    word = word.upper()
    if not word[0].isalpha():
        return word
    codes = {
        **dict.fromkeys("BFPV", "1"),
        **dict.fromkeys("CGJKQSXZ", "2"),
        **dict.fromkeys("DT", "3"),
        "L": "4",
        **dict.fromkeys("MN", "5"),
        "R": "6",
    }
    out = word[0]
    prev = codes.get(word[0], "")
    for ch in word[1:]:
        if ch in "HW":
            continue  # transparent: does NOT reset the previous code
        code = codes.get(ch, "")
        if code and code != prev:
            out += code
            if len(out) == 4:
                break
        prev = code
    return (out + "000")[:4]


@register("dedup_phonetic_blocking")  # rows-only: DuckDB has no soundex
def dedup_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: Soundex codes over the
    part-name vocabulary put sound-alike tokens ('green'/'grain') in
    one block, and only WITHIN-block pairs proceed to expensive edit
    distance — the classic blocking step that turns O(N²) fuzzy
    matching into Σ O(block²) (the `dedup_fuzzy_levenshtein` canopy,
    with phonetics instead of length buckets). Reports the block-size
    distribution and the candidate-pair budget it implies.

    `F.soundex` is JVM codegen on the token table (one distinct +
    one block rollup); the suite pins Spark's soundex against the
    pure-python reference above on the full vocabulary, then pins the
    pair-budget arithmetic."""
    tok = (
        table(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    blocks = (
        tok.groupBy(F.soundex("w").alias("block"))
        .agg(F.count(F.lit(1)).alias("n_words"))
    )
    return blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.max("n_words").cast("bigint").alias("max_block"),
        F.round(F.avg("n_words"), 4).alias("mean_block"),
        F.sum(F.col("n_words") * (F.col("n_words") - 1) / 2)
        .cast("bigint")
        .alias("candidate_pairs"),
    )


# ---------------------------------------------------------------------------
# agg_price_elasticity
# ---------------------------------------------------------------------------


@register(
    "agg_price_elasticity",
    oracle="""
    WITH li AS (
      SELECT p.p_brand AS brand,
             LN(l.l_extendedprice / l.l_quantity) AS ln_price,
             LN(l.l_quantity) AS ln_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(ln_qty, ln_price), 4) AS elasticity,
           ROUND(regr_r2(ln_qty, ln_price), 4) AS fit_r2
    FROM li GROUP BY brand ORDER BY brand
    """,
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand elasticity per brand: regress ln(quantity) on
    ln(unit price) — the slope IS the price elasticity of demand (the
    %-quantity change per %-price change), the standard econometric
    read on transactional data. |ε| > 1 = elastic (price cuts grow
    revenue), |ε| < 1 = inelastic.

    The part dimension broadcasts onto lineitem; the regression is
    Spark's built-in `regr_slope`/`regr_r2` — combinable moment
    aggregates, one brand-keyed exchange for ~25 brands. (TPC-H
    prices are formulaic, so the measured elasticities are a fixture
    property — the key is the estimation plumbing.)"""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("ln_price"),
        F.log("l_quantity").alias("ln_qty"),
    )
    return (
        j.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.regr_slope("ln_qty", "ln_price"), 4).alias("elasticity"),
            F.round(F.regr_r2("ln_qty", "ln_price"), 4).alias("fit_r2"),
        )
        .orderBy("brand")
    )
