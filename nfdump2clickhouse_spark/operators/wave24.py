"""Wave-24 keys (round 5): mergeable quantile sketches, Bloom
contamination screen, experiment power analysis, feature hashing,
heavy-tail index.

- ``agg_quantile_sketch_merge``: approximate quantiles from MERGEABLE
  integer-exact log-bucket histograms — the quantile analog of the
  uniqState/uniqMerge pattern (`agg_hll_sliding_union`): per-month
  KB-sized sketches merge across any grouping without re-touching the
  corpus. [P — log-bucketed histograms are the textbook mergeable
  quantile sketch; cf. HdrHistogram / DDSketch's bucketing idea.]
- ``dedup_bloom_screen``: incremental contamination screen — a new doc
  batch tested against the HISTORICAL corpus's shingle set compressed
  into one inline Bloom bitmap; exact verification restores precision
  on candidates only. [P — Bloom 1970; the decontamination screen shape
  used by LLM data pipelines.]
- ``events_power_analysis``: experiment design report — minimum
  detectable effect at current traffic and required sample size for a
  2% lift — closing the experimentation loop (SRM -> CUPED -> Welch ->
  DiD -> bootstrap -> THIS, the "should we even run it" step).
- ``ml_feature_hashing``: the hashing trick for unbounded categorical
  features [P — Weinberger 2009] with the collision audit that decides
  the bucket count.
- ``stats_hill_tail_index``: Hill estimator of the power-law tail index
  from top-k order statistics [P — Hill 1975] — completes the
  distribution-shape family (`agg_gini_concentration`, `agg_lorenz_
  deciles`, `agg_hhi_concentration` measure concentration; this
  measures tail heaviness, the number that decides winsorization caps).
"""

from __future__ import annotations

from functools import reduce
from operator import and_

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# agg_quantile_sketch_merge
# ---------------------------------------------------------------------------

_SUB = 16  # sub-buckets per octave -> relative error <= 1/16


@register(
    "agg_quantile_sketch_merge",
    oracle=f"""
    WITH v AS (
      SELECT l_returnflag AS flag, month(l_shipdate) AS m,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    b AS (
      SELECT flag, m,
             (length(printf('%b', cents)) - 1) * {_SUB}
               + cents * {_SUB} // (1::BIGINT << (length(printf('%b', cents)) - 1))
               - {_SUB} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY 1, 2, 3
    ),
    merged AS (  -- merge the per-month sketches: plain integer adds
      SELECT flag, bucket, SUM(n) AS n FROM b GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, bucket, n,
             SUM(n) OVER (PARTITION BY flag ORDER BY bucket) AS cum,
             SUM(n) OVER (PARTITION BY flag) AS total,
             ((bucket % {_SUB} + {_SUB})
               * (1::BIGINT << (bucket // {_SUB}))) // {_SUB} AS rep_cents
      FROM merged
    )
    SELECT flag, CAST(MAX(total) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= (total + 1) // 2 THEN rep_cents END)
                AS BIGINT) AS p50_cents,
           CAST(MIN(CASE WHEN cum >= (9 * total + 9) // 10 THEN rep_cents END)
                AS BIGINT) AS p90_cents,
           CAST(MIN(CASE WHEN cum >= (99 * total + 99) // 100 THEN rep_cents END)
                AS BIGINT) AS p99_cents
    FROM c GROUP BY flag
    """,
)
def agg_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 from mergeable log-bucket histograms.
    Bucketing is INTEGER-EXACT (no float log at a floor boundary —
    the classic cross-engine hash-breaker): msb = bit-length(cents) - 1
    via base-2 string conv, sub-bucket = cents*16 >> msb in [16, 32),
    giving <= 1/16 relative error per bucket. Stage 1 builds per-
    (flag, ship-month) sketches — the KB-sized objects a 100 TB
    deployment STORES per partition; stage 2 merges them with plain
    integer adds and never re-touches the corpus (the uniqState/
    uniqMerge pattern, applied to quantiles — `agg_percentile_approx`
    is the one-shot form with no mergeable state). Quantile selection
    is the smallest bucket whose cumulative count reaches ceil(q*n)
    (exact integer ceil arithmetic), reported as the bucket's lower
    bound in cents."""
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.month("l_shipdate").alias("m"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    msb = F.length(F.conv(F.col("cents"), 10, 2)) - 1
    # sub-bucket r = cents*16 >> msb lies in [16, 32); encode bucket as
    # msb*16 + (r - 16) so bucket DIV 16 recovers msb and bucket % 16
    # recovers r - 16 (leaving r's offset in would shift the decoded
    # msb by one and double every reported bound)
    bucket = (
        msb * _SUB
        + F.expr(
            f"(cents * {_SUB}) DIV shiftleft(1L,"
            " cast(length(conv(cents, 10, 2)) - 1 as int))"
        )
        - _SUB
    ).alias("bucket")
    sketches = v.groupBy("flag", "m", bucket).agg(F.count(F.lit(1)).alias("n"))
    merged = sketches.groupBy("flag", "bucket").agg(F.sum("n").alias("n"))
    wcum = Window.partitionBy("flag").orderBy("bucket")
    wall = Window.partitionBy("flag")
    c = merged.select(
        "flag",
        "n",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("total"),
        F.expr(
            f"((bucket % {_SUB} + {_SUB})"
            f" * shiftleft(1L, cast(bucket DIV {_SUB} as int))) DIV {_SUB}"
        ).alias("rep_cents"),
    )
    def pick(num: int, den: int, name: str):
        thresh = F.expr(f"({num} * total + {num}) DIV {den}")
        return F.min(
            F.when(F.col("cum") >= thresh, F.col("rep_cents"))
        ).cast("bigint").alias(name)

    return c.groupBy("flag").agg(
        F.max("total").cast("bigint").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(total + 1) DIV 2"), F.col("rep_cents"))
        ).cast("bigint").alias("p50_cents"),
        pick(9, 10, "p90_cents"),
        pick(99, 100, "p99_cents"),
    )


# ---------------------------------------------------------------------------
# dedup_bloom_screen
# ---------------------------------------------------------------------------

_SCREEN_BITS = 1 << 21  # 2 Mbit = 32768 longs = 256 KB shipped once
_SCREEN_K = 5
_SHINGLE_W = 5


def _shingles(df: DataFrame) -> DataFrame:
    """Distinct word 5-gram shingles per doc (plain space split — the
    `text_containment` convention)."""
    return (
        df.select(
            "doc_id",
            "source",
            F.split("text", " ").alias("ws"),
        )
        .filter(F.size("ws") >= _SHINGLE_W)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {_SHINGLE_W - 1}),"
                    f" i -> array_join(slice(ws, i, {_SHINGLE_W}), ' '))"
                )
            ).alias("sh"),
        )
        .distinct()
    )


def _bloom_parts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(hist shingle set, pre-checkpoint flagged new batch) — split out
    so tests can pin the PRE-checkpoint screen plan (all-broadcast
    probes, no data-sized exchange), which the operator's checkpoint
    would otherwise hide (the `graph_label_propagation` pin pattern)."""
    d = table(spark, sf_dir, "documents")
    # both shingle sets feed >= 2 downstream jobs (bloom build + verify
    # join; screen + per-doc report) — checkpoint the explode+distinct
    # once instead of re-running it per job (the Lloyd-iteration lesson)
    hist = (
        _shingles(d.filter(F.col("doc_id") % 10 < 8))
        .select("sh").distinct().localCheckpoint(eager=False)
    )
    new = _shingles(d.filter(F.col("doc_id") % 10 >= 8)).localCheckpoint(
        eager=False
    )

    # build: aggregate the k probe positions into (word, bits) rows —
    # the filter STAYS a DataFrame end-to-end (no driver round-trip, no
    # 32768-element literal: PySpark lit(list) expands to one node per
    # element and melts analysis/codegen)
    pos = [
        F.expr(f"pmod(xxhash64({i}, sh), {_SCREEN_BITS})")
        for i in range(_SCREEN_K)
    ]
    words = (
        hist.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            F.shiftright(F.col("p").cast("int"), 6).alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .localCheckpoint(eager=False)  # probed 5x below; build once
    )

    # probe: one broadcast hash join per probe against the <=32768-row
    # bitmap table (scan-local; the new batch never shuffles)
    probed = new
    conds = []
    for i in range(_SCREEN_K):
        p = f"pmod(xxhash64({i}, sh), {_SCREEN_BITS})"
        probed = probed.withColumn(
            f"w{i}", F.expr(f"cast(shiftright(cast({p} as int), 6) as int)")
        ).withColumn(f"m{i}", F.expr(f"shiftleft(1L, cast(pmod({p}, 64) as int))"))
        probed = probed.join(
            F.broadcast(
                words.select(
                    F.col("w").alias(f"w{i}"), F.col("bits").alias(f"b{i}")
                )
            ),
            f"w{i}",
            "left",
        )
        conds.append(
            F.coalesce(F.col(f"b{i}"), F.lit(0)).bitwiseAND(F.col(f"m{i}")) != 0
        )
    flagged = probed.withColumn("bloom_hit", reduce(and_, conds)).select(
        "doc_id", "source", "sh", "bloom_hit"
    )
    return hist, flagged


@register("dedup_bloom_screen")  # rows-only: bloom-hit counts depend on
# xxhash64 (no DuckDB analog); the zero-false-negative + exact-count +
# FP-bound contracts are pinned in tests
def dedup_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental contamination screen: does a NEW batch of documents
    (doc_id%10 >= 8) share any word 5-gram with the HISTORICAL corpus
    (doc_id%10 < 8)? The historical shingle set is compressed into one
    2 Mbit Bloom bitmap (k=5 xxhash64 probes) aggregated executor-side
    into a <= 32768-row (word, bits) table — O(filter size) state
    regardless of corpus size, never collected to the driver — and each
    probe is a broadcast hash join against that KB-sized table, so the
    99% of new shingles that match nothing die scan-side without ever
    joining the historical table. Bloom admits no
    false negatives, so the exact semi-join verify on the surviving
    candidates restores precision — at 100 TB the verify join processes
    ~FP-rate of the batch instead of all of it (the `text_decontaminate`
    semantics at sketch cost; `join_bloom_prefilter` is the same trick
    for equi-joins). Per-source report: shingle volumes, bloom hits,
    exact hits (the false-positive gap is the measured FP rate), and
    docs flagged by exact containment."""
    hist, flagged = _bloom_parts(spark, sf_dir)
    # two consumers (per-doc report + exact verify) — checkpoint so the
    # 5-probe screen evaluates once, not once per branch
    flagged = flagged.localCheckpoint(eager=False)

    cand = flagged.filter("bloom_hit")
    exact = cand.join(hist, "sh", "left_semi").select(
        "doc_id", "source", F.lit(1).alias("exact_hit")
    )
    per_doc = (
        flagged.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count_if("bloom_hit").alias("n_bloom"),
        )
        .join(
            exact.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_exact")),
            "doc_id",
            "left",
        )
        .fillna(0, ["n_exact"])
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_bloom").alias("n_bloom_hits"),
            F.sum("n_exact").alias("n_exact_hits"),
            (F.sum("n_bloom") - F.sum("n_exact")).alias("n_false_pos"),
            F.count_if(F.col("n_exact") > 0).alias("docs_flagged"),
        )
    )


# ---------------------------------------------------------------------------
# events_power_analysis
# ---------------------------------------------------------------------------

_Z_SUM = 2.801585  # z_{alpha/2}=1.959964 (5% two-sided) + z_beta=0.841621 (80%)


@register(
    "events_power_analysis",
    oracle=f"""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS mean,
             var_samp(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND(mean, 4) AS mean,
           ROUND(v, 4) AS variance,
           CAST(FLOOR(10000 * {_Z_SUM} * sqrt(2 * v / n) / mean) AS BIGINT)
             AS mde_rel_e4,
           CAST(FLOOR(2 * v * {_Z_SUM} * {_Z_SUM}
                      / pow(0.02 * mean, 2)) AS BIGINT) + 1
             AS n_per_arm_2pct
    FROM m
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment design report per metric (event_type): the minimum
    detectable RELATIVE effect at current per-arm traffic n, and the
    per-arm sample size required to detect a 2% lift — both at the
    canonical alpha=0.05 two-sided / 80% power operating point
    (n = 2 sigma^2 (z_a + z_b)^2 / delta^2 [P — standard two-sample
    power formula]). This is the experimentation family's missing first
    step (`stats_chi2_srm` -> `events_cuped_adjust` -> `agg_welch_ttest`
    -> `events_did_estimator` judge a RUNNING experiment; this decides
    whether one is worth running). One grouped moment pass over the
    fact table — the whole report costs one aggregation; outputs follow
    the `agg_welch_ttest` discipline (round(.,4); integer releases
    floored, where ulp noise cannot flip a decision)."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("v"),
    )
    mde = 10000 * _Z_SUM * F.sqrt(2 * F.col("v") / F.col("n")) / F.col("mean")
    n_req = 2 * F.col("v") * _Z_SUM * _Z_SUM / F.pow(0.02 * F.col("mean"), 2)
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("mean", 4).alias("mean"),
        F.round("v", 4).alias("variance"),
        F.floor(mde).cast("bigint").alias("mde_rel_e4"),
        (F.floor(n_req).cast("bigint") + 1).alias("n_per_arm_2pct"),
    )


# ---------------------------------------------------------------------------
# ml_feature_hashing
# ---------------------------------------------------------------------------

_HASH_BUCKETS = 256


@register(
    "ml_feature_hashing",
    oracle=f"""
    WITH f AS (
      SELECT unnest(['t:' || event_type,
                     'u:' || CAST(user_id % 4096 AS VARCHAR)]) AS feat
      FROM events
    )
    SELECT CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT)
             % {_HASH_BUCKETS} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT feat) AS BIGINT) AS n_feats
    FROM f GROUP BY 1
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick [P — Weinberger 2009]: project an unbounded
    categorical feature space (event type + a 4096-ary user shard)
    into a FIXED 256-bucket index with a stateless hash — no vocabulary
    to build, ship, or version, which is why it is the default
    encoding for high-cardinality categoricals at 100 TB. The report
    is the collision audit that decides the bucket count: hits and
    DISTINCT features per bucket (load factor / collision mass).
    Hashing is scan-local md5 arithmetic (cross-engine-deterministic,
    the `stats_mann_whitney` split convention); the audit aggregation
    is bounded by the bucket count, and the distinct-feature count
    two-phases through a (bucket, feat) partial — the only data-sized
    shuffle."""
    e = table(spark, sf_dir, "events")
    feats = e.select(
        F.explode(
            F.array(
                F.concat(F.lit("t:"), F.col("event_type")),
                F.concat(F.lit("u:"), (F.col("user_id") % 4096).cast("string")),
            )
        ).alias("feat")
    )
    bucket = (
        F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("bigint")
        % _HASH_BUCKETS
    ).alias("bucket")
    return feats.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.count_distinct("feat").alias("n_feats"),
    )


# ---------------------------------------------------------------------------
# stats_hill_tail_index
# ---------------------------------------------------------------------------

_HILL_K = 200


@register(
    "stats_hill_tail_index",
    oracle=f"""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY FLOOR(l_extendedprice * 100) DESC,
                        l_orderkey * 10 + l_linenumber
             ) AS rn
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
    ),
    topk AS (SELECT * FROM v WHERE rn <= {_HILL_K + 1}),
    xk AS (
      SELECT flag, MAX(CASE WHEN rn = {_HILL_K + 1} THEN cents END) AS kth
      FROM topk GROUP BY flag
    )
    SELECT t.flag,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(MAX(x.kth) AS BIGINT) AS xk_cents,
           ROUND(COUNT(*) / SUM(ln(t.cents) - ln(x.kth)), 4) AS alpha
    FROM topk t JOIN xk x ON t.flag = x.flag
    WHERE t.rn <= {_HILL_K}
    GROUP BY t.flag
    """,
)
def stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index from the top-k order
    statistics [P — Hill 1975]: alpha = k / sum(ln(x_i) - ln(x_k)),
    i in top-k above the (k+1)-th value. Alpha prices tail heaviness —
    alpha <= 2 means infinite variance, the number that decides
    winsorization caps (`agg_winsorized_mean`) and whether mean-based
    metrics are usable at all. The per-group top-(k+1) rides a
    row_number window that Spark prunes to WindowGroupLimit
    (per-partition top-k before the group exchange — the corpus never
    globally sorts); the estimator itself is arithmetic on 3x201 rows.
    Logs are taken on INTEGER cents (no float-boundary bucketing);
    the one float sum spans 200 terms and is rounded at 4 (the
    `agg_welch_ttest` discipline).

    Degenerate parity (r9 edge batch, SURVEY §17.1): a NULL price is
    not a sample point and a NULL flag is not a group (two-sided IS
    NOT NULL, nullmix mode — the oracle's inner equi-join would drop
    the NULL-flag group that the engine's left join keeps); a group
    with ≤ k rows has no (k+1)-th order statistic, and the oracle's
    grouped MAX keeps that flag with a NULL x_k — mirrored by the LEFT
    join (identical to the inner join at real SFs, where every flag has
    ≥ k+1 rows); an all-tied tail zeroes the log sum, where DuckDB x/0
    is NULL — try_divide."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("uid"),
    )
    w = Window.partitionBy("flag").orderBy(F.desc("cents"), "uid")
    topk = v.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _HILL_K + 1
    )
    xk = topk.filter(F.col("rn") == _HILL_K + 1).select(
        "flag", F.col("cents").alias("kth")
    )
    return (
        topk.filter(F.col("rn") <= _HILL_K)
        .join(xk, "flag", "left")
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max("kth").cast("bigint").alias("xk_cents"),
            F.round(
                F.try_divide(
                    F.count(F.lit(1)),
                    F.sum(F.log(F.col("cents")) - F.log(F.col("kth"))),
                ),
                4,
            ).alias("alpha"),
        )
    )
