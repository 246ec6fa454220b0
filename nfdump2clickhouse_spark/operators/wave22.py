"""Wave-22 keys (round 5): flow stitching, URL dedup, rank stats,
perplexity filtering, DP release.

- ``flows_stitch_rotation``: merge long-lived flows split across 5-min
  rotation boundaries — the nfdump ``-a`` aggregation concept [P] the
  collector world relies on (a 40-min transfer appears as 8+ records).
- ``dedup_url_canonicalize``: canonical-URL dedup for web-crawl
  corpora (case-folded host, default-port strip, tracking-param drop,
  query-param sort) — the step BEFORE content dedup in every crawl
  pipeline [P — URL normalization per RFC 3986 §6].
- ``stats_mann_whitney``: Mann-Whitney U with tie correction — the
  rank-based nonparametric sibling of `agg_welch_ttest` (mean shift)
  and `stats_ks_test` (shape); completes the two-sample family.
- ``text_lm_perplexity_filter``: perplexity-threshold quality gate on
  the `text_ngram_lm` char-bigram model — the CCNet/Gopher-style LM
  filter [P — Wenzek 2020], as a per-source corpus report.
- ``privacy_dp_counts``: ε-differential-privacy noisy count release
  (Laplace mechanism) — the export step after the k-anonymity /
  l-diversity audits; noise is SEEDED-deterministic here so the oracle
  can replay it (production swaps the hash-uniform for a CSPRNG draw —
  determinism is for testability, exactly like the `sample_*` keys,
  and is disclosed, not hidden).

All five hash-oracled. Integer discipline throughout (SURVEY §5.3):
epoch seconds / cents / e4-scaled ints accumulate exactly; the only
floats are final short expressions evaluated identically in both
engines from the same integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

_MULT = 2654435761  # Knuth multiplicative hash (shared with sample_*/cuped)
_GAP_S = 300  # stitch gap: one rotation interval [P]


@register(
    "flows_stitch_rotation",
    oracle=f"""
    WITH s AS (
      SELECT user_id % 500                            AS k,
             event_id,
             -- FLOOR before cast: DuckDB's double->bigint cast ROUNDS
             -- sub-second fractions, Spark's unix_timestamp floors
             CAST(FLOOR(epoch(ts)) AS BIGINT)         AS t,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + CAST(FLOOR(value * 10) AS BIGINT) % 120 AS te,
             CAST(FLOOR(value * 1000) AS BIGINT)      AS byt
      FROM events WHERE value IS NOT NULL
    ),
    c1 AS (
      SELECT *, LAG(te) OVER (PARTITION BY k ORDER BY t, event_id) AS pte
      FROM s
    ),
    c2 AS (
      SELECT *, CASE WHEN pte IS NULL OR t - pte > {_GAP_S}
                     THEN 1 ELSE 0 END AS nf
      FROM c1
    ),
    c3 AS (
      SELECT *, SUM(nf) OVER (PARTITION BY k ORDER BY t, event_id)
                AS island
      FROM c2
    ),
    fl AS (
      SELECT k, island, COUNT(*) AS n_seg,
             CAST(SUM(byt) AS BIGINT) AS bytes,
             MAX(te) - MIN(t) AS dur_s
      FROM c3 GROUP BY k, island
    )
    SELECT n_seg,
           CAST(COUNT(*) AS BIGINT)    AS n_flows,
           CAST(SUM(bytes) AS BIGINT)  AS total_bytes,
           CAST(SUM(dur_s) AS BIGINT)  AS total_dur_s
    FROM fl GROUP BY n_seg
    """,
)
def flows_stitch_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stitch flow segments split across rotation files back into
    logical flows: same flow key, next segment starting within one
    rotation interval of the previous segment's end (gaps-and-islands
    on the per-key timeline), then report the stitched-length
    distribution. nfcapd cuts every long-lived flow at its 5-minute
    boundary [P — the nfdump `-a` re-aggregation exists precisely for
    this], so un-stitched per-flow analytics (durations, rates,
    beaconing periods) are systematically wrong.

    Scale shape: ONE hash exchange on the flow key feeds both the lag
    window and the island aggregation (same partitioning, no second
    shuffle); the island id is a running sum of integer flags — all
    arithmetic in epoch seconds and exact byte counts. The final
    distribution rollup is a bounded second agg. At 100 TB the flow
    key is (sa, da, sp, dp, pr) — same plan, wider key."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = F.unix_timestamp("ts").cast("bigint")
    s = e.select(
        (F.col("user_id") % 500).alias("k"),
        "event_id",
        t.alias("t"),
        (t + F.floor(F.col("value") * 10).cast("bigint") % 120).alias("te"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("byt"),
    )
    w = Window.partitionBy("k").orderBy("t", "event_id")
    c = s.withColumn("pte", F.lag("te").over(w)).withColumn(
        "nf",
        F.when(
            F.col("pte").isNull() | (F.col("t") - F.col("pte") > _GAP_S), 1
        ).otherwise(0),
    )
    fl = (
        c.withColumn("island", F.sum("nf").over(w))
        .groupBy("k", "island")
        .agg(
            F.count(F.lit(1)).alias("n_seg"),
            F.sum("byt").alias("bytes"),
            (F.max("te") - F.min("t")).alias("dur_s"),
        )
    )
    return fl.groupBy("n_seg").agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.sum("bytes").alias("total_bytes"),
        F.sum("dur_s").alias("total_dur_s"),
    )


@register(
    "dedup_url_canonicalize",
    oracle="""
    WITH raw AS (
      SELECT CASE user_id % 3
               WHEN 0 THEN 'CDN.Example.COM'
               WHEN 1 THEN 'cdn.example.com'
               ELSE 'WWW.Example.com:443' END          AS host,
             '/p/' || CAST(event_id % 20 AS VARCHAR)    AS path,
             CASE event_id % 4
               WHEN 0 THEN 'b=2&a=1'
               WHEN 1 THEN 'a=1&b=2'
               WHEN 2 THEN 'a=1&utm_source=x&b=2'
               ELSE 'utm_campaign=y&b=2&a=1' END        AS q
      FROM events
    ),
    canon AS (
      SELECT lower(split_part(host, ':', 1)) || path || '?' ||
             array_to_string(
               list_sort(list_filter(string_split(q, '&'),
                                     x -> NOT starts_with(x, 'utm_'))),
               '&')                                     AS canonical_url,
             host || path || '?' || q                   AS raw_url
      FROM raw
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT)                AS n_raw,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_variants
    FROM canon GROUP BY canonical_url
    """,
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL deduplication: case-fold the host, strip the port,
    drop ``utm_*`` tracking parameters, sort the remaining query
    parameters — so the four raw spellings of one resource collapse to
    one canonical key. This is the first dedup rung of every web-crawl
    corpus (fetch-list and index dedup BEFORE any content hashing);
    RFC 3986 §6 normalization plus the tracking-param convention.

    Entirely scan-local Column work (split/filter/array_sort HOFs in
    codegen — no UDF, no regex backtracking) followed by ONE group-by
    on the canonical key; at 100 TB the canonical key is what you
    partition the crawl store by, so the dedup shuffle IS the layout
    write. Fixture URLs are synthesized deterministically from events
    (same recipe discipline as `str_url_funcs`); the oracle re-derives
    them identically, so the hash check exercises the full
    canonicalization."""
    e = table(spark, sf_dir, "events")
    host = (
        F.when(F.col("user_id") % 3 == 0, F.lit("CDN.Example.COM"))
        .when(F.col("user_id") % 3 == 1, F.lit("cdn.example.com"))
        .otherwise(F.lit("WWW.Example.com:443"))
    )
    path = F.concat(F.lit("/p/"), (F.col("event_id") % 20).cast("string"))
    q = (
        F.when(F.col("event_id") % 4 == 0, F.lit("b=2&a=1"))
        .when(F.col("event_id") % 4 == 1, F.lit("a=1&b=2"))
        .when(F.col("event_id") % 4 == 2, F.lit("a=1&utm_source=x&b=2"))
        .otherwise(F.lit("utm_campaign=y&b=2&a=1"))
    )
    raw = e.select(host.alias("host"), path.alias("path"), q.alias("q"))
    canonical = F.concat(
        F.lower(F.expr("split_part(host, ':', 1)")),
        F.col("path"),
        F.lit("?"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split("q", "&"),
                    lambda x: ~x.startswith("utm_"),
                )
            ),
            "&",
        ),
    )
    return (
        raw.select(
            canonical.alias("canonical_url"),
            F.concat("host", "path", F.lit("?"), "q").alias("raw_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("raw_url").alias("n_variants"),
        )
    )


@register(
    "stats_mann_whitney",
    oracle="""
    WITH s AS (
      SELECT l_extendedprice AS v,
             CAST(('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                    AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS grp
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    dv AS (
      SELECT v,
             CAST(count_if(grp = 0) AS BIGINT) AS d0,
             CAST(count_if(grp = 1) AS BIGINT) AS d1
      FROM s GROUP BY v
    ),
    c AS (
      SELECT *,
             SUM(d0) OVER (ORDER BY v) AS c0,
             SUM(d1) OVER (ORDER BY v) AS c1
      FROM dv
    ),
    t AS (
      SELECT CAST(SUM(d0) AS BIGINT) AS n0,
             CAST(SUM(d1) AS BIGINT) AS n1
      FROM dv
    ),
    r AS (  -- 2x-scaled average rank per distinct value:
            -- R2 = 2*(count strictly below) + (tie size) + 1
      SELECT SUM(CAST(d0 AS HUGEINT)
                 * (2 * (c0 + c1 - d0 - d1) + (d0 + d1) + 1)) AS r0_2x_h,
             SUM(CAST(d0 + d1 AS HUGEINT) * (d0 + d1) * (d0 + d1)
                 - (d0 + d1))                                 AS tie_cubes_h
      FROM c
    ),
    u AS (
      SELECT t.n0, t.n1,
             r.r0_2x_h - CAST(t.n0 AS HUGEINT) * (t.n0 + 1) AS u0_h,
             r.tie_cubes_h
      FROM t, r
    )
    SELECT n0, n1,
           CAST(u0_h AS BIGINT)        AS u0_2x,
           CAST(tie_cubes_h AS BIGINT) AS tie_cubes,
           ROUND((CAST(u0_h AS DOUBLE)
                  - CAST(n0 AS DOUBLE) * n1)
                 / (2.0 * sqrt((CAST(n0 AS DOUBLE) * n1 / 12.0)
                    * ((n0 + n1 + 1)
                       - CAST(tie_cubes_h AS DOUBLE)
                         / (CAST(n0 + n1 AS DOUBLE)
                            * (n0 + n1 - 1.0))))), 4) AS z
    FROM u
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the two hash halves
    of the price distribution, with the tie-corrected normal
    approximation — the nonparametric two-sample test that sees shifts
    Welch's t misses under heavy tails, completing the family next to
    `agg_welch_ttest` and `stats_ks_test`. On an unbiased split, z ≈ 0
    IS the assertion.

    Exact distributed formulation (the `stats_ks_test` shape): ranks
    only change at distinct values, so aggregate to per-distinct-value
    group counts first (ONE data-sized shuffle), then take cumulative
    counts via the shared ``prefix_sums`` two-phase scan — no
    unpartitioned window. The 2x-scaled average rank
    ``2*below + ties + 1`` keeps every rank sum an exact integer (no
    .5 halves), so U and the tie term are pure integer results; the
    only float is the final one-row z expression, written identically
    in both engines.

    Degenerate-input parity (r9 edge batch, SURVEY §17.1): a NULL price
    is not a sample point (two-sided IS NOT NULL, the `stats_ks_test`
    convention — nullmix mode flips the cumulative ordering otherwise);
    the z divisions use try_divide (all-tied input zeroes the variance:
    DuckDB 0/0 is NULL, ANSI threw); and over an EMPTY sample the
    oracle's aggregate CTEs still cross-join to one all-NULL row — n0/
    n1 are MAX aggregates over the totals columns (r12), so zero rows
    make them NULL rather than 0 the same way."""
    li = table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    s = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_extendedprice").alias("v"),
        (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 2).alias(
            "grp"
        ),
    )
    dv = s.groupBy("v").agg(
        F.count_if(F.col("grp") == 0).alias("d0"),
        F.count_if(F.col("grp") == 1).alias("d1"),
    )
    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_prefix_sums

    # r12 (VERDICT r11 next-#4): the sampler `prefix_sums` ran FOUR
    # serial driver jobs; the in-plan binned scan is ONE executed job —
    # bin-id literals from the parquet-footer [min,max] of
    # l_extendedprice, offsets from a bounded nbins-row window +
    # broadcast join, n0/n1 riding the same broadcast as COLUMNS (the
    # empty-sample NULL literal falls out for free: MAX over zero rows
    # is exactly the oracle's all-NULL cross-join row)
    stats = parquet_column_stats(sf_dir, "lineitem", "l_extendedprice")
    lo = hi = None  # stats-less footer: in-plan broadcast bounds
    if stats is not None and stats[0] is not None and stats[1] is not None:
        lo, hi = stats[0], stats[1]
    p = binned_prefix_sums(
        dv, ["v"], ["d0", "d1"], lo, hi, totals=["d0", "d1"]
    )
    # decimal(38,0) accumulators: d0 * R2 products near N² overflow
    # nothing here, but the SUM over ~N distinct values approaches
    # n0*2N ~ 1e12 at sf0.1 — bigint-safe; decimal guards the 100×
    # case like stats_anova_f
    r = p.select(
        (
            F.col("d0").cast("decimal(38,0)")
            * (
                2 * (F.col("_ps_d0") + F.col("_ps_d1") - F.col("d0") - F.col("d1"))
                + (F.col("d0") + F.col("d1"))
                + 1
            )
        ).alias("rterm"),
        (
            (F.col("d0") + F.col("d1")).cast("decimal(38,0)")
            * (F.col("d0") + F.col("d1"))
            * (F.col("d0") + F.col("d1"))
            - (F.col("d0") + F.col("d1"))
        ).alias("tterm"),
        "_ps_tot_d0",
        "_ps_tot_d1",
    ).agg(
        F.sum("rterm").alias("r0_2x_d"),
        F.sum("tterm").alias("tie_cubes_d"),
        F.max("_ps_tot_d0").alias("n0c"),
        F.max("_ps_tot_d1").alias("n1c"),
    )
    # r10 (ADVICE r9 low, the hurst convention): the rank sums STAY in
    # decimal(38,0)/HUGEINT through the U subtraction — tie_cubes grows
    # as N³ with a dominant tie, so the old intermediate BIGINT cast
    # cliffed near N ≈ 2e6 on both engines; n0(n0+1) is now the exact
    # decimal COLUMN product (r12: n0/n1 are columns off the offsets
    # broadcast, not driver literals — same exact integers). Final
    # output casts remain BIGINT (documented representability bound,
    # the `stats_ks_test` contract).
    dec = "decimal(38,0)"
    n0d = F.col("n0c").cast(dec)
    nD = (F.col("n0c") + F.col("n1c")).cast("double")
    u0 = F.col("r0_2x_d") - n0d * (n0d + 1)
    # empty sample: the oracle's aggregate CTEs cross-join to ONE
    # all-NULL row; MAX over zero rows makes n0/n1 NULL the same way
    return r.select(
        F.col("n0c").cast("bigint").alias("n0"),
        F.col("n1c").cast("bigint").alias("n1"),
        u0.cast("bigint").alias("u0_2x"),
        F.col("tie_cubes_d").cast("bigint").alias("tie_cubes"),
        F.round(
            F.try_divide(
                u0.cast("double")
                - F.col("n0c").cast("double") * F.col("n1c"),
                2.0
                * F.sqrt(
                    (F.col("n0c").cast("double") * F.col("n1c") / 12.0)
                    * (
                        (nD + 1)
                        - F.try_divide(
                            F.col("tie_cubes_d").cast("double"),
                            nD * (nD - 1.0),
                        )
                    )
                ),
            ),
            4,
        ).alias("z"),
    )


_PPL_KEEP_LOGP = -6.2  # keep docs with mean char-bigram ln P above this


@register(
    "text_lm_perplexity_filter",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 2) AS b
      FROM documents,
           LATERAL (SELECT unnest(range(1, greatest(length(text), 1))) AS i) t
      WHERE length(text) >= 2
    ),
    model AS (
      SELECT b, ln(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER ()) AS logp
      FROM bg GROUP BY b
    ),
    score AS (
      SELECT bg.doc_id, ROUND(AVG(model.logp), 4) AS avg_logp
      FROM bg JOIN model ON bg.b = model.b
      GROUP BY bg.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(s.avg_logp >= {_PPL_KEEP_LOGP}) AS BIGINT)
             AS n_kept,
           CAST(count_if(s.avg_logp >= {_PPL_KEEP_LOGP}) * 10000
                // COUNT(*) AS BIGINT) AS kept_bp,
           CAST(SUM(CAST(FLOOR(exp(-s.avg_logp) * 10000) AS BIGINT))
                AS BIGINT) AS sum_ppl_e4
    FROM score s JOIN documents d ON s.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def text_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-threshold quality gate per corpus source: score every
    document with the corpus-trained char-bigram LM (the
    `text_ngram_lm` model), keep documents whose mean log-probability
    clears the threshold, and report per-source keep rates + total
    perplexity mass — the CCNet/Gopher-style LM filter [P — Wenzek
    2020] as the operational report a curation run actually consumes
    (which sources are garbage-heavy, what a threshold change costs).

    Determinism discipline: the per-doc score is rounded BEFORE the
    threshold compare and the perplexity transform (exp of a 4dp
    value), and per-source perplexity accumulates as floor-scaled e4
    INTEGERS — no float sum order anywhere cross-engine. Plan: the
    model table is charset²-bounded (AQE broadcasts the score join);
    one doc-keyed agg; one source-keyed rollup."""
    d = table(spark, sf_dir, "documents")
    dd = d.filter(F.length("text") >= 2)
    bg = dd.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.col("text").substr(i, F.lit(2)),
            )
        ).alias("b"),
    )
    w_all = Window.partitionBy()
    model = (
        bg.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("b", F.log(F.col("cnt") / F.sum("cnt").over(w_all)).alias("logp"))
    )
    score = (
        bg.join(model, "b")
        .groupBy("doc_id")
        .agg(F.round(F.avg("logp"), 4).alias("avg_logp"))
    )
    kept = F.count_if(F.col("avg_logp") >= _PPL_KEEP_LOGP)
    return (
        score.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            kept.alias("n_kept"),
            F.expr(
                f"CAST(count_if(avg_logp >= {_PPL_KEEP_LOGP}) * 10000"
                " DIV count(*) AS BIGINT)"
            ).alias("kept_bp"),
            F.sum(
                F.floor(F.exp(-F.col("avg_logp")) * 10000).cast("bigint")
            ).alias("sum_ppl_e4"),
        )
    )


@register(
    "privacy_dp_counts",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM events GROUP BY event_type
    ),
    u AS (  -- seeded uniform in (-0.5, 0.5): never exactly ±0.5, so
            -- the Laplace inverse-CDF below never hits ln(0)
      SELECT *,
             ((CAST(ascii(substr(event_type, 1, 1)) AS BIGINT) * 100
               + length(event_type)) * {_MULT}) % 4294967296 AS m
      FROM g
    )
    SELECT event_type, n_true,
           n_true * 10000
             + CAST(FLOOR(
                 -sign((m + 0.5) / 4294967296.0 - 0.5)
                 * ln(1.0 - 2.0 * abs((m + 0.5) / 4294967296.0 - 0.5))
                 * 10000) AS BIGINT)          AS noisy_e4,
           1.0                                AS epsilon
    FROM u
    """,
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private count release via the Laplace mechanism
    (ε=1, sensitivity 1 ⇒ scale b=1): per-category noisy counts, the
    export step a privacy review demands AFTER `privacy_k_anonymity` /
    `privacy_l_diversity` pass — audits bound re-identification of the
    rows you keep; DP bounds what the released AGGREGATES leak.

    The Laplace draw is inverse-CDF over a SEEDED hash-uniform
    (``u ∈ (−0.5, 0.5)``, ``noise = −b·sign(u)·ln(1−2|u|)``) so the
    oracle replays it exactly — the same determinism-for-testability
    trade every `sample_*` key makes, disclosed: a production release
    draws u from a CSPRNG (swap one expression) and publishes ONLY the
    noisy column. Plan: one partial+final count agg; the noise is
    row-local arithmetic on the tiny category table. e4-scaled integer
    output keeps the hash check exact."""
    e = table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    m = (
        (F.ascii(F.substring("event_type", 1, 1)).cast("bigint") * 100
         + F.length("event_type")) * _MULT
    ) % 4294967296
    u = (m + 0.5) / 4294967296.0 - 0.5
    noise = -F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))
    return g.select(
        "event_type",
        "n_true",
        (F.col("n_true") * 10000 + F.floor(noise * 10000).cast("bigint")).alias(
            "noisy_e4"
        ),
        F.lit(1.0).alias("epsilon"),
    )
