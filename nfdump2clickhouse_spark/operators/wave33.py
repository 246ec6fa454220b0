"""Wave-33 keys (round 5): paired nonparametric testing, link
prediction, rolling correlation, exporter dedup, compressibility
filtering.

- ``stats_wilcoxon_signed_rank``: Wilcoxon signed-rank test on paired
  per-user period means [P — Wilcoxon 1945] — the paired complement to
  the independent-samples Mann–Whitney already in §2.
- ``graph_adamic_adar``: Adamic–Adar link prediction over the flow
  endpoint graph [P — Adamic & Adar 2003]: score non-adjacent pairs by
  Σ 1/ln(deg) over common neighbors.
- ``ts_rolling_corr``: trailing-window correlation between two daily
  series [P — standard co-movement diagnostic].
- ``flows_exporter_dedup``: duplicate-flow removal when overlapping
  exporters report the same traffic (the nfdump multi-router double-
  counting problem [P]).
- ``text_compression_ratio``: zlib-compressibility quality filter
  [P — compression-ratio repetition filtering, standard in pre-training
  curation (e.g. Gopher-class pipelines use compressibility signals)].
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_wilcoxon_signed_rank
# ---------------------------------------------------------------------------


@register(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH pairs AS (
      SELECT user_id,
             AVG(CASE WHEN event_id % 2 = 0 THEN value END) AS x,
             AVG(CASE WHEN event_id % 2 = 1 THEN value END) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    d AS (
      SELECT user_id, ROUND(y - x, 6) AS d
      FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
        AND ROUND(y - x, 6) <> 0
    ),
    r AS (
      SELECT d,
             RANK() OVER (ORDER BY ABS(d))
               + (COUNT(*) OVER (PARTITION BY ABS(d)) - 1) / 2.0 AS rnk
      FROM d
    ),
    agg AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN d > 0 THEN rnk ELSE 0 END) AS w_plus,
             SUM(CASE WHEN d < 0 THEN rnk ELSE 0 END) AS w_minus
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(w_plus, 4) AS w_plus,
           ROUND(w_minus, 4) AS w_minus,
           ROUND((w_plus - n * (n + 1) / 4.0)
                 / SQRT(n * (n + 1) * (2 * n + 1) / 24.0), 4) AS z
    FROM agg
    """,
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test: each user contributes a PAIRED
    observation (mean value over even event_ids vs over odd ones);
    non-zero differences are ranked by |d| with average-rank ties, and
    W⁺ = Σ ranks of positive differences with its large-sample normal
    z. The paired complement to `stats_mann_whitney` (independent
    samples) — 'did the same users shift?' rather than 'do two groups
    differ?'.

    Differences round to 1e-6 BEFORE ranking so a last-ulp divergence
    in the per-user means cannot reorder near-equal |d| between
    engines; the tie-peer count then handles the induced ties
    identically on both sides (the `stats_spearman_corr` discipline).
    Scale shape (VERDICT r5 wrong-#1: the draft ranked the whole pair
    table through one unpartitioned window): collapse to DISTINCT |d|
    values with per-sign counts — every member of a tie group shares
    the average rank cbefore + (cnt+1)/2, so W⁺/W⁻ are closed-form
    folds over the distinct-value table — and get the strictly-below
    cumulative count from
    ``functions.distributed.binned_prefix_sums`` (``exclusive=True``),
    the `ml_eval_auc` machinery (r12, VERDICT r11 next-#4: the sampler
    form ran FOUR serial driver jobs; the in-plan binned scan is ONE
    executed job — |d| is bounded by the parquet-footer
    [0, max(value)−min(value)] envelope, which only needs to be
    MONOTONE-correct, not tight, so footer bounds on the raw value
    column legally bound the derived per-user mean differences; n
    rides the offsets broadcast as a column, COALESCE(,0) keeping the
    committed n_pairs=0 empty semantics). The corpus-sized window is
    per-bin; the only unpartitioned window is the nbins-row offsets
    arm."""
    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_prefix_sums

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
    g = d.groupBy(F.abs(F.col("d")).alias("absd")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("d") > 0).cast("bigint")).alias("n_pos"),
        F.sum((F.col("d") < 0).cast("bigint")).alias("n_neg"),
    )
    stats = parquet_column_stats(sf_dir, "events", "value")
    lo = hi = None  # stats-less footer: in-plan broadcast bounds
    if stats is not None and stats[0] is not None and stats[1] is not None:
        lo, hi = 0.0, max(float(stats[1]) - float(stats[0]), 0.0)
    p = binned_prefix_sums(
        g, ["absd"], ["cnt"], lo, hi, exclusive=True, totals=["cnt"]
    )
    # average rank of every member of the |d| tie group (RANK() head
    # cbefore+1 plus (cnt−1)/2) — halves are exact in doubles, so the
    # fold is order-independent
    avg_rnk = F.col("_ps_cnt") + (F.col("cnt") + 1) / F.lit(2.0)
    agg = p.agg(
        F.sum(F.col("n_pos") * avg_rnk).alias("w_plus"),
        F.sum(F.col("n_neg") * avg_rnk).alias("w_minus"),
        F.coalesce(F.max("_ps_tot_cnt"), F.lit(0)).alias("nn"),
    )
    # exact bigint → decimal products in-plan, cast to double with ONE
    # rounding before each exact power-of-two / near-exact division —
    # the same values the old Python-literal fold produced (n(n+1) and
    # n(n+1)(2n+1) are exact in decimal(38,0); the double conversion
    # rounds once, /4.0 is exact, /24.0 matches the oracle's own
    # HUGEINT→DOUBLE path)
    dec = "decimal(38,0)"
    nd = F.col("nn").cast(dec)
    mu = (nd * (nd + 1)).cast("double") / 4.0
    sig2 = (nd * (nd + 1) * (2 * nd + 1)).cast("double") / 24.0
    return agg.select(
        F.col("nn").cast("bigint").alias("n_pairs"),
        F.round("w_plus", 4).alias("w_plus"),
        F.round("w_minus", 4).alias("w_minus"),
        F.round((F.col("w_plus") - mu) / F.sqrt(sig2), 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# graph_adamic_adar
# ---------------------------------------------------------------------------


@register(
    "graph_adamic_adar",
    oracle="""
    WITH f AS (
      SELECT DISTINCT
             'h' || CAST(user_id % 1000 AS VARCHAR) AS sa,
             'h' || CAST((user_id + event_id) % 1000 AS VARCHAR) AS da
      FROM events
      WHERE user_id % 1000 <> (user_id + event_id) % 1000
    ),
    edges AS (
      SELECT DISTINCT LEAST(sa, da) AS a, GREATEST(sa, da) AS b FROM f
    ),
    nbr AS (
      SELECT a AS node, b AS nb FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    deg AS (SELECT node, COUNT(*) AS dg FROM nbr GROUP BY node),
    cand AS (
      SELECT n1.node AS u, n2.node AS v, n1.nb AS z
      FROM nbr n1 JOIN nbr n2 ON n1.nb = n2.nb AND n1.node < n2.node
    ),
    scored AS (
      SELECT c.u, c.v,
             ROUND(SUM(1.0 / LN(d.dg)), 6) AS aa_score,
             COUNT(*) AS common_nbrs
      FROM cand c JOIN deg d ON c.z = d.node
      GROUP BY c.u, c.v
    ),
    nonedges AS (
      SELECT s.* FROM scored s
      LEFT JOIN edges e ON s.u = e.a AND s.v = e.b
      WHERE e.a IS NULL
    ),
    top AS (
      SELECT u, v, aa_score, common_nbrs,
             ROW_NUMBER() OVER (ORDER BY aa_score DESC, u, v) AS rn
      FROM nonedges
    )
    SELECT u, v, ROUND(aa_score, 4) AS aa_score,
           CAST(common_nbrs AS BIGINT) AS common_nbrs
    FROM top WHERE rn <= 20
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction on the flow endpoint graph (the
    `flows_biflow` node construction): for every NON-adjacent pair,
    score Σ 1/ln(deg(z)) over common neighbors z — rare shared
    neighbors say more than hubs — and report the top-20 predicted
    links. The 'which hosts will talk next' / 'which users are in the
    same cohort' primitive.

    Distributed shape (r6 rework, VERDICT r5 next-#8): the DATA-SIZED
    phase is the distinct-edge aggregation — a scan + distinct, fully
    distributed. The node space is FIXED at 1000 by construction, so
    the all-pairs scoring is a BOUNDED dense problem: AA = A·diag(w)·Aᵀ
    with w_z = 1/ln(deg z), common counts = A·Aᵀ — ONE numpy GEMM over
    a ≤1000×1000 adjacency inside a single Arrow batch (the r3 'pair
    work belongs in one GEMM per group' lesson), replacing the z-keyed
    self-join whose candidate mass hit Σ deg² ≈ 4e8 rows at the sf0.1
    dense-graph ceiling (14.9 s → ~2 s). Scores round half-up to 1e-6
    before the (score, u, v)-tiebroken top-20 inside the same batch so
    float fold order cannot flip the cutoff."""
    import pandas as pd

    e = table(spark, sf_dir, "events").select("user_id", "event_id")
    # 1000 nodes (vs the biflow demo's 50): at sf0.1 a 50-node graph
    # goes COMPLETE and link prediction has no non-edges left to rank
    f = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 1000).cast("string")).alias("sa"),
        F.concat(
            F.lit("h"),
            ((F.col("user_id") + F.col("event_id")) % 1000).cast("string"),
        ).alias("da"),
    ).filter(F.col("sa") != F.col("da"))
    edges = f.select(
        F.least("sa", "da").alias("a"), F.greatest("sa", "da").alias("b")
    ).distinct()

    def _aa(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out_cols = ["u", "v", "aa_score", "common_nbrs"]
        if pdf.empty:
            return pd.DataFrame(columns=out_cols)
        # index order == lexicographic node order == the oracle's
        # varchar collation, so u < v is exactly the upper triangle
        nodes = sorted(set(pdf.a) | set(pdf.b))
        idx = {s: i for i, s in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        ai = pdf.a.map(idx).to_numpy()
        bi = pdf.b.map(idx).to_numpy()
        A[ai, bi] = 1.0
        A[bi, ai] = 1.0
        deg = A.sum(axis=1)
        w = np.zeros(n)
        m = deg >= 2  # deg-1 nodes never sit between a pair (and ln(1)=0)
        w[m] = 1.0 / np.log(deg[m])
        aa = (A * w) @ A.T
        common = A @ A.T
        iu, iv = np.triu_indices(n, k=1)
        keep = (A[iu, iv] == 0.0) & (common[iu, iv] > 0)  # non-edges w/ overlap
        uu, vv, cn = iu[keep], iv[keep], common[iu, iv][keep]
        # half-up at 1e-6 (positive values: matches Spark/DuckDB ROUND,
        # where numpy's half-even would diverge), THEN rank
        aa6 = np.floor(aa[iu, iv][keep] * 1e6 + 0.5) / 1e6
        order = np.lexsort((vv, uu, -aa6))[:20]
        return pd.DataFrame(
            {
                "u": [nodes[i] for i in uu[order]],
                "v": [nodes[i] for i in vv[order]],
                "aa_score": np.floor(aa6[order] * 1e4 + 0.5) / 1e4,
                "common_nbrs": cn[order].astype("int64"),
            }
        )

    return (
        edges.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_aa, "u string, v string, aa_score double, common_nbrs bigint")
    )


# ---------------------------------------------------------------------------
# ts_rolling_corr
# ---------------------------------------------------------------------------


@register(
    "ts_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             count_if(event_type = 'click') AS clicks,
             count_if(event_type = 'purchase') AS purchases
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT day,
             COUNT(*) OVER win AS n_days,
             SUM(clicks) OVER win AS sx,
             SUM(purchases) OVER win AS sy,
             SUM(clicks * purchases) OVER win AS sxy,
             SUM(clicks * clicks) OVER win AS sxx,
             SUM(purchases * purchases) OVER win AS syy
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(n_days AS BIGINT) AS n_days,
           ROUND((n_days * sxy - sx * sy)
                 / NULLIF(sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                               * (n_days * syy - sy * sy)), 0), 4) + 0
             AS rolling_corr
    FROM w WHERE n_days = 7 ORDER BY day
    """,
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day correlation between the daily click and purchase
    series — the co-movement diagnostic behind 'did these two metrics
    decouple this week?' alerting; windows shorter than 7 days are
    suppressed (corr over 2-3 points is noise).

    The daily pivot is ONE conditional-count aggregate (no pivot
    shuffle); the correlation runs as window SUMs of the integer moment
    products over a 7-row frame on the days table — bounded (one row
    per day), so the unpartitioned frame is fine at any corpus size.
    Moments are computed explicitly (not via the built-in `corr`):
    ANSI-mode corr raises DIVIDE_BY_ZERO on a zero-variance window
    where DuckDB yields NULL, and exact int64 moment sums + one
    try_divide give the IDENTICAL double on both engines with NULL on
    the degenerate window (EDGE_SWEEP_r10 class B). NULL timestamps
    have no day — gated two-sided (NULL-day trailing windows would
    otherwise pick up Spark-NULLS-FIRST vs DuckDB-NULLS-LAST frame
    contents). `+ 0` canonicalizes the −0.0 a flat week can round to."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count_if(F.col("event_type") == "click").alias("clicks"),
            F.count_if(F.col("event_type") == "purchase").alias("purchases"),
        )
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n_days"),
        F.sum("clicks").over(win).alias("sx"),
        F.sum("purchases").over(win).alias("sy"),
        F.sum(F.col("clicks") * F.col("purchases")).over(win).alias("sxy"),
        F.sum(F.col("clicks") * F.col("clicks")).over(win).alias("sxx"),
        F.sum(F.col("purchases") * F.col("purchases")).over(win).alias("syy"),
    )
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        w.filter(F.col("n_days") == 7)
        .select(
            "day",
            F.col("n_days").cast("bigint").alias("n_days"),
            (F.round(F.try_divide(num, den), 4) + F.lit(0)).alias("rolling_corr"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# flows_exporter_dedup
# ---------------------------------------------------------------------------


@register(
    "flows_exporter_dedup",
    oracle="""
    WITH base AS (
      SELECT '10.0.' || CAST(user_id % 50 AS VARCHAR) AS sa,
             '10.0.' || CAST((user_id + event_id) % 50 AS VARCHAR) AS da,
             CAST(FLOOR(epoch_us(ts) / 60000000) AS BIGINT) AS minute_b,
             CAST(FLOOR(value * 1000) AS BIGINT) AS ibyt,
             user_id
      FROM events WHERE value IS NOT NULL
    ),
    seen AS (  -- router r1 sees everything; r2 overlaps on user_id%3=0
      SELECT sa, da, minute_b, ibyt, 'r1' AS ra FROM base
      UNION ALL
      SELECT sa, da, minute_b, ibyt, 'r2' FROM base WHERE user_id % 3 = 0
    ),
    dedup AS (
      SELECT sa, da, minute_b, ibyt,
             COUNT(*) AS n_copies, MIN(ra) AS kept_ra
      FROM seen GROUP BY sa, da, minute_b, ibyt
    )
    SELECT CAST((SELECT COUNT(*) FROM seen) AS BIGINT) AS n_records,
           CAST(COUNT(*) AS BIGINT) AS n_unique_flows,
           CAST((SELECT COUNT(*) FROM seen) - COUNT(*) AS BIGINT)
             AS n_dup_records,
           CAST((SELECT SUM(ibyt) FROM seen) AS BIGINT) AS bytes_reported,
           CAST(SUM(ibyt) AS BIGINT) AS bytes_actual,
           -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
           CAST(COALESCE(count_if(n_copies > 1), 0) AS BIGINT) AS n_multi_exporter
    FROM dedup
    """,
)
def flows_exporter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-exporter flow dedup — the nfdump double-counting problem:
    when two routers on the traffic path both export the same flow,
    naive totals inflate. Records are keyed by the flow identity
    (endpoints, minute bucket, byte count); one record per key
    survives (deterministic MIN exporter), and the report quantifies
    the inflation: reported vs actual bytes, duplicate record count,
    multi-exporter flow count. Demo topology: r1 sees all traffic, r2
    overlaps on a third of users (the partial-overlap case that makes
    naive SUM wrong but per-exporter SUM also wrong).

    One hash aggregate on the flow key does the dedup — at 100 TB the
    shuffle carries one row per unique flow, and both exporters'
    copies meet in the same reducer (no self-join). The totals are
    1-row sibling aggregates."""
    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.concat(F.lit("10.0."), (F.col("user_id") % 50).cast("string")).alias(
                "sa"
            ),
            F.concat(
                F.lit("10.0."),
                ((F.col("user_id") + F.col("event_id")) % 50).cast("string"),
            ).alias("da"),
            F.floor(F.unix_micros("ts") / 60000000).cast("bigint").alias("minute_b"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt"),
            "user_id",
        )
    )
    seen = base.select(
        "sa", "da", "minute_b", "ibyt", F.lit("r1").alias("ra")
    ).unionAll(
        base.filter(F.col("user_id") % 3 == 0).select(
            "sa", "da", "minute_b", "ibyt", F.lit("r2").alias("ra")
        )
    )
    dedup = seen.groupBy("sa", "da", "minute_b", "ibyt").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("ra").alias("kept_ra")
    )
    totals = seen.agg(
        F.count(F.lit(1)).alias("n_records"), F.sum("ibyt").alias("bytes_reported")
    )
    report = dedup.agg(
        F.count(F.lit(1)).alias("n_unique_flows"),
        F.sum("ibyt").alias("bytes_actual"),
        F.count_if(F.col("n_copies") > 1).alias("n_multi_exporter"),
    )
    return totals.crossJoin(F.broadcast(report)).select(
        F.col("n_records").cast("bigint").alias("n_records"),
        F.col("n_unique_flows").cast("bigint").alias("n_unique_flows"),
        (F.col("n_records") - F.col("n_unique_flows"))
        .cast("bigint")
        .alias("n_dup_records"),
        F.col("bytes_reported").cast("bigint").alias("bytes_reported"),
        F.col("bytes_actual").cast("bigint").alias("bytes_actual"),
        F.col("n_multi_exporter").cast("bigint").alias("n_multi_exporter"),
    )


# ---------------------------------------------------------------------------
# text_compression_ratio
# ---------------------------------------------------------------------------


@register("text_compression_ratio")  # rows-only: zlib is not in DuckDB SQL
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality filter: zlib-compress every document
    (level 6, the pipeline default) and report per-source mean
    compression ratio (raw/compressed bytes) plus the share of
    documents whose ratio exceeds 4.0 — highly compressible text is
    repetitive boilerplate/spam, one of the standard cheap curation
    signals alongside `text_repetition_filter` (n-gram form) and
    `text_char_entropy` (information form; compression ratio ≈
    8/bits-per-char, the empirical link pinned in the suite).

    One Arrow-batched pandas UDF (zlib is C-speed; the batch loop is
    per-document, not per-byte), zero shuffles before the per-source
    rollup. Deterministic: zlib level 6 output bytes are a pure
    function of input for a fixed zlib, and only LENGTHS are used."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def comp_ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            raw = t.encode("utf-8")
            comp = zlib.compress(raw, 6)
            out.append(len(raw) / max(len(comp), 1))
        return pd.Series(out)

    # NULL docs have no bytes to compress — gated before the UDF (None
    # crashes .encode(); EDGE_SWEEP_r10 class A)
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", "text")
    )
    scored = docs.select("source", comp_ratio("text").alias("ratio"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ratio"), 4).alias("mean_ratio"),
            F.round(F.min("ratio"), 4).alias("min_ratio"),
            F.round(F.max("ratio"), 4).alias("max_ratio"),
            F.round(F.avg((F.col("ratio") > 4.0).cast("double")), 4).alias(
                "share_repetitive"
            ),
        )
        .orderBy("source")
    )
