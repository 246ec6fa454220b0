"""Wave-32 keys (round 5): inequality decomposition, inter-arrival
profiles, multi-class confusion, t-closeness, whole-file text ingest.

- ``agg_theil_index``: Theil T inequality index with the exact
  between/within group decomposition [P — Theil 1967; the standard
  additive-decomposable inequality measure].
- ``events_interarrival_stats``: per-type inter-event gap profile
  (the burstiness signal behind rate limiting and bot detection).
- ``ml_eval_confusion_multi``: multi-class confusion-matrix metrics
  (per-class precision/recall/F1) for a train-split bucket-majority
  baseline [P — standard classification eval].
- ``privacy_t_closeness``: t-closeness audit [P — Li, Li &
  Venkatasubramanian 2007] — the third rung of the privacy ladder
  after `privacy_k_anonymity` and `privacy_l_diversity`, with the
  categorical EMD (total-variation distance) computed in EXACT integer
  arithmetic.
- ``scan_text_wholefile``: whole-file text ingestion
  (`spark.read.text(wholetext=True)`) with content checksums — the
  one-document-per-file corpus layout crawls actually arrive in.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# agg_theil_index
# ---------------------------------------------------------------------------


@register(
    "agg_theil_index",
    oracle="""
    WITH j AS (
      SELECT n.n_name AS grp, o.o_totalprice AS x
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    g AS (
      SELECT grp, COUNT(*) AS ng, SUM(x) AS sg,
             SUM(x * LN(x)) AS sxlx
      FROM j GROUP BY grp
    ),
    tot AS (
      SELECT SUM(ng) AS n, SUM(sg) AS s,
             SUM(sxlx) AS sxlx,
             SUM(sg * LN(sg / ng)) AS sglmu
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(sxlx / s - LN(s / n), 4) AS theil_total,
           ROUND(sglmu / s - LN(s / n), 4) AS theil_between,
           ROUND(sxlx / s - sglmu / s, 4) AS theil_within
    FROM tot
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of order-value inequality with its exact additive
    decomposition by customer nation: T = Σ(x/S)·ln(x/μ) splits into
    T_between = Σ(S_g/S)·ln(μ_g/μ) plus the income-weighted within-group
    terms — the property Gini lacks, and the reason Theil is the
    inequality measure used when 'how much of the skew is BETWEEN
    segments?' is the question (pairs with `agg_gini_concentration` /
    `agg_lorenz_deciles` / `agg_hhi_concentration`).

    Algebra is arranged so ONE pass of map-side-combinable per-group
    partials (n, Σx, Σx·ln x) suffices: T = Σx·lnx/S − ln μ and
    T_between = Σ S_g ln μ_g / S − ln μ need no second pass over rows.
    The nation dimension broadcasts; the group rollup is 25 rows."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("grp"), F.col("o_totalprice").alias("x"))
    )
    g = j.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x") * F.log("x")).alias("sxlx"),
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("sxlx").alias("sxlx"),
        F.sum(F.col("sg") * F.log(F.col("sg") / F.col("ng"))).alias("sglmu"),
    )
    s, nn = F.col("s"), F.col("n")
    return tot.select(
        nn.cast("bigint").alias("n"),
        F.round(F.col("sxlx") / s - F.log(s / nn), 4).alias("theil_total"),
        F.round(F.col("sglmu") / s - F.log(s / nn), 4).alias("theil_between"),
        F.round(F.col("sxlx") / s - F.col("sglmu") / s, 4).alias("theil_within"),
    )


# ---------------------------------------------------------------------------
# events_interarrival_stats
# ---------------------------------------------------------------------------


@register(
    "events_interarrival_stats",
    oracle="""
    WITH o AS (
      SELECT event_type, user_id, epoch_us(ts) AS t,
             LAG(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events
    ),
    gaps AS (
      SELECT event_type, t - prev AS gap_us FROM o WHERE prev IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_us) / 1e6, 4) AS mean_gap_s,
           ROUND(quantile_cont(gap_us, 0.5) / 1e6, 4) AS p50_gap_s,
           ROUND(quantile_cont(gap_us, 0.9) / 1e6, 4) AS p90_gap_s,
           ROUND(MIN(gap_us) / 1e6, 4) AS min_gap_s,
           ROUND(MAX(gap_us) / 1e6, 4) AS max_gap_s
    FROM gaps GROUP BY event_type ORDER BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type: per (type, user)
    stream ordered by (ts, event_id), the gap to the previous event,
    then the gap distribution (mean / exact p50 / p90 / min / max).
    Bursty arrivals (p50 ≪ mean) are the burstiness signal behind rate
    limiting, bot detection and capacity planning; pairs with
    `flows_beaconing_detection`, which looks for the OPPOSITE
    (machine-regular gaps).

    The lag window and the final aggregate both key on event_type (the
    window sub-partitions by user inside it), so the gap computation
    and the rollup share one data-sized hash exchange. Gaps are
    MICROSECOND integers (`unix_micros` / `epoch_us`) — the fixture
    timestamps carry sub-second precision, and second-truncating
    `unix_timestamp`/`epoch` would disagree between engines on every
    gap that crosses a second boundary."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id", "ts"
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    gaps = (
        ev.select("event_type", (t - F.lag(t).over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1e6, 4).alias("mean_gap_s"),
            F.round(F.expr("percentile(gap_us, 0.5)") / 1e6, 4).alias("p50_gap_s"),
            F.round(F.expr("percentile(gap_us, 0.9)") / 1e6, 4).alias("p90_gap_s"),
            F.round(F.min("gap_us") / 1e6, 4).alias("min_gap_s"),
            F.round(F.max("gap_us") / 1e6, 4).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ml_eval_confusion_multi
# ---------------------------------------------------------------------------


@register(
    "ml_eval_confusion_multi",
    oracle="""
    WITH train AS (
      SELECT CAST(FLOOR(value / 100) AS BIGINT) AS vb, event_type,
             COUNT(*) AS c
      FROM events WHERE value IS NOT NULL AND event_id % 2 = 0
      GROUP BY 1, 2
    ),
    model AS (
      SELECT vb, event_type AS pred FROM (
        SELECT vb, event_type,
               ROW_NUMBER() OVER (PARTITION BY vb
                                  ORDER BY c DESC, event_type) AS rn
        FROM train
      ) WHERE rn = 1
    ),
    fallback AS (
      SELECT event_type AS pred FROM (
        SELECT event_type, COUNT(*) AS c
        FROM events WHERE value IS NOT NULL AND event_id % 2 = 0
        GROUP BY 1 ORDER BY c DESC, event_type LIMIT 1
      )
    ),
    test AS (
      SELECT e.event_type AS actual,
             COALESCE(m.pred, (SELECT pred FROM fallback)) AS pred
      FROM events e
      LEFT JOIN model m ON CAST(FLOOR(e.value / 100) AS BIGINT) = m.vb
      WHERE e.value IS NOT NULL AND e.event_id % 2 = 1
    ),
    cls AS (SELECT DISTINCT actual AS cls FROM test),
    m AS (
      SELECT c.cls,
             (SELECT COUNT(*) FROM test WHERE actual = c.cls) AS n_actual,
             (SELECT COUNT(*) FROM test WHERE pred = c.cls) AS n_pred,
             (SELECT COUNT(*) FROM test
              WHERE actual = c.cls AND pred = c.cls) AS tp
      FROM cls c
    )
    SELECT cls,
           CAST(n_actual AS BIGINT) AS n_actual,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(tp AS BIGINT) AS tp,
           ROUND(CASE WHEN n_pred = 0 THEN 0 ELSE tp * 1.0 / n_pred END, 4)
             AS precision,
           ROUND(tp * 1.0 / n_actual, 4) AS recall,
           ROUND(CASE WHEN tp = 0 THEN 0
                 ELSE 2.0 * tp / (n_pred + n_actual) END, 4) AS f1
    FROM m ORDER BY cls
    """,
)
def ml_eval_confusion_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class confusion metrics for a bucket-majority baseline:
    train (even event_ids) learns the majority event_type per
    value-bucket (floor(value/100), deterministic count-desc/type-asc
    argmax); test (odd event_ids) scores per-class precision, recall
    and F1 = 2·tp/(n_pred+n_actual). The baseline is intentionally
    simple — this key is the confusion-matrix PLUMBING that scores any
    prediction column, completing the eval family (AUC / calibration /
    PR-threshold / regression / lift / this).

    The bucket model is a k-row broadcast (LEFT join — unseen buckets
    fall back to the global majority, no row drops); per-class tp /
    n_pred / n_actual assemble from ONE hash aggregate over a 2-row-
    per-prediction union (an actual-keyed and a pred-keyed tagged row)
    — no k-row full-outer SortMergeJoin, one class-keyed exchange."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
        .withColumn("vb", F.floor(F.col("value") / 100).cast("bigint"))
    )
    train = ev.filter(F.col("event_id") % 2 == 0)
    counts = train.groupBy("vb", "event_type").agg(F.count(F.lit(1)).alias("c"))
    wm = Window.partitionBy("vb").orderBy(F.desc("c"), "event_type")
    model = (
        counts.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("vb", F.col("event_type").alias("pred"))
    )
    fb_rows = (
        train.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "event_type")
        .limit(1)
        .collect()
    )
    # empty train split (degenerate input): no global majority exists;
    # predictions stay NULL and the empty test split yields an empty
    # result on both sides (r7 edge sweep — collect()[0] crashed here)
    fallback = fb_rows[0]["event_type"] if fb_rows else None
    test = (
        ev.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(model), "vb", "left")
        .select(
            F.col("event_type").alias("actual"),
            F.coalesce(F.col("pred"), F.lit(fallback)).alias("pred"),
        )
    )
    tagged = test.select(
        F.col("actual").alias("cls"),
        F.lit(1).alias("is_a"),
        (F.col("actual") == F.col("pred")).cast("long").alias("is_tp"),
        F.lit(0).alias("is_p"),
    ).unionAll(
        test.select(
            F.col("pred").alias("cls"),
            F.lit(0).alias("is_a"),
            F.lit(0).cast("long").alias("is_tp"),
            F.lit(1).alias("is_p"),
        )
    )
    m = (
        tagged.groupBy("cls")
        .agg(
            F.sum("is_a").alias("n_actual"),
            F.sum("is_p").alias("n_pred"),
            F.sum("is_tp").alias("tp"),
        )
        .filter(F.col("n_actual") > 0)  # oracle classes = actual classes
    )
    tp, np_, na = F.col("tp"), F.col("n_pred"), F.col("n_actual")
    return m.select(
        "cls",
        na.cast("bigint").alias("n_actual"),
        np_.cast("bigint").alias("n_pred"),
        tp.cast("bigint").alias("tp"),
        F.round(F.when(np_ == 0, F.lit(0.0)).otherwise(tp * 1.0 / np_), 4).alias(
            "precision"
        ),
        F.round(tp * 1.0 / na, 4).alias("recall"),
        F.round(
            F.when(tp == 0, F.lit(0.0)).otherwise(F.lit(2.0) * tp / (np_ + na)), 4
        ).alias("f1"),
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# privacy_t_closeness
# ---------------------------------------------------------------------------


@register(
    "privacy_t_closeness",
    oracle="""
    WITH q AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(COALESCE(value, -100) / 100) AS BIGINT) AS vb,
             event_type AS s,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    gsz AS (SELECT day, vb, SUM(c) AS ng FROM q GROUP BY day, vb),
    gdist AS (SELECT s, SUM(c) AS cs FROM q GROUP BY s),
    nrow AS (SELECT SUM(c) AS nn FROM q),
    tg AS (
      SELECT g.day, g.vb, g.ng,
             SUM(ABS(q.c * nrow.nn - gdist.cs * g.ng) - gdist.cs * g.ng)
               + g.ng * nrow.nn AS t_num
      FROM q
      JOIN gsz g ON q.day = g.day AND q.vb = g.vb
      JOIN gdist ON q.s = gdist.s
      CROSS JOIN nrow
      GROUP BY g.day, g.vb, g.ng, nrow.nn
    ),
    ts_(t_bp) AS (VALUES (2000), (3500), (5000)),
    audited AS (
      SELECT ts_.t_bp, tg.ng,
             (tg.t_num * 10000 > 2 * ts_.t_bp * tg.ng
                * (SELECT nn FROM nrow)) AS above
      FROM tg CROSS JOIN ts_
    )
    SELECT CAST(t_bp AS INT) AS t_bp,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(count_if(above) AS BIGINT) AS n_groups_above,
           CAST(COALESCE(SUM(CASE WHEN above THEN ng END), 0) AS BIGINT)
             AS n_rows_above,
           CAST(10000 * COALESCE(SUM(CASE WHEN above THEN ng END), 0)
                // SUM(ng) AS BIGINT) AS rows_bp
    FROM audited GROUP BY t_bp ORDER BY t_bp
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the privacy ladder: a QI
    group can be k-anonymous AND l-diverse yet still leak if its
    sensitive-value DISTRIBUTION diverges from the corpus (e.g. a group
    that is 90% 'error' when the corpus is 20%). t-closeness bounds the
    EMD between group and global distributions; for categorical
    attributes EMD = total-variation distance ½Σ|p−P| [P — Li 2007].
    Same QI (day, value-bucket) and sensitive (event_type) as the k / l
    keys, audited at t ∈ {0.20, 0.35, 0.50}.

    The TVD is computed in EXACT integers: ½Σ|c·N − C_s·n|/(n·N), with
    absent-from-group sensitive values folded in via
    Σ_absent C_s·n = n·(N − Σ_present C_s) so only present cells are
    touched; the threshold compare cross-multiplies (t_num·10⁴ >
    2·t_bp·n·N) so NO float ever decides a group (the
    `sample_neyman_allocation` integer discipline). One (QI, s) rollup
    + two bounded sibling aggregates; thresholds are a 3-row literal
    grid (the `privacy_l_diversity` shape)."""
    ev = table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.floor(F.coalesce(F.col("value"), F.lit(-100)) / 100)
        .cast("bigint")
        .alias("vb"),
        F.col("event_type").alias("s"),
    )
    q = ev.groupBy("day", "vb", "s").agg(F.count(F.lit(1)).alias("c"))
    q = q.localCheckpoint()  # reused by three sibling aggregates
    gsz = q.groupBy("day", "vb").agg(F.sum("c").alias("ng"))
    glob = q.groupBy("s").agg(F.sum("c").alias("cs"))
    nn = q.agg(F.sum("c")).collect()[0][0]
    tg = (
        q.join(gsz, ["day", "vb"])
        .join(F.broadcast(glob), "s")
        .groupBy("day", "vb", "ng")
        .agg(
            (
                F.sum(
                    F.abs(F.col("c") * F.lit(nn) - F.col("cs") * F.col("ng"))
                    - F.col("cs") * F.col("ng")
                )
                + F.first("ng") * F.lit(nn)
            ).alias("t_num")
        )
    )
    thresholds = spark.createDataFrame([(2000,), (3500,), (5000,)], "t_bp int")
    audited = tg.crossJoin(F.broadcast(thresholds)).select(
        "t_bp",
        "ng",
        (
            F.col("t_num") * 10000
            > F.lit(2) * F.col("t_bp") * F.col("ng") * F.lit(nn)
        ).alias("above"),
    )
    return (
        audited.groupBy("t_bp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.col("above").cast("long")).cast("bigint").alias(
                "n_groups_above"
            ),
            F.coalesce(
                F.sum(F.when(F.col("above"), F.col("ng"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_rows_above"),
            (
                F.lit(10000)
                * F.coalesce(F.sum(F.when(F.col("above"), F.col("ng"))), F.lit(0))
                / F.sum("ng")
            )
            .cast("bigint")
            .alias("rows_bp"),
        )
        .orderBy("t_bp")
    )


# ---------------------------------------------------------------------------
# scan_text_wholefile
# ---------------------------------------------------------------------------


@register(
    "scan_text_wholefile",
    oracle="""
    WITH agg AS (
      SELECT source,
             string_agg(text, chr(10) ORDER BY doc_id) AS content
      FROM documents WHERE source IS NOT NULL GROUP BY source
    )
    SELECT source || '.txt' AS file_name,
           CAST(length(content) AS BIGINT) AS n_chars,
           md5(content) AS content_md5
    FROM agg ORDER BY file_name
    """,
)
def scan_text_wholefile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file text ingestion: materialize one .txt file per source
    (docs concatenated in doc_id order), read the directory back with
    `spark.read.text(wholetext=True)` — the one-record-per-FILE mode —
    and report per-file name, character count and content MD5. This is
    the corpus layout crawl dumps actually arrive in (one document per
    file), where line-mode `text` would shred records; the oracle
    recomputes the same checksums from the source table, so the
    write → whole-file read → checksum round-trip is hash-verified
    end-to-end.

    At 100 TB whole-file records require files ≲ a few hundred MB (a
    record cannot split); `binaryFile` + `mapInPandas` decode
    (`multimodal_binary`) is the documented escape hatch for larger
    blobs. The per-source concat is one collect of 20 small strings
    here; the read-back is a distributed whole-file scan.

    A NULL source names no file — pinned two-sided (the engine would
    otherwise stringify it into a 'None.txt' the oracle's NULL || '.txt'
    never produces; EDGE_SWEEP_r10 class C)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .select("source", "doc_id", "text")
    )
    agg = (
        docs.groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s.text,
                ),
                "\n",
            ).alias("content")
        )
        .collect()
    )
    out_dir = tempfile.mkdtemp(prefix="sf_wholefile_")
    for row in agg:
        with open(os.path.join(out_dir, f"{row['source']}.txt"), "w") as fh:
            fh.write(row["content"])
    txt = spark.read.text(out_dir, wholetext=True)
    return (
        txt.select(
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("file_name"),
            F.length("value").cast("bigint").alias("n_chars"),
            F.md5(F.encode("value", "UTF-8")).alias("content_md5"),
        )
        .orderBy("file_name")
    )
