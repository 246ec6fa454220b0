"""Wave-25 keys (round 5): coreset sampling, corpus novelty curve,
ranking eval, multiple-testing control, flow traffic matrix.

- ``sample_kcenter_coreset``: greedy k-center (farthest-point
  traversal) over the embedding table [P — Gonzalez 1985; the coreset
  selection used for diverse-subset curation] — picks a size-k subset
  whose coverage radius 2-approximates the optimal k-center cost.
- ``text_novelty_curve``: marginal-novelty curve of the growing corpus
  — what fraction of each ingestion decile's shingles is NEW vs
  everything before it. The saturation diagnostic that prices the next
  crawl increment [P — the dedup-saturation analyses in LLM data
  papers].
- ``ml_eval_ndcg``: NDCG@10 ranking quality per query — completes the
  model-eval family (`ml_eval_auc` classification, `ml_eval_calibration`
  probabilities, `ml_eval_pr_threshold` operating points, THIS ranking)
  [P — Järvelin & Kekäläinen 2002].
- ``stats_benjamini_hochberg``: FDR control across a battery of
  simultaneous tests [P — Benjamini & Hochberg 1995] — the step after
  `agg_welch_ttest` when there are 50 metrics, where per-test alpha
  would drown the platform in false discoveries.
- ``flows_traffic_matrix``: src-network x dst-network byte matrix (the
  nfdump bidirectional stat matrix concept [P]) via DOUBLE
  longest-prefix enrichment — both endpoints resolved through the same
  bucket-exploded prefix table as `join_ip_prefix_lookup`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# sample_kcenter_coreset
# ---------------------------------------------------------------------------

_KCENTER_K = 16


@register("sample_kcenter_coreset")  # rows-only: iterative float argmax
# has no tractable SQL analog; exact-equality vs a numpy reference
# implementation + monotone-radius contracts are pinned in tests
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center / farthest-point traversal [P — Gonzalez 1985]:
    seed with the lowest vec_id, then k-1 times add the point FARTHEST
    from the selected set. The selected subset is a provable
    2-approximation of the optimal k-center cover — the diversity
    sampler for curation (pick k maximally-different documents), the
    dual of `sample_negative_mining`'s hard negatives and
    `dedup_semantic_cluster`'s redundancy removal.

    Distributed shape: the state is ONE running column ``dmin`` (squared
    distance to the nearest selected center). Each of the k iterations
    is (1) a row-local zip_with/aggregate fold against the SINGLE new
    center's 64-float literal — no join, no shuffle — and (2) one
    max_by aggregation to elect the next center (deterministic
    tie-break on lowest vec_id via struct ordering). k jobs total,
    each one map + one tiny agg; the frame is checkpointed per
    iteration so lineage stays O(1) instead of O(k) (the Lloyd
    lesson). At 100 TB the same loop runs unchanged: the per-iteration
    state is one double column, and the only aggregate is an O(P)
    partial max."""
    emb = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # a NULL embedding has no position to cover (r9 edge batch,
        # nullmix mode: a None center vector cannot become a literal)
        .filter(F.col("v").isNotNull())
        .localCheckpoint(eager=False)
    )
    seed = emb.orderBy("vec_id").limit(1).collect()
    if not seed:
        # empty corpus (r9 edge batch, class-3 guard): no seed to
        # traverse from — schema-stable empty coreset
        return spark.createDataFrame(
            [], "step INT, vec_id BIGINT, radius2_at_selection DOUBLE"
        )
    first = seed[0]
    centers = [(1, first["vec_id"], 0.0)]
    cur = emb.withColumn("dmin", F.lit(float("inf")))
    center_vec = first["v"]
    for step in range(2, _KCENTER_K + 1):
        c = F.lit(center_vec)  # 64 doubles — a single small array literal
        d2 = F.expr(
            "aggregate(zip_with(v, _c, (a, b) -> (a - b) * (a - b)),"
            " 0D, (acc, x) -> acc + x)"
        )
        cur = (
            cur.withColumn("_c", c)
            .withColumn("dmin", F.least("dmin", d2))
            .drop("_c")
            .localCheckpoint(eager=False)
        )
        far = cur.agg(
            F.expr("max_by(vec_id, struct(dmin, -vec_id))").alias("vid"),
            F.max("dmin").alias("d"),
        ).collect()[0]
        centers.append((step, far["vid"], float(far["d"])))
        center_vec = (
            emb.filter(F.col("vec_id") == far["vid"]).collect()[0]["v"]
        )
    return spark.createDataFrame(
        [(s, v, round(d, 4)) for s, v, d in centers],
        "step INT, vec_id BIGINT, radius2_at_selection DOUBLE",
    )


# ---------------------------------------------------------------------------
# text_novelty_curve
# ---------------------------------------------------------------------------


@register(
    "text_novelty_curve",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE len(string_split(text, ' ')) >= 5),
    s AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                   || ws[i+3] || ' ' || ws[i+4] AS sh
      FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
    ),
    firsts AS (SELECT sh, MIN(doc_id) AS first_doc FROM s GROUP BY sh),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_sh,
             COUNT(*) FILTER (WHERE f.first_doc = s.doc_id) AS n_novel
      FROM s JOIN firsts f ON s.sh = f.sh
      GROUP BY s.doc_id
    ),
    mx AS (SELECT MAX(doc_id) AS m FROM per_doc)
    SELECT CAST(p.doc_id * 10 // (mx.m + 1) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           CAST(SUM(n_novel) * 10000 // SUM(n_sh) AS BIGINT) AS novelty_bp
    FROM per_doc p, mx
    GROUP BY 1
    """,
)
def text_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty curve: order the corpus by ingestion (doc_id),
    bucket into deciles, and measure what share of each decile's word
    5-grams is seen for the FIRST time there (global first occurrence
    = min doc_id per shingle; a shingle repeated inside one doc counts
    once). A falling curve is dedup saturation — the number that tells
    a data-acquisition team the marginal value of the next crawl
    increment before paying for it.

    Within-doc shingle dedup happens ROW-LOCALLY (array_distinct on
    the shingle array before the explode — no (doc, sh) distinct
    shuffle at all); then one shingle-keyed aggregation finds first
    occurrences, the join back rides the same shingle key, one doc
    rollup, one bounded decile rollup; the 1-row max(doc_id)
    broadcasts. Integer basis points throughout."""
    d = table(spark, sf_dir, "documents")
    s = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, size(ws) - 4),"
                    " i -> array_join(slice(ws, i, 5), ' ')))"
                )
            ).alias("sh"),
        )
    )
    firsts = s.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        s.join(firsts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias("n_novel"),
        )
    )
    mx = per_doc.agg(F.max("doc_id").alias("m"))
    return (
        per_doc.crossJoin(F.broadcast(mx))  # 1-row total
        .groupBy(
            F.expr("CAST(doc_id * 10 DIV (m + 1) AS BIGINT)").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
            F.expr("CAST(SUM(n_novel) * 10000 DIV SUM(n_sh) AS BIGINT)").alias(
                "novelty_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# ml_eval_ndcg
# ---------------------------------------------------------------------------

_NDCG_AT = 10


@register(
    "ml_eval_ndcg",
    oracle=f"""
    WITH scored AS (  -- retrieval run: items ranked per query by score
      SELECT event_type AS query, user_id % 100 AS item,
             SUM(value) AS score
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    run AS (
      SELECT query, item, (item * 7) % 4 AS rel,
             ROW_NUMBER() OVER (PARTITION BY query
                                ORDER BY score DESC, item) AS pos
      FROM scored
    ),
    dcg AS (
      SELECT query,
             SUM(CASE WHEN pos <= {_NDCG_AT}
                 THEN (pow(2, rel) - 1) / log2(pos + 1) END) AS dcg
      FROM run GROUP BY query
    ),
    ideal AS (
      SELECT query,
             SUM(CASE WHEN ipos <= {_NDCG_AT}
                 THEN (pow(2, rel) - 1) / log2(ipos + 1) END) AS idcg
      FROM (SELECT query, rel,
                   ROW_NUMBER() OVER (PARTITION BY query
                                      ORDER BY rel DESC, item) AS ipos
            FROM run)
      GROUP BY query
    )
    SELECT d.query, ROUND(d.dcg, 4) AS dcg_at10,
           ROUND(i.idcg, 4) AS idcg_at10,
           ROUND(d.dcg / i.idcg, 4) AS ndcg_at10
    FROM dcg d JOIN ideal i ON d.query = i.query
    """,
)
def ml_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query [P — Järvelin & Kekäläinen 2002]: graded-gain
    discounted ranking quality, THE retrieval/recommender metric —
    completing the eval family (`ml_eval_auc` ranks binary,
    `ml_eval_calibration` checks probabilities, `ml_eval_pr_threshold`
    picks operating points; NDCG grades an ordered list). The run is a
    deterministic retrieval stand-in (items ranked by aggregate value
    per query; graded relevance from item arithmetic — a ground-truth
    stand-in, not a mechanism change).

    The corpus-sized work is ONE (query, item) aggregation; both the
    run ranking and the ideal ranking are windows over the tiny scored
    table sharing the query partitioning; gains/discounts are row-local
    arithmetic. Ties broken deterministically (score desc, item) so the
    oracle ranks identically."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    scored = e.groupBy(
        F.col("event_type").alias("query"),
        (F.col("user_id") % 100).alias("item"),
    ).agg(F.sum("value").alias("score"))
    # the ranked run feeds two consumers (DCG + the ideal re-rank) —
    # checkpoint the tiny scored table so the corpus agg runs once
    run = scored.select(
        "query",
        "item",
        ((F.col("item") * 7) % 4).alias("rel"),
        F.row_number()
        .over(Window.partitionBy("query").orderBy(F.desc("score"), "item"))
        .alias("pos"),
    ).localCheckpoint(eager=False)
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    dcg = run.groupBy("query").agg(
        F.sum(F.when(F.col("pos") <= _NDCG_AT, gain)).alias("dcg")
    )
    ideal_run = run.select(
        "query",
        "rel",
        F.row_number()
        .over(Window.partitionBy("query").orderBy(F.desc("rel"), "item"))
        .alias("ipos"),
    )
    igain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("ipos") + 1)
    ideal = ideal_run.groupBy("query").agg(
        F.sum(F.when(F.col("ipos") <= _NDCG_AT, igain)).alias("idcg")
    )
    # try_divide: degenerate input (all-NULL relevance after the value
    # gate) yields idcg = 0, where ANSI `/` raises DIVIDE_BY_ZERO but
    # DuckDB yields NULL (EDGE_SWEEP_r10 class B)
    return dcg.join(ideal, "query").select(
        "query",
        F.round("dcg", 4).alias("dcg_at10"),
        F.round("idcg", 4).alias("idcg_at10"),
        F.round(F.try_divide(F.col("dcg"), F.col("idcg")), 4).alias("ndcg_at10"),
    )


# ---------------------------------------------------------------------------
# stats_benjamini_hochberg
# ---------------------------------------------------------------------------

_BH_Q_NUM, _BH_Q_DEN = 1, 10  # FDR level q = 0.10
# Abramowitz & Stegun 26.2.17 normal-tail polynomial (both engines run
# the IDENTICAL double arithmetic; p is floored to e6 integers before
# any comparison so ulp noise cannot reorder the ranking)
_AS_COEF = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _p_e6_sql(z: str) -> str:
    """Two-sided normal p-value as an e6 integer, A&S 26.2.17."""
    t = f"(1.0 / (1.0 + 0.2316419 * abs({z})))"
    poly = (
        f"({_AS_COEF[0]} * {t} + {_AS_COEF[1]} * pow({t}, 2)"
        f" + {_AS_COEF[2]} * pow({t}, 3) + {_AS_COEF[3]} * pow({t}, 4)"
        f" + {_AS_COEF[4]} * pow({t}, 5))"
    )
    phi = f"(exp(-{z} * {z} / 2.0) / sqrt(2.0 * pi()))"
    return f"CAST(FLOOR(2.0 * {phi} * {poly} * 1000000) AS BIGINT)"


@register(
    "stats_benjamini_hochberg",
    oracle=f"""
    WITH g AS (
      SELECT user_id % 50 AS cell, COUNT(*) AS n, AVG(value) AS mean
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    gl AS (
      SELECT AVG(value) AS gmean, var_samp(value) AS gvar
      FROM events WHERE value IS NOT NULL
    ),
    z AS (
      SELECT cell, n,
             (mean - gmean) / sqrt(gvar / n) AS zval
      FROM g, gl
    ),  -- zero-variance corpus: /0 is NULL here, try_divide engine-side
    p AS (
      SELECT cell, {_p_e6_sql('zval')} AS p_e6 FROM z
    ),
    ranked AS (
      SELECT cell, p_e6,
             -- NULLS LAST pinned: an undefined p (zero-variance corpus)
             -- ranks after every real p on BOTH engines
             ROW_NUMBER() OVER (ORDER BY p_e6 NULLS LAST, cell) AS i,
             COUNT(*) OVER () AS m
      FROM p
    ),
    crit AS (  -- BH: largest i with p_(i) <= i*q/m  (integer compare)
      SELECT MAX(CASE WHEN p_e6 * m * {_BH_Q_DEN} <= i * {_BH_Q_NUM} * 1000000
                 THEN i ELSE 0 END) AS k,
             MAX(m) AS m
      FROM ranked
    )
    SELECT CAST(c.m AS BIGINT) AS n_tests,
           CAST(c.k AS BIGINT) AS n_rejected_bh,
           CAST(COUNT(CASE WHEN r.p_e6 * c.m * {_BH_Q_DEN}
                           <= {_BH_Q_NUM} * 1000000 THEN 1 END) AS BIGINT)
             AS n_rejected_bonferroni,
           CAST(MIN(CASE WHEN r.i = c.k THEN r.p_e6 END) AS BIGINT)
             AS bh_cutoff_p_e6
    FROM ranked r, crit c
    GROUP BY c.m, c.k
    """,
)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control [P — 1995] over a battery of 50
    simultaneous cell-vs-global mean tests: rank the p-values, find the
    largest i with p_(i) <= i·q/m, reject everything up to it — the
    multiple-testing step a metrics platform needs the moment it runs
    `agg_welch_ttest` on 50 metrics at once (per-test alpha would
    produce ~2.5 false discoveries per sweep; Bonferroni, reported
    alongside, over-corrects).

    One grouped moment pass + a 1-row global-moment broadcast; z, the
    normal tail (A&S 26.2.17 polynomial — identical double arithmetic
    in both engines), and the e6-integer p-values are row-local on the
    50-cell table; the BH step is one window + one conditional agg on
    50 rows. All comparisons happen on INTEGER e6 p-values — ulp noise
    cannot reorder the ranking or flip a rejection."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = e.groupBy((F.col("user_id") % 50).alias("cell")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean")
    )
    glob = e.agg(
        F.avg("value").alias("gmean"), F.var_samp("value").alias("gvar")
    )
    # try_divide (r9 edge batch): a zero-variance corpus (constk) makes
    # the z denominator 0 with a 0 numerator — DuckDB 0/0 is NULL, ANSI
    # threw; p stays NULL and the pinned NULLS LAST rank keeps the
    # undefined tests after every real one on both engines.
    z = g.crossJoin(F.broadcast(glob)).select(
        "cell",
        F.try_divide(
            F.col("mean") - F.col("gmean"), F.sqrt(F.col("gvar") / F.col("n"))
        ).alias("zval"),
    )
    p = z.select("cell", F.expr(_p_e6_sql("zval")).alias("p_e6"))
    # the test battery is 50 rows by construction (user_id % 50) — an
    # ordered window over it is bounded, not data-sized
    wrank = Window.orderBy(F.asc_nulls_last("p_e6"), "cell")
    m_df = p.agg(F.count(F.lit(1)).alias("m"))
    # 50-row frame feeding two consumers (crit + final report) —
    # checkpoint so the corpus moment pass runs once, not per branch
    ranked = (
        p.select("cell", "p_e6", F.row_number().over(wrank).alias("i"))
        .crossJoin(F.broadcast(m_df))  # 50 x 1 rows
        .localCheckpoint(eager=False)
    )
    crit = ranked.agg(
        F.max(
            F.when(
                F.col("p_e6") * F.col("m") * _BH_Q_DEN
                <= F.col("i") * _BH_Q_NUM * 1000000,
                F.col("i"),
            ).otherwise(0)
        ).alias("k"),
        F.max("m").alias("m"),
    )
    return (
        ranked.crossJoin(F.broadcast(crit.withColumnRenamed("m", "mm")))
        .groupBy("mm", "k")
        .agg(
            F.count_if(
                F.col("p_e6") * F.col("mm") * _BH_Q_DEN <= _BH_Q_NUM * 1000000
            ).alias("n_rejected_bonferroni"),
            F.min(F.when(F.col("i") == F.col("k"), F.col("p_e6"))).alias(
                "bh_cutoff_p_e6"
            ),
        )
        .select(
            F.col("mm").cast("bigint").alias("n_tests"),
            F.col("k").cast("bigint").alias("n_rejected_bh"),
            F.col("n_rejected_bonferroni").cast("bigint"),
            F.col("bh_cutoff_p_e6").cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# flows_traffic_matrix
# ---------------------------------------------------------------------------


@register(
    "flows_traffic_matrix",
    oracle="""
    WITH f AS (
      SELECT 167772160 + (user_id % 256) * 256 + 9          AS sa_num,
             167772160 + ((user_id * 7 + event_id) % 256) * 256 + 21
                                                            AS da_num,
             CAST(FLOOR(value * 1000) AS BIGINT) AS bytes
      FROM events WHERE value IS NOT NULL
    ),
    px(lo, hi, label) AS (VALUES
      (167772160, 167788543, 'net-a'), (167788544, 167804927, 'net-b'),
      (167804928, 167809023, 'net-c'), (167809024, 167813119, 'net-d'),
      (167813120, 167821311, 'net-e'), (167821312, 167837695, 'net-f')),
    m AS (
      SELECT s.label AS src_net, d.label AS dst_net,
             CAST(COUNT(*) AS BIGINT) AS n_flows,
             CAST(SUM(f.bytes) AS BIGINT) AS total_bytes
      FROM f
      JOIN px s ON f.sa_num BETWEEN s.lo AND s.hi
      JOIN px d ON f.da_num BETWEEN d.lo AND d.hi
      GROUP BY 1, 2
    )
    SELECT * FROM m ORDER BY total_bytes DESC, src_net, dst_net LIMIT 20
    """,
)
def flows_traffic_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-network x destination-network traffic matrix (the nfdump
    bidirectional stat concept [P] — 'who talks to whom, in bytes'):
    BOTH flow endpoints resolved to their covering prefix via the same
    bucket-exploded longest-prefix machinery as `join_ip_prefix_lookup`
    (equi-join on the /20 bucket, range residual — never
    O(flows x prefixes)), then one matrix rollup and a deterministic
    top-20 by bytes. Two broadcast enrichment joins back-to-back — the
    flow side never shuffles until the bounded matrix aggregation;
    the top-20 plans as TakeOrderedAndProject."""
    from ..functions.ip import ipv4_to_num
    from .joins import _BUCKET_BITS, _prefix_rows

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    sa = F.concat(
        F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".9")
    )
    da = F.concat(
        F.lit("10.0."),
        ((F.col("user_id") * 7 + F.col("event_id")) % 256).cast("string"),
        F.lit(".21"),
    )
    flows = e.select(
        ipv4_to_num(sa).alias("sa_num"),
        ipv4_to_num(da).alias("da_num"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("bytes"),
    )
    px = spark.createDataFrame(
        _prefix_rows(), "lo BIGINT, hi BIGINT, label STRING"
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.shiftright("lo", _BUCKET_BITS),
                F.shiftright("hi", _BUCKET_BITS),
            )
        ),
    )
    s_px = px.select(
        F.col("bucket").alias("s_bucket"), F.col("lo").alias("s_lo"),
        F.col("hi").alias("s_hi"), F.col("label").alias("src_net"),
    )
    d_px = px.select(
        F.col("bucket").alias("d_bucket"), F.col("lo").alias("d_lo"),
        F.col("hi").alias("d_hi"), F.col("label").alias("dst_net"),
    )
    enriched = (
        flows.withColumn("s_bucket", F.shiftright("sa_num", _BUCKET_BITS))
        .join(F.broadcast(s_px), "s_bucket")
        .filter(F.col("sa_num").between(F.col("s_lo"), F.col("s_hi")))
        .withColumn("d_bucket", F.shiftright("da_num", _BUCKET_BITS))
        .join(F.broadcast(d_px), "d_bucket")
        .filter(F.col("da_num").between(F.col("d_lo"), F.col("d_hi")))
    )
    return (
        enriched.groupBy("src_net", "dst_net")
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy(F.desc("total_bytes"), "src_net", "dst_net")
        .limit(20)
    )
