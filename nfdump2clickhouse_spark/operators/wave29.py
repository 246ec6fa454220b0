"""Wave-29 keys (round 5): canonical-doc selection, cluster quality,
ratio-metric variance, port service mix, design-optimal sampling.

- ``dedup_canonical_doc``: representative selection after duplicate
  clustering — the KEEP decision that turns `dedup_cluster_cc`'s
  labels into an actual deduplicated corpus [P — the canonical-doc
  step of every production dedup pipeline].
- ``emb_cluster_silhouette``: simplified (centroid-based) silhouette
  score per cluster [P — Rousseeuw 1987; the centroid variant is the
  standard O(N·k) form] — the cluster-quality number that decides k.
- ``stats_ratio_delta_method``: standard error of RATIO metrics
  (revenue/event, CTR-style) via the delta method [P — standard
  ratio-metric variance], vs the naive per-user-ratio SE that
  experimentation platforms get wrong first.
- ``flows_port_services``: destination-port service classification and
  traffic mix (the nfdump port-stat concept [P]) via a broadcast
  service map.
- ``sample_neyman_allocation``: variance-optimal stratified sample
  allocation (Neyman) with exact largest-remainder integer rounding
  [P — Neyman 1934] — the design step before `sample_stratified` draws.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# dedup_canonical_doc
# ---------------------------------------------------------------------------


@register(
    "dedup_canonical_doc",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
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
    pairs AS (
      SELECT id1, id2
      FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      WHERE c * 1.0 / (x.n + y.n - c) >= 0.3
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs
    ),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    lab AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    m AS (
      SELECT l.cluster_id, l.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                ORDER BY d.n_chars DESC, l.doc_id) AS rn
      FROM lab l JOIN documents d ON l.doc_id = d.doc_id
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars
    FROM m GROUP BY cluster_id HAVING COUNT(*) >= 2
    """,
)
def dedup_canonical_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection: for every multi-member duplicate
    cluster (labels from `dedup_cluster_cc`'s min-label propagation),
    KEEP the longest member (ties to the lowest doc_id) and account for
    what the dedup drops — members, total vs kept characters. This is
    the decision step that turns cluster labels into a deduplicated
    corpus; 'keep the longest' is the standard canonicalization
    heuristic (the longest near-dup is usually the least-truncated
    crawl of the resource).

    The cluster labels reuse the CC fold (bounded rounds, checkpointed);
    representative election is one per-cluster argmax window that
    prunes via WindowGroupLimit; the rollup is cluster-keyed. The
    oracle extends the CC recursive-CTE transitive closure with the
    same deterministic argmax."""
    from .dedup_extra import dedup_cluster_cc

    labels = dedup_cluster_cc(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = labels.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    ranked = m.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("rep_doc_id"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .filter(F.col("n_members") >= 2)
    )


# ---------------------------------------------------------------------------
# emb_cluster_silhouette
# ---------------------------------------------------------------------------


@register("emb_cluster_silhouette")  # rows-only: float centroid means
# and distance ratios are engine-accumulation-specific; the numpy
# replication + range contracts are pinned in tests
def emb_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster [P — Rousseeuw 1987; the
    centroid-based O(N·k) variant every large-scale evaluator uses —
    the exact pairwise form is O(N²)]: for each point, a = distance to
    its OWN cluster centroid, b = distance to the nearest OTHER
    centroid, s = (b − a)/max(a, b); reported as per-cluster means.
    The cluster-quality number that decides k and flags collapsed or
    overlapping clusters (s ≈ 0) before an index or a SemDeDup run
    trusts the labels.

    Scale shape: centroids come from ONE posexplode + (label, dim)
    aggregation (the `emb_pca_project` moment discipline); the k×64
    centroid table broadcasts back; a/b/s are row-local HOF folds over
    the broadcast array — the corpus is touched twice (moments +
    scoring), never joined to itself."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col("label").alias("clabel"),
            F.expr("transform(pm, s -> s.m)").alias("cv"),
        )
    )
    # k rows of 64 doubles — collect to ONE array-of-structs literal
    rows = cent.collect()
    if not rows:
        # zero embeddings -> zero clusters: empty result (r7 edge sweep —
        # F.array() over no centroids infers VOID and breaks the HOFs)
        return spark.createDataFrame(
            [], "label int, n bigint, mean_silhouette double, min_silhouette double"
        )
    lit = F.array(
        *[
            F.struct(
                F.lit(r["clabel"]).alias("clabel"),
                F.lit(r["cv"]).alias("cv"),
            )
            for r in rows
        ]
    )
    d2 = (
        "aggregate(zip_with(v, c.cv, (a, b) -> (a - b) * (a - b)),"
        " 0D, (acc, x) -> acc + x)"
    )
    scored = e.withColumn("cents", lit).select(
        "label",
        F.expr(
            f"sqrt(aggregate(filter(cents, c -> c.clabel = label),"
            f" cast(null as double), (acc, c) -> {d2}))"
        ).alias("a"),
        F.expr(
            f"sqrt(array_min(transform(filter(cents, c -> c.clabel != label),"
            f" c -> {d2})))"
        ).alias("b"),
    )
    s = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(s), 4).alias("mean_silhouette"),
            F.round(F.min(s), 4).alias("min_silhouette"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# stats_ratio_delta_method
# ---------------------------------------------------------------------------


@register(
    "stats_ratio_delta_method",
    oracle="""
    WITH u AS (
      SELECT user_id, SUM(value) AS x, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
             var_samp(x) AS vx, var_samp(y) AS vy, covar_samp(x, y) AS cxy,
             AVG(x / y) AS naive_mean, var_samp(x / y) AS naive_var
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(mx / my, 4) AS ratio,
           ROUND(sqrt((vx + pow(mx / my, 2) * vy
                       - 2 * (mx / my) * cxy) / n) / my, 6) AS se_delta,
           ROUND(naive_mean, 4) AS naive_ratio_of_means,
           ROUND(sqrt(naive_var / n), 6) AS naive_se
    FROM m
    """,
)
def stats_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard error of a RATIO metric (value per event, computed as
    Σx/Σy over per-user totals) via the delta method [P — the standard
    ratio-metric variance: Var(X̄/Ȳ) ≈ (σx² + R²σy² − 2Rσxy)/(n·μy²)].
    Ratio metrics (CTR, revenue-per-session) are where experimentation
    platforms go wrong first: the naive approach — average each user's
    own ratio and take ITS SE — answers a different question (mean of
    ratios ≠ ratio of means) and both numbers are reported side by side
    so the divergence is visible. Pairs with `events_power_analysis`
    (which sizes mean metrics; ratio metrics need THIS variance).

    One user-keyed aggregation, one 1-row moment pass over the user
    table (count/avg/var/cov partials) — the whole analysis costs two
    bounded aggregations; `agg_welch_ttest` rounding discipline."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = e.groupBy("user_id").agg(
        F.sum("value").alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
        F.avg(F.col("x") / F.col("y")).alias("naive_mean"),
        F.var_samp(F.col("x") / F.col("y")).alias("naive_var"),
    )
    r = F.col("mx") / F.col("my")
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(r, 4).alias("ratio"),
        F.round(
            F.sqrt(
                (
                    F.col("vx")
                    + F.pow(r, 2) * F.col("vy")
                    - 2 * r * F.col("cxy")
                )
                / F.col("n")
            )
            / F.col("my"),
            6,
        ).alias("se_delta"),
        F.round("naive_mean", 4).alias("naive_ratio_of_means"),
        F.round(F.sqrt(F.col("naive_var") / F.col("n")), 6).alias("naive_se"),
    )


# ---------------------------------------------------------------------------
# flows_port_services
# ---------------------------------------------------------------------------

_SERVICES = [
    (22, "ssh"), (25, "smtp"), (53, "dns"), (80, "http"),
    (123, "ntp"), (443, "https"), (3389, "rdp"),
]
_SVC_SQL = ", ".join(f"({p}, '{s}')" for p, s in _SERVICES)


@register(
    "flows_port_services",
    oracle=f"""
    WITH f AS (
      SELECT (user_id * 13 + event_id) % 1024 AS dp,
             '10.0.' || CAST(user_id % 200 AS VARCHAR) AS sa,
             CAST(FLOOR(value * 1000) AS BIGINT) AS ibyt
      FROM events WHERE value IS NOT NULL
    ),
    svc(port, service) AS (VALUES {_SVC_SQL})
    SELECT COALESCE(s.service, 'other') AS service,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           CAST(SUM(f.ibyt) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT f.sa) AS BIGINT) AS n_hosts,
           CAST(SUM(f.ibyt) * 10000 // (SELECT SUM(ibyt) FROM f) AS BIGINT)
             AS byte_share_bp
    FROM f LEFT JOIN svc s ON f.dp = s.port
    GROUP BY 1
    """,
)
def flows_port_services(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destination-port service classification and traffic mix — the
    nfdump port-stat concept [P]: every flow labeled with its well-known
    service (unmatched ports roll up to 'other'), then flows/bytes/
    distinct-host counts and byte share per service. The first question
    an operator asks of a new capture ('what IS this traffic?') and the
    denominator for every per-service anomaly key
    (`flows_ddos_amplification`, `flows_beaconing_detection`).

    The service map is a broadcast LEFT join (tiny dim — label survives
    as 'other' on miss, never dropping flows); the 1-row byte total
    broadcasts into the share computation; one bounded service rollup
    with a two-phase distinct."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    f = e.select(
        ((F.col("user_id") * 13 + F.col("event_id")) % 1024).alias("dp"),
        F.concat(F.lit("10.0."), (F.col("user_id") % 200).cast("string")).alias(
            "sa"
        ),
        F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt"),
    )
    svc = spark.createDataFrame(_SERVICES, "port INT, service STRING")
    tot = f.agg(F.sum("ibyt").alias("tot"))
    return (
        f.join(F.broadcast(svc), f.dp == svc.port, "left")
        .select(
            F.coalesce("service", F.lit("other")).alias("service"),
            "sa",
            "ibyt",
        )
        .groupBy("service")
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.sum("ibyt").alias("total_bytes"),
            F.count_distinct("sa").alias("n_hosts"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "service",
            "n_flows",
            "total_bytes",
            "n_hosts",
            F.expr("CAST(total_bytes * 10000 DIV tot AS BIGINT)").alias(
                "byte_share_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# sample_neyman_allocation
# ---------------------------------------------------------------------------

_NEYMAN_N = 1000


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
             sqrt(var_samp(value)) AS sd
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    w AS (
      SELECT event_type, nh, sd,
             CAST(FLOOR(nh * sd * 1000000) AS BIGINT) AS wt
      FROM s
    ),
    t AS (SELECT SUM(wt) AS tot FROM w),
    q AS (
      SELECT event_type, nh, sd, wt,
             wt * {_NEYMAN_N} // tot AS base,
             wt * {_NEYMAN_N} % tot AS rem
      FROM w, t
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rk,
             {_NEYMAN_N} - SUM(base) OVER () AS leftover
      FROM q
    )
    SELECT event_type, nh, ROUND(sd, 4) AS sd,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS n_alloc
    FROM r
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified allocation [P — Neyman 1934]: split
    a budget of {_NEYMAN_N} samples across strata proportionally to
    N_h·σ_h — high-variance strata get more of the budget, which
    minimizes the variance of the stratified mean at fixed cost. The
    DESIGN step the sampling family was missing: `sample_stratified`
    draws per-stratum quotas, this computes what the quotas SHOULD be.

    One grouped moment pass; weights are e6-floored INTEGERS so the
    largest-remainder rounding (exact integer base + remainder ranking,
    deterministic event-type tie-break) allocates exactly {_NEYMAN_N}
    across strata with no float comparison anywhere in the
    apportionment — the same exact-integer-quota discipline as
    `sample_mixture_quota`."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sqrt(F.var_samp("value")).alias("sd"),
    )
    w = s.select(
        "event_type",
        "nh",
        "sd",
        F.floor(F.col("nh") * F.col("sd") * 1000000).cast("bigint").alias("wt"),
    ).localCheckpoint(eager=False)  # <=10 strata, two consumers
    t = w.agg(F.sum("wt").alias("tot"))
    q = w.crossJoin(F.broadcast(t)).select(
        "event_type",
        "nh",
        "sd",
        # tot==0 (all strata zero-variance): allocation undefined -> NULL,
        # the value DuckDB's `//`/`%` yield on a zero divisor (r7 edge
        # sweep const mode — DIV/% raised under ANSI)
        F.expr(
            f"CASE WHEN tot = 0 THEN NULL ELSE wt * {_NEYMAN_N} DIV tot END"
        ).alias("base"),
        F.expr(
            f"CASE WHEN tot = 0 THEN NULL ELSE wt * {_NEYMAN_N} % tot END"
        ).alias("rem"),
    )
    # strata count is the event-type vocabulary — bounded; the ordered
    # window runs on <=10 rows
    wr = Window.orderBy(F.desc("rem"), "event_type")
    wall = Window.partitionBy()
    r = q.select(
        "event_type",
        "nh",
        "sd",
        "base",
        F.row_number().over(wr).alias("rk"),
        (F.lit(_NEYMAN_N) - F.sum("base").over(wall)).alias("leftover"),
    )
    return r.select(
        "event_type",
        F.col("nh").cast("bigint").alias("nh"),
        F.round("sd", 4).alias("sd"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).cast("bigint").alias("n_alloc"),
    )
