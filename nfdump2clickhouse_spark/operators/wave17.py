"""Wave-17 keys (round 4): privacy audit, repeat-factor mixing, A/B
sample-ratio check, k-core graph peeling.

- ``privacy_k_anonymity``: the re-identification audit run before any
  event export — group sizes over a quasi-identifier tuple, share of
  rows in groups smaller than k for a threshold grid [P — Sweeney's
  k-anonymity model].
- ``sample_repeat_factor``: fractional-epoch corpus mixing (a source
  weighted 2.5 contributes every doc twice plus a deterministic 50%
  subset) — the standard LLM data-mixture mechanic for up/down-weighting
  sources without mutating them [P — repeat-factor sampling as used in
  detection/LLM training literature].
- ``stats_chi2_srm``: sample-ratio-mismatch χ² for hash-bucketed A/B
  assignment — the first gate of every experimentation platform (a
  biased split invalidates the experiment before any metric is read).
- ``graph_kcore``: k-core decomposition by iterative peeling on the
  sparsified trade graph — the density filter used to find the stable
  backbone of an interaction graph.

Determinism rules: hashes are the multiplicative key-hash already used
by ``sample_hash_bucket`` (pure integer arithmetic, identical in both
engines); the k-core peel is unrolled to a fixed round count in BOTH
engines, with the fixpoint pinned by a test that runs one extra round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

_MULT = 2654435761  # Knuth multiplicative hash (same constant as reshape.py)


@register(
    "privacy_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR(COALESCE(value, -100) / 100) AS BIGINT) AS vb,
             COUNT(*) AS g
      FROM events GROUP BY 1, 2, 3
    ),
    ks(k) AS (VALUES (2), (5), (10), (20))
    SELECT CAST(ks.k AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(count_if(q.g < ks.k) AS BIGINT) AS n_groups_below,
           CAST(COALESCE(SUM(CASE WHEN q.g < ks.k THEN q.g END), 0) AS BIGINT)
             AS n_rows_below,
           CAST(10000 * COALESCE(SUM(CASE WHEN q.g < ks.k THEN q.g END), 0)
                // SUM(q.g) AS BIGINT) AS rows_bp
    FROM q, ks GROUP BY ks.k
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (event_type,
    day, value-bucket): for each k in a threshold grid, how many QI
    groups — and what share of rows — fall below k. Rows in sub-k
    groups are re-identifiable by an adversary holding the QIs; this
    report is the gate before exporting or sharing the table
    [P — Sweeney 2002 model].

    Scale shape: ONE group-size aggregation over the QI tuple (the only
    data-sized shuffle), then a 4-row threshold grid cross-joined onto
    the group-size table (tiny literal side) and a final agg. Integer
    counts and floor-div basis points: hash-exact."""
    e = table(spark, sf_dir, "events")
    q = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.coalesce(F.col("value"), F.lit(-100)) / 100)
        .cast("bigint")
        .alias("vb"),
    ).agg(F.count(F.lit(1)).alias("g"))
    ks = spark.createDataFrame([(2,), (5,), (10,), (20,)], "k int")
    return (
        q.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.count_if(F.col("g") < F.col("k")).cast("bigint").alias(
                "n_groups_below"
            ),
            F.coalesce(F.sum(F.when(F.col("g") < F.col("k"), F.col("g"))), F.lit(0))
            .cast("bigint")
            .alias("n_rows_below"),
            F.expr(
                "CAST(10000 * COALESCE(SUM(CASE WHEN g < k THEN g END), 0)"
                " DIV SUM(g) AS BIGINT)"
            ).alias("rows_bp"),
        )
    )


@register(
    "sample_repeat_factor",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CASE CAST(SUBSTR(source, 4) AS INT) % 4
                  WHEN 0 THEN 250 WHEN 1 THEN 125
                  WHEN 2 THEN 100 ELSE 40 END AS w_pct
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, w_pct,
             w_pct // 100
             + CASE WHEN (doc_id * {_MULT}) % 4294967296 % 100
                         < w_pct % 100 THEN 1 ELSE 0 END AS copies
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(copies) AS BIGINT) AS n_emitted,
           CAST(SUM(copies * (copies + 1) / 2) AS BIGINT) AS epoch_sum,
           CAST(10000 * SUM(copies) // COUNT(*) AS BIGINT) AS eff_rate_bp
    FROM c GROUP BY source
    """,
)
def sample_repeat_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-factor corpus mixing: every source carries a fractional
    epoch weight (2.5 / 1.25 / 1.0 / 0.4 by source id here; config in
    production) — each doc is emitted floor(w) times plus once more for
    a deterministic key-hash fraction of docs. Up-weights scarce
    high-quality sources and down-samples bulk ones WITHOUT mutating
    the corpus, and reruns are reproducible because membership is a
    pure function of doc_id (`sample_hash_bucket` discipline, never
    `df.sample`).

    Scale shape: the copies column is scan-local integer arithmetic;
    the replicated corpus materializes via explode(sequence(1, n)) —
    row-local, no shuffle — and only the per-source reconciliation
    aggregates. epoch_sum = Σ c(c+1)/2 pins the explode structure (the
    oracle computes the closed form; the engine sums the actual
    epoch indices)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.element_at(F.split("source", "src"), 2).cast("int").alias("sn"),
    )
    w_pct = (
        F.when(F.col("sn") % 4 == 0, 250)
        .when(F.col("sn") % 4 == 1, 125)
        .when(F.col("sn") % 4 == 2, 100)
        .otherwise(40)
    )
    bucket = (F.col("doc_id") * F.lit(_MULT)) % F.lit(4294967296) % 100
    c = d.withColumn("w_pct", w_pct).withColumn(
        "copies",
        (F.col("w_pct") / 100).cast("bigint")
        + F.when(bucket < F.col("w_pct") % 100, 1).otherwise(0),
    )
    replicated = c.filter(F.col("copies") > 0).select(
        "source",
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("epoch_idx"),
    )
    # the reconciliation join is NULL-SAFE on source: groupBy keeps a
    # NULL-source group on both engines, but an equi-join key of NULL
    # never matches itself, silently zeroing that group's n_emitted
    # (EDGE_SWEEP_r10 class D)
    emitted = replicated.groupBy(F.col("source").alias("_esrc")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_emitted"),
        F.sum("epoch_idx").cast("bigint").alias("epoch_sum"),
    )
    per_src = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        per_src.join(
            emitted, per_src["source"].eqNullSafe(emitted["_esrc"]), "left"
        )
        .drop("_esrc")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_emitted", F.lit(0)).alias("n_emitted"),
            F.coalesce("epoch_sum", F.lit(0)).alias("epoch_sum"),
            F.expr(
                "CAST(10000 * COALESCE(n_emitted, 0L) DIV n_docs AS BIGINT)"
            ).alias("eff_rate_bp"),
        )
    )


@register(
    "stats_chi2_srm",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT event_type, user_id,
             (user_id * {_MULT}) % 4294967296 % 2 AS arm
      FROM events WHERE user_id IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             count_if(arm = 0) AS na, count_if(arm = 1) AS nb
      FROM a GROUP BY event_type
    )
    SELECT event_type, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           CAST(CAST(na - nb AS HUGEINT) * (na - nb) * 1000000 // (na + nb)
                AS BIGINT) AS chi2_e6,
           CAST(na - nb AS HUGEINT) * (na - nb) * 1000000 // (na + nb)
             > 3841459 AS srm_flag
    FROM m
    """,
)
def stats_chi2_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch: users hash-bucket into two arms (the
    assignment an experiment platform would use — multiplicative
    key-hash, reproducible across engines and reruns) and each
    event_type's distinct-user split is χ²-tested against 50/50:
    χ² = (na−nb)²/(na+nb) for two equal-expectation cells. A flagged
    split means the bucketing (or exposure logging) is biased and any
    downstream metric comparison is invalid — this is the FIRST gate
    of A/B analysis, before `agg_welch_ttest` runs [P — standard SRM
    practice]. χ²₍₀.₀₅,1₎ = 3.8415; all-integer e6 scaling keeps the
    flag hash-exact.

    Scale shape: one distinct + one agg on (event_type, user) — the
    distinct and the count ride the same exchange. The χ² numerator
    (na−nb)²·1e6 runs decimal(38,0)/HUGEINT (r10 class audit, the r9
    hurst convention): a GROSS mismatch — one arm empty, the exact
    case this gate exists to flag — makes (na−nb)² ≈ n², which crossed
    int64 past |na−nb| ≈ 3.03e6 users on both engines. chi2_e6 output
    stays BIGINT (≤ 1e6·n, representable to ~9e12 users)."""
    e = table(spark, sf_dir, "events")
    # a NULL user has no arm (nullmix fold, §17.1(b)): filtered
    # two-sided — otherwise the NULL arm's group divides by na+nb=0
    # (DuckDB `//0` NULL, ANSI threw) and Spark's NULL-equal distinct
    # counts a "user" DuckDB's count_if never sees
    a = (
        e.filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            "user_id",
            ((F.col("user_id") * F.lit(_MULT)) % F.lit(4294967296) % 2).alias(
                "arm"
            ),
        )
        .distinct()
    )
    m = a.groupBy("event_type").agg(
        F.count_if(F.col("arm") == 0).cast("bigint").alias("na"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("nb"),
    )
    chi2 = F.expr(
        "CAST(na - nb AS DECIMAL(38,0)) * (na - nb) * 1000000 DIV (na + nb)"
    )
    return m.select(
        "event_type",
        "na",
        "nb",
        chi2.cast("bigint").alias("chi2_e6"),
        (chi2 > 3841459).alias("srm_flag"),
    )


_KCORE_K = 5
_KCORE_ROUNDS = 4
# keep the strongest quarter of edges by exact rank (deterministic
# tiebreak) — a MEAN-multiple threshold saturates as SF grows (at sf0.1
# every nation pair trades and no edge clears 1.5x the mean), while the
# top-quarter cut is scale-invariant and leaves a nontrivial 5-core at
# every fixture SF (12/22/20 survivors at sf0.001/0.01/0.1)


def _kcore_round_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS MATERIALIZED (
      SELECT src AS node FROM ee
      WHERE src IN (SELECT node FROM {prev})
        AND dst IN (SELECT node FROM {prev})
      GROUP BY src HAVING COUNT(*) >= {_KCORE_K}
    )"""


@register(
    "graph_kcore",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (ORDER BY w DESC, src, dst) AS rnk,
             COUNT(*) OVER () AS n
      FROM r
    ),
    e0 AS (SELECT src, dst FROM rk WHERE rnk <= (n + 3) // 4),
    ee AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
      ) GROUP BY src, dst
    ),
    a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM ee),
    {rounds}
    SELECT CAST(ar.node AS BIGINT) AS node,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM afinal ar
    JOIN ee ON ee.src = ar.node
    WHERE ee.dst IN (SELECT node FROM afinal)
    GROUP BY ar.node
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-core of the strong-tie trade graph by iterative peeling:
    edges are the strongest quarter of nation trade pairs by exact rank
    (the kNN sparsification `graph_label_propagation` uses produces a
    hub-and-spoke where every core is trivially full or empty, and a
    mean-multiple threshold saturates as the graph densifies with SF);
    repeatedly drop nodes with fewer than k surviving strong
    neighbors. What remains is the
    dense backbone used as the density filter before community /
    influence analysis. Peeling is unrolled to a FIXED round count in
    both engines — deterministic by construction — and a test pins that
    one extra round changes nothing (the fixpoint is reached).

    Scale shape: the SF-scaled work is the same hint-free star fold as
    `graph_pagerank` (facts fold to one weighted edge per node pair,
    folded once and checkpointed; the mean-weight threshold is a 1-row
    broadcast crossJoin); each peel round is then a semi-join + degree
    agg on the |E|-row edge table. Per-round frames are tiny (≤ |V|
    rows) and broadcast naturally under AQE."""
    from ..catalog import table as _table

    li = _table(spark, sf_dir, "lineitem")
    o = _table(spark, sf_dir, "orders")
    c = _table(spark, sf_dir, "customer")
    s = _table(spark, sf_dir, "supplier")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey != s.s_nationkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    n_e = raw.agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as _W

    # the edge table is |V|^2 at most — a single-task rank window over it
    # is fine (post-agg tiny series, per the documented discipline)
    ranked = raw.crossJoin(F.broadcast(n_e)).withColumn(
        "rnk", F.row_number().over(_W.orderBy(F.desc("w"), "src", "dst"))
    )
    e0 = ranked.filter(F.expr("rnk <= (n + 3) DIV 4"))
    ee = (
        e0.select("src", "dst")
        .unionAll(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    alive = ee.select(F.col("src").alias("node")).distinct()
    for _ in range(_KCORE_ROUNDS):
        deg = (
            ee.join(alive, ee.src == alive.node, "left_semi")
            .join(
                alive.select(F.col("node").alias("dnode")),
                F.col("dst") == F.col("dnode"),
                "left_semi",
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.filter(F.col("d") >= _KCORE_K).select(
            F.col("src").alias("node")
        )
    core = alive
    return (
        ee.join(core, ee.src == core.node, "left_semi")
        .join(
            core.select(F.col("node").alias("dnode")),
            F.col("dst") == F.col("dnode"),
            "left_semi",
        )
        .groupBy(F.col("src").cast("bigint").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


# stitch the unrolled-round oracle (template substitution at module
# import keeps the registered SQL a plain string)
def _build_kcore_oracle() -> None:
    rounds = []
    prev = "a0"
    for i in range(1, _KCORE_ROUNDS + 1):
        cur = "afinal" if i == _KCORE_ROUNDS else f"a{i}"
        rounds.append(_kcore_round_sql(prev, cur).strip())
        prev = cur
    from ..registry import _REGISTRY, QuerySpec

    spec = _REGISTRY["graph_kcore"]
    sql = spec.oracle.format(rounds=",\n    ".join(rounds))
    _REGISTRY["graph_kcore"] = QuerySpec(
        key=spec.key, fn=spec.fn, oracle=sql, doc=spec.doc
    )


_build_kcore_oracle()
