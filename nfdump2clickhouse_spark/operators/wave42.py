"""Wave-42 keys (round 5): nearest-neighbor matching, entity
resolution, cell suppression, growth accounting, CSV column drift.

- ``stats_nn_matching``: 1-nearest-neighbor score matching
  [P — Rubin 1973; the matching estimator under every observational
  causal study], as a sorted-merge window — no pair join.
- ``dedup_entity_resolution``: blocking + edit-distance entity
  resolution end to end [P — Fellegi & Sunter 1969 pipeline shape].
- ``privacy_cell_suppression``: small-cell suppression for publishable
  reports [P — statistical disclosure control: cells under the
  threshold fold into OTHER, never published alone].
- ``events_growth_accounting``: DAU growth decomposition into new /
  retained / resurrected / churned [P — the standard growth-accounting
  identity: ΔDAU = new + resurrected − churned].
- ``scan_csv_column_drift``: the CSV column-order drift trap — Spark
  binds a user schema BY POSITION even with header=true — demonstrated
  and fixed via per-batch header reads + unionByName.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# stats_nn_matching
# ---------------------------------------------------------------------------


@register(
    "stats_nn_matching",
    oracle="""
    WITH u AS (
      SELECT user_id, (user_id % 2 = 0) AS treated,
             ROUND(AVG(value), 6) AS score,
             ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 4)
               AS outcome
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    uu AS (SELECT * FROM u WHERE outcome IS NOT NULL),
    ordered AS (
      SELECT *,
             LAST_VALUE(CASE WHEN NOT treated THEN outcome END IGNORE NULLS)
               OVER (ORDER BY score, user_id
                     ROWS UNBOUNDED PRECEDING) AS ctrl_below_y,
             LAST_VALUE(CASE WHEN NOT treated THEN score END IGNORE NULLS)
               OVER (ORDER BY score, user_id
                     ROWS UNBOUNDED PRECEDING) AS ctrl_below_s,
             FIRST_VALUE(CASE WHEN NOT treated THEN outcome END IGNORE NULLS)
               OVER (ORDER BY score, user_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS ctrl_above_y,
             FIRST_VALUE(CASE WHEN NOT treated THEN score END IGNORE NULLS)
               OVER (ORDER BY score, user_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS ctrl_above_s
      FROM uu
    ),
    matched AS (
      SELECT user_id, score, outcome,
             CASE WHEN ctrl_below_s IS NULL THEN ctrl_above_y
                  WHEN ctrl_above_s IS NULL THEN ctrl_below_y
                  WHEN score - ctrl_below_s <= ctrl_above_s - score
                  THEN ctrl_below_y ELSE ctrl_above_y END AS m_outcome,
             CASE WHEN ctrl_below_s IS NULL THEN ctrl_above_s
                  WHEN ctrl_above_s IS NULL THEN ctrl_below_s
                  WHEN score - ctrl_below_s <= ctrl_above_s - score
                  THEN ctrl_below_s ELSE ctrl_above_s END AS m_score
      FROM ordered WHERE treated
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
           ROUND(AVG(outcome - m_outcome), 4) AS att,
           ROUND(AVG(ABS(score - m_score)), 4) AS mean_score_gap,
           ROUND(AVG(outcome), 4) AS treated_mean,
           ROUND(AVG(m_outcome), 4) AS matched_control_mean
    FROM matched WHERE m_outcome IS NOT NULL
    """,
)
def stats_nn_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-nearest-neighbor matching estimator: every treated user (id
    parity — the demo assignment) is matched to the control user with
    the CLOSEST score (mean event value), and the ATT is the mean
    treated-minus-matched-outcome difference — Rubin-style matching,
    the workhorse of observational causal analysis. The mean score gap
    measures match quality (caliper tuning).

    The naive formulation is a treated×control distance join; here
    both groups merge into ONE score-sorted stream and each treated
    row reads its nearest control from LAST_VALUE(below, IGNORE NULLS)
    and FIRST_VALUE(above) — 1-D nearest neighbor IS a sorted-merge,
    the `join_asof_nearest` lesson applied to causal matching. Scores
    pre-round to 1e-6 so ordering is engine-stable. Scale shape
    (VERDICT r5 wrong-#1: the draft streamed all users through one
    unpartitioned window; r12, VERDICT r11 next-#4: the sampler
    machinery's localCheckpoint + boundary sample + per-pid collect
    collapses to ONE executed job): the bin id comes from
    ``functions.distributed.binned_pid`` (in-plan broadcast min/max
    bounds over the derived score — the bounds arm shares the per-user
    rollup's exchange via ReusedExchange), the cross-bin carries (each
    bin's LAST control below / FIRST control above) ride a bounded
    nbins-row window + broadcast join instead of driver literals, and
    the data-sized windows run PARTITIONED BY the bin — the
    `binned_prefix_sums` two-phase trick with last-seen values instead
    of sums."""
    from ..functions.distributed import binned_pid

    u = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(F.avg("value"), 6).alias("score"),
            F.round(
                F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))),
                4,
            ).alias("outcome"),
        )
        .withColumn("treated", F.col("user_id") % 2 == 0)
        .filter(F.col("outcome").isNotNull())
    )
    p = binned_pid(u, "score").repartition("_pid")
    # phase 1 (in-plan): each bin's first/last control row — min_by/
    # max_by with a control-only ordering key (NULL order keys are
    # ignored, so all-treated bins yield NULL structs but still emit
    # their row: every bin present in p joins back), then the bounded
    # nbins-row carry windows (allowlisted: one row per bin)
    ord_key = F.when(
        ~F.col("treated"), F.struct("score", "user_id")
    )
    sy = F.struct(F.col("score").alias("s"), F.col("outcome").alias("y"))
    ends = p.groupBy("_pid").agg(
        F.min_by(sy, ord_key).alias("first_ctrl"),
        F.max_by(sy, ord_key).alias("last_ctrl"),
    )
    prevw = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    nextw = Window.orderBy("_pid").rowsBetween(1, Window.unboundedFollowing)
    offs = ends.select(
        "_pid",
        F.last("last_ctrl", ignorenulls=True).over(prevw).alias("_cb"),
        F.first("first_ctrl", ignorenulls=True).over(nextw).alias("_ca"),
    )
    p = p.join(F.broadcast(offs), "_pid")
    # phase 2: windows PARTITIONED BY the bin id, boundary carries from
    # the broadcast columns
    w = Window.partitionBy("_pid").orderBy("score", "user_id")
    below = w.rowsBetween(Window.unboundedPreceding, 0)
    above = w.rowsBetween(0, Window.unboundedFollowing)
    ctrl_y = F.when(~F.col("treated"), F.col("outcome"))
    ctrl_s = F.when(~F.col("treated"), F.col("score"))
    ordered = p.select(
        "user_id",
        "score",
        "outcome",
        "treated",
        F.coalesce(
            F.last(ctrl_y, ignorenulls=True).over(below), F.col("_cb.y")
        ).alias("ctrl_below_y"),
        F.coalesce(
            F.last(ctrl_s, ignorenulls=True).over(below), F.col("_cb.s")
        ).alias("ctrl_below_s"),
        F.coalesce(
            F.first(ctrl_y, ignorenulls=True).over(above), F.col("_ca.y")
        ).alias("ctrl_above_y"),
        F.coalesce(
            F.first(ctrl_s, ignorenulls=True).over(above), F.col("_ca.s")
        ).alias("ctrl_above_s"),
    ).filter(F.col("treated"))
    use_below = (
        F.col("ctrl_above_s").isNull()
        | (
            F.col("ctrl_below_s").isNotNull()
            & (
                F.col("score") - F.col("ctrl_below_s")
                <= F.col("ctrl_above_s") - F.col("score")
            )
        )
    )
    matched = ordered.select(
        "score",
        "outcome",
        F.when(use_below, F.col("ctrl_below_y"))
        .otherwise(F.col("ctrl_above_y"))
        .alias("m_outcome"),
        F.when(use_below, F.col("ctrl_below_s"))
        .otherwise(F.col("ctrl_above_s"))
        .alias("m_score"),
    ).filter(F.col("m_outcome").isNotNull())
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.round(F.avg(F.col("outcome") - F.col("m_outcome")), 4).alias("att"),
        F.round(F.avg(F.abs(F.col("score") - F.col("m_score"))), 4).alias(
            "mean_score_gap"
        ),
        F.round(F.avg("outcome"), 4).alias("treated_mean"),
        F.round(F.avg("m_outcome"), 4).alias("matched_control_mean"),
    )


# ---------------------------------------------------------------------------
# dedup_entity_resolution
# ---------------------------------------------------------------------------


@register(
    "dedup_entity_resolution",
    oracle="""
    WITH names AS (
      SELECT DISTINCT t.w AS name
      FROM part, UNNEST(string_split(p_name, ' ')) AS t(w)
      WHERE t.w <> '' AND len(t.w) >= 4
    ),
    dirty AS (  -- deterministic corruption: drop the middle character
      SELECT name,
             substr(name, 1, (len(name) - 1) // 2)
               || substr(name, (len(name) - 1) // 2 + 2) AS noisy
      FROM names
    ),
    cand AS (  -- blocking on the first character
      SELECT d.noisy, n.name AS candidate,
             levenshtein(d.noisy, n.name) AS dist
      FROM dirty d JOIN names n
        ON substr(d.noisy, 1, 1) = substr(n.name, 1, 1)
    ),
    best AS (
      SELECT noisy, candidate, dist,
             ROW_NUMBER() OVER (PARTITION BY noisy
                                ORDER BY dist, candidate) AS rn
      FROM cand
    ),
    resolved AS (
      SELECT d.name AS truth, b.candidate, b.dist
      FROM dirty d JOIN best b ON d.noisy = b.noisy AND b.rn = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_entities,
           -- COALESCE: DuckDB count_if is NULL over zero rows, Spark's is 0
           CAST(COALESCE(count_if(candidate = truth), 0) AS BIGINT) AS n_correct,
           CAST(COALESCE(count_if(dist <= 1), 0) AS BIGINT) AS n_within_1,
           ROUND(AVG(dist), 4) AS mean_dist,
           CAST(10000 * count_if(candidate = truth) // COUNT(*) AS BIGINT)
             AS accuracy_bp
    FROM resolved
    """,
)
def dedup_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end (Fellegi–Sunter pipeline shape):
    corrupt every part-name token deterministically (middle character
    dropped — a typo model), then resolve each dirty string back via
    first-letter BLOCKING + Levenshtein argmin, and report resolution
    accuracy against the known truth. The measured-accuracy version of
    what `dedup_phonetic_blocking` (candidate budget) and
    `dedup_fuzzy_levenshtein` (pair scoring) each show half of.

    Blocking keeps the candidate join at Σ O(block²), never
    names×names; edit distance is JVM codegen; the argmin is a
    per-dirty-string WindowGroupLimit window. Deterministic corruption
    means the accuracy is a pure fixture function — reruns and engines
    agree exactly."""
    names = (
        table(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("name"))
        .filter((F.col("name") != "") & (F.length("name") >= 4))
        .distinct()
        .localCheckpoint()  # truth list reused: corruption + candidates
    )
    half = (F.length("name") - 1) / 2
    dirty = names.select(
        "name",
        F.concat(
            F.expr("substr(name, 1, CAST((length(name) - 1) / 2 AS INT))"),
            F.expr("substr(name, CAST((length(name) - 1) / 2 AS INT) + 2)"),
        ).alias("noisy"),
    )
    cand = dirty.select("noisy").join(
        names.withColumnRenamed("name", "candidate"),
        F.substring("noisy", 1, 1) == F.substring("candidate", 1, 1),
    ).select(
        "noisy",
        "candidate",
        F.levenshtein("noisy", "candidate").alias("dist"),
    )
    wb = Window.partitionBy("noisy").orderBy("dist", "candidate")
    best = cand.withColumn("rn", F.row_number().over(wb)).filter(F.col("rn") == 1)
    resolved = dirty.join(best, "noisy").select(
        F.col("name").alias("truth"), "candidate", "dist"
    )
    ok = F.col("candidate") == F.col("truth")
    return resolved.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_entities"),
        F.count_if(ok).cast("bigint").alias("n_correct"),
        F.count_if(F.col("dist") <= 1).cast("bigint").alias("n_within_1"),
        F.round(F.avg("dist"), 4).alias("mean_dist"),
        F.expr(
            # zero entities: accuracy undefined -> NULL, the value DuckDB's
            # `//` yields on a zero divisor (r7 edge sweep — DIV raised)
            "CASE WHEN count(1) = 0 THEN NULL ELSE"
            " 10000 * count_if(candidate = truth) DIV count(1) END"
        )
        .cast("bigint")
        .alias("accuracy_bp"),
    )


# ---------------------------------------------------------------------------
# privacy_cell_suppression
# ---------------------------------------------------------------------------


@register(
    "privacy_cell_suppression",
    oracle="""
    WITH cells AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    published AS (
      SELECT day,
             CASE WHEN n >= 20 THEN event_type ELSE 'OTHER' END AS cell,
             SUM(n) AS n,
             count_if(n < 20) AS n_suppressed_src
      FROM cells GROUP BY 1, 2
    )
    SELECT day, cell, CAST(n AS BIGINT) AS n,
           CAST(n_suppressed_src AS BIGINT) AS n_suppressed_src
    FROM published ORDER BY day, cell
    """,
)
def privacy_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-cell suppression — statistical disclosure control for the
    publishable report: any (day, type) cell under 20 folds into an
    OTHER cell rather than appearing alone, with the suppressed-source
    count carried for auditability; totals are conserved exactly (the
    suite pins Σ published ≡ corpus rows per day). The PUBLICATION-side
    privacy control completing the ladder: k-anonymity/l-diversity/
    t-closeness audit the microdata, the generalization ladder coarsens
    it, this protects the aggregate release itself.

    Two bounded aggregates: the cell rollup, then the fold — both on
    (day, …) keys; all-integer."""
    cells = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    published = (
        cells.groupBy(
            "day",
            F.when(F.col("n") >= 20, F.col("event_type"))
            .otherwise(F.lit("OTHER"))
            .alias("cell"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.count_if(F.col("n") < 20).cast("bigint").alias("n_suppressed_src"),
        )
    )
    return published.orderBy("day", "cell")


# ---------------------------------------------------------------------------
# events_growth_accounting
# ---------------------------------------------------------------------------


@register(
    "events_growth_accounting",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    flags AS (
      SELECT user_id, d,
             MIN(d) OVER (PARTITION BY user_id) AS first_d,
             LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM ud
    ),
    classified AS (
      SELECT strftime(d, '%Y-%m-%d') AS day,
             CASE WHEN d = first_d THEN 'new'
                  WHEN prev_d = d - INTERVAL 1 DAY THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM flags
    ),
    churn AS (
      SELECT strftime(d + INTERVAL 1 DAY, '%Y-%m-%d') AS day,
             COUNT(*) AS churned
      FROM flags f
      WHERE NOT EXISTS (
        SELECT 1 FROM ud u2
        WHERE u2.user_id = f.user_id AND u2.d = f.d + INTERVAL 1 DAY
      )
      AND f.d + INTERVAL 1 DAY <= (SELECT MAX(d) FROM ud)
      GROUP BY 1
    ),
    daily AS (
      SELECT day,
             count_if(status = 'new') AS new_users,
             count_if(status = 'retained') AS retained,
             count_if(status = 'resurrected') AS resurrected,
             COUNT(*) AS dau
      FROM classified GROUP BY day
    )
    SELECT d.day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(d.new_users AS BIGINT) AS new_users,
           CAST(d.retained AS BIGINT) AS retained,
           CAST(d.resurrected AS BIGINT) AS resurrected,
           CAST(COALESCE(c.churned, 0) AS BIGINT) AS churned
    FROM daily d LEFT JOIN churn c USING (day)
    ORDER BY d.day
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: each day's actives decompose into NEW (first
    day ever), RETAINED (also active yesterday) and RESURRECTED (seen
    before, not yesterday), with CHURNED (active yesterday, absent
    today) alongside — the identity ΔDAU = new + resurrected − churned
    that the suite pins. The full decomposition behind
    `events_new_vs_returning` (2-way) and `events_audience_overlap`
    (the retained diagonal only): flat DAU with high new+churn is a
    leaky bucket, and only this view shows it.

    Everything derives from ONE lag/min window pass over the (user,
    day) distinct — the user's own timeline classifies every status
    INCLUDING churn (a user churns at d+1 exactly when their next
    active day ≠ d+1), so there is no day×user anti-join; the oracle's
    NOT EXISTS is the semantic spec, not the plan."""
    ud = (
        table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .localCheckpoint()  # classification + churn + max-day share it
    )
    w = Window.partitionBy("user_id").orderBy("d")
    flags = ud.select(
        "user_id",
        "d",
        F.min("d").over(Window.partitionBy("user_id")).alias("first_d"),
        F.lag("d").over(w).alias("prev_d"),
        F.lead("d").over(w).alias("next_d"),
    ).localCheckpoint()  # classification AND churn read the same windows
    status = (
        F.when(F.col("d") == F.col("first_d"), "new")
        .when(F.col("prev_d") == F.date_sub(F.col("d"), 1), "retained")
        .otherwise("resurrected")
    )
    classified = flags.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"), status.alias("status")
    )
    daily = classified.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.count_if(F.col("status") == "new").alias("new_users"),
        F.count_if(F.col("status") == "retained").alias("retained"),
        F.count_if(F.col("status") == "resurrected").alias("resurrected"),
    )
    max_d = ud.agg(F.max("d").alias("mx"))
    churn = (
        flags.crossJoin(F.broadcast(max_d))
        .filter(
            (F.col("next_d").isNull() | (F.col("next_d") != F.date_add("d", 1)))
            & (F.date_add("d", 1) <= F.col("mx"))
        )
        .groupBy(F.date_format(F.date_add("d", 1), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        daily.join(F.broadcast(churn), "day", "left")
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("new_users").cast("bigint").alias("new_users"),
            F.col("retained").cast("bigint").alias("retained"),
            F.col("resurrected").cast("bigint").alias("resurrected"),
            F.coalesce(F.col("churned"), F.lit(0)).cast("bigint").alias("churned"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# scan_csv_column_drift
# ---------------------------------------------------------------------------


@register("scan_csv_column_drift")  # rows-only: demonstrates a read trap
def scan_csv_column_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV column-order drift trap, demonstrated and fixed: batch 1
    delivers (event_id, value), batch 2 delivers (value, event_id) —
    real exporters do this after 'harmless' upstream changes. Reading
    both with one user schema binds columns BY POSITION (header row or
    not), silently swapping batch 2's fields; the fix reads each batch
    with header inference and merges by NAME (`unionByName`). The key
    reports both pipelines' checksums against the truth — the broken
    path's corruption is visible, the fixed path reconciles exactly
    (suite-pinned).

    Per-batch header reads cost one extra file-open per batch (schema
    from the first line); unionByName is plan-level column alignment,
    zero data movement. The 100 TB note: schema drift belongs in a
    batch manifest, but ingestion must still survive it arriving
    unannounced."""
    import os
    import tempfile

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100)
                .cast("bigint").alias("value_c"))
        .limit(2000)
        .localCheckpoint()
    )
    out = tempfile.mkdtemp(prefix="sf_drift_")
    b1 = os.path.join(out, "batch1")
    b2 = os.path.join(out, "batch2")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.select("event_id", "value_c").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).csv(b1)
    half2.select("value_c", "event_id").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).csv(b2)
    # BROKEN: one positional schema across both batches
    schema = "event_id long, value_c long"
    broken = spark.read.option("header", True).csv([b1, b2], schema=schema)
    # FIXED: infer per batch, merge by name
    f1 = spark.read.option("header", True).option("inferSchema", True).csv(b1)
    f2 = spark.read.option("header", True).option("inferSchema", True).csv(b2)
    fixed = f1.unionByName(f2)
    truth = ev.agg(
        F.sum("event_id").alias("id_sum"), F.sum("value_c").alias("v_sum")
    ).collect()[0]
    rows = []
    for name, df in [("positional_schema", broken), ("union_by_name", fixed)]:
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("id_sum"),
            F.sum("value_c").alias("v_sum"),
        ).collect()[0]
        rows.append(
            (
                name,
                int(agg["n"]),
                # empty batches sum to NULL; 0 keeps the checksum total
                # and lets 0==0 reconcile (r7 edge sweep)
                int(agg["id_sum"] or 0),
                int(agg["v_sum"] or 0),
                bool(
                    (agg["id_sum"] or 0) == (truth["id_sum"] or 0)
                    and (agg["v_sum"] or 0) == (truth["v_sum"] or 0)
                ),
            )
        )
    return spark.createDataFrame(
        rows,
        "pipeline string, n long, id_sum long, v_sum long, reconciles boolean",
    )
