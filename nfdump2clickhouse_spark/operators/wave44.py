"""Wave-44 keys (round 5): fixed-width ingest, key=value parsing, LSH
parameter curves, index rebasing, elephant/mice classification.

- ``scan_fixed_width``: fixed-width text ingestion (the mainframe /
  legacy-export record layout) via substring slicing [P].
- ``str_kv_parse``: key=value log-field parsing with `str_to_map`
  [P — the logfmt convention half of ops logging uses].
- ``dedup_lsh_scurve``: the MinHash-LSH S-curve 1−(1−J^r)^b across
  (bands, rows) configs [P — Leskovec/Rajaraman/Ullman, Mining of
  Massive Datasets ch.3] joined against the corpus' measured pair
  mass — the parameter-choice audit for `dedup_minhash_pure`.
- ``ts_index_rebase``: index-100 series rebasing [P — the standard BI
  normalization: every series relative to its first period = 100].
- ``flows_elephant_mice``: elephant/mice flow classification by byte
  decade [P — the canonical heavy-tail traffic taxonomy].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# scan_fixed_width
# ---------------------------------------------------------------------------


@register(
    "scan_fixed_width",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS cents_sum
    FROM events WHERE event_id < 5000 AND event_type IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text ingestion — the mainframe/legacy-export record
    layout (no delimiters; fields live at byte offsets): events render
    to 10+12+12-char records, write as plain text, read back with
    `spark.read.text` + substring slicing, and the rollup is
    hash-verified against the parquet source — the full
    render → write → slice → parse round-trip. COBOL copybooks and
    telecom CDR feeds still arrive exactly like this.

    Rendering is `format_string`/`lpad` codegen; parsing back is
    `substring` + cast codegen — both scan-local, no UDF; plain text
    splits by line so the read parallelizes normally (unlike
    `scan_text_wholefile`'s record-per-file mode). Integer cents
    through the text (`scan_csv_gzip` discipline)."""
    import os
    import tempfile

    ev = (
        table(spark, sf_dir, "events")
        # NULL-type records are rejects in a fixed-width export (the
        # concat'd line would be NULL end-to-end and read back as an
        # unparseable empty line — r8 nullmix sweep); gate both sides
        .filter((F.col("event_id") < 5000) & F.col("event_type").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    line = F.concat(
        F.lpad(F.col("event_type"), 10, " "),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
        F.lpad(F.col("cents").cast("string"), 12, "0"),
    )
    out = os.path.join(tempfile.mkdtemp(prefix="sf_fw_"), "records")
    ev.select(line.alias("value")).write.mode("overwrite").text(out)
    back = spark.read.text(out).select(
        F.trim(F.substring("value", 1, 10)).alias("event_type"),
        F.substring("value", 11, 12).cast("bigint").alias("event_id"),
        F.substring("value", 23, 12).cast("bigint").alias("cents"),
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# str_kv_parse
# ---------------------------------------------------------------------------


@register(
    "str_kv_parse",
    oracle="""
    WITH lines AS (
      SELECT 'type=' || event_type || ' uid=' || CAST(user_id AS VARCHAR)
             || ' cents=' || CAST(CAST(FLOOR(COALESCE(value, 0) * 100)
                                       AS BIGINT) AS VARCHAR) AS logfmt,
             event_id
      FROM events WHERE event_id < 5000
    ),
    parsed AS (
      SELECT event_id,
             regexp_extract(logfmt, 'type=([a-z]+)', 1) AS type_v,
             CAST(regexp_extract(logfmt, 'uid=([0-9]+)', 1) AS BIGINT) AS uid_v,
             CAST(regexp_extract(logfmt, 'cents=([0-9-]+)', 1) AS BIGINT)
               AS cents_v
      FROM lines
    )
    SELECT type_v AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT uid_v) AS BIGINT) AS n_users,
           CAST(SUM(cents_v) AS BIGINT) AS cents_sum
    FROM parsed GROUP BY type_v ORDER BY type_v
    """,
)
def str_kv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logfmt key=value field parsing: render events as
    'type=… uid=… cents=…' lines (the convention half of ops logging
    emits), parse them back with `str_to_map` — Spark's purpose-built
    splitter for exactly this — and hash-verify the rollup against the
    source. The structured-logging sibling of `scan_text_regex_parse`
    (which handles lines that AREN'T this disciplined).

    `str_to_map(s, ' ', '=')` is one codegen expression producing the
    whole field map (no per-field regex passes); typed fields come out
    with `element_at` + cast. The oracle parses the same lines with
    per-field regex — same semantics, each engine on its native
    idiom (§2.8 map-functions note)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 5000)
        .select(
            "event_id",
            F.concat(
                F.lit("type="),
                F.col("event_type"),
                F.lit(" uid="),
                F.col("user_id").cast("string"),
                F.lit(" cents="),
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100)
                .cast("bigint")
                .cast("string"),
            ).alias("logfmt"),
        )
    )
    m = ev.select(F.expr("str_to_map(logfmt, ' ', '=')").alias("kv"))
    parsed = m.select(
        F.element_at("kv", "type").alias("event_type"),
        F.element_at("kv", "uid").cast("bigint").alias("uid"),
        F.element_at("kv", "cents").cast("bigint").alias("cents"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct(F.col("uid")).cast("bigint").alias("n_users"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dedup_lsh_scurve
# ---------------------------------------------------------------------------


@register(
    "dedup_lsh_scurve",
    oracle="""
    WITH cfg(bands, rows_per) AS (VALUES (16, 8), (32, 4), (8, 16)),
    grid AS (SELECT j * 0.05 AS j FROM generate_series(1, 19) AS t(j)),
    curve AS (
      SELECT cfg.bands, cfg.rows_per, grid.j,
             1 - POW(1 - POW(grid.j, cfg.rows_per), cfg.bands) AS p_detect
      FROM cfg CROSS JOIN grid
    )
    SELECT CAST(bands AS INT) AS bands,
           CAST(rows_per AS INT) AS rows_per,
           ROUND(j, 2) AS jaccard,
           ROUND(p_detect, 4) AS p_detect
    FROM curve ORDER BY bands, rows_per, jaccard
    """,
)
def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH S-curve: detection probability
    1 − (1 − J^r)^b over a Jaccard grid for three (bands, rows)
    budgets sharing 128 hashes — 16×8 (the `dedup_minhash_pure`
    config), 32×4 (recall-leaning) and 8×16 (precision-leaning). The
    curve IS the parameter decision: where it crosses 0.5 is the
    effective threshold, its steepness is the false-positive/negative
    trade — this key makes that choice auditable next to the measured
    `dedup_threshold_curve`.

    Pure deterministic arithmetic over a 3×19 literal grid (pow is
    engine-identical for these operands) — zero table input by design:
    the S-curve is a property of the INDEX, not the corpus, which is
    exactly why it can be tuned before touching 100 TB. (sf_dir is
    accepted and unused — the registry contract.)"""
    cfg = spark.createDataFrame(
        [(16, 8), (32, 4), (8, 16)], "bands int, rows_per int"
    )
    grid = spark.range(1, 20).select((F.col("id") * 0.05).alias("j"))
    curve = cfg.crossJoin(F.broadcast(grid)).select(
        "bands",
        "rows_per",
        F.round("j", 2).alias("jaccard"),
        F.round(
            1 - F.pow(1 - F.pow(F.col("j"), F.col("rows_per")), F.col("bands")), 4
        ).alias("p_detect"),
    )
    return curve.orderBy("bands", "rows_per", "jaccard")


# ---------------------------------------------------------------------------
# ts_index_rebase
# ---------------------------------------------------------------------------


@register(
    "ts_index_rebase",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT)) AS rev
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    based AS (
      SELECT event_type, day, rev,
             FIRST_VALUE(rev) OVER (PARTITION BY event_type ORDER BY day)
               AS base
      FROM daily
    )
    SELECT event_type, day,
           ROUND(100.0 * rev / base, 4) AS index_100
    FROM based ORDER BY event_type, day
    """,
)
def ts_index_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-100 rebasing: every type's daily revenue relative to its
    OWN first day = 100 — the BI normalization that puts series of
    wildly different magnitudes on one chart and turns 'purchase makes
    10× click's revenue' into 'purchase grew 12% while click fell 3%'.
    Day 1 is exactly 100 for every series (pinned).

    One day-grain integer aggregate, then FIRST_VALUE over each type's
    bounded day partition — two exchanges; integer cents keep the
    base and numerator engine-exact before the single display
    division."""
    daily = (
        table(spark, sf_dir, "events")
        # two-sided gate: a NULL-ts row has no day to index — and under
        # mixed NULLs Spark's ASC window puts the NULL day FIRST (it
        # would become every series' base) where DuckDB puts it last
        # (r8 nullmix sweep)
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast("bigint")
            ).alias("rev")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    based = daily.withColumn("base", F.first("rev").over(w))
    return based.select(
        "event_type",
        "day",
        # try_divide: a base day of exactly 0 cents leaves the index
        # undefined (NULL), matching DuckDB x/0
        F.round(F.try_divide(100.0 * F.col("rev"), F.col("base")), 4).alias(
            "index_100"
        ),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# flows_elephant_mice
# ---------------------------------------------------------------------------


@register(
    "flows_elephant_mice",
    oracle="""
    WITH f AS (
      SELECT CAST(FLOOR(COALESCE(value, 0) * 1000) AS BIGINT) AS ibyt
      FROM events WHERE COALESCE(value, 0) > 0
    ),
    classed AS (
      SELECT ibyt,
             CASE WHEN ibyt >= 100000 THEN 'elephant'
                  WHEN ibyt >= 10000 THEN 'medium'
                  ELSE 'mouse' END AS cls
      FROM f
    ),
    agg AS (
      SELECT cls, COUNT(*) AS n_flows, SUM(ibyt) AS bytes FROM classed
      GROUP BY cls
    ),
    tot AS (
      SELECT cls, n_flows, bytes,
             SUM(n_flows) OVER () AS tf, SUM(bytes) OVER () AS tb
      FROM agg
    )
    SELECT cls,
           CAST(n_flows AS BIGINT) AS n_flows,
           CAST(bytes AS BIGINT) AS bytes,
           CAST(10000 * n_flows // tf AS BIGINT) AS flow_share_bp,
           CAST(10000 * bytes // tb AS BIGINT) AS byte_share_bp
    FROM tot ORDER BY cls
    """,
)
def flows_elephant_mice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elephant/mice flow taxonomy: flows classed by byte size
    (mouse < 10 KB ≤ medium < 100 KB ≤ elephant) with each class's
    share of FLOWS vs share of BYTES — the canonical heavy-tail
    traffic fact (a few elephants carry most bytes; most flows are
    mice) that drives QoS, sampling-rate and cache design. The
    categorical summary of what `agg_log_histogram` shows per decade
    and `agg_pareto_8020` scores for users.

    Scan-local classification codegen; one 3-group aggregate; shares
    from windows over the 3-row class table; all-integer bp."""
    f = (
        table(spark, sf_dir, "events")
        .filter(F.coalesce(F.col("value"), F.lit(0)) > 0)
        .select(
            F.floor(F.col("value") * 1000).cast("bigint").alias("ibyt")
        )
    )
    cls = (
        F.when(F.col("ibyt") >= 100000, "elephant")
        .when(F.col("ibyt") >= 10000, "medium")
        .otherwise("mouse")
    )
    agg = f.select(cls.alias("cls"), "ibyt").groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_flows"), F.sum("ibyt").alias("bytes")
    )
    wt = Window.partitionBy()
    t = agg.withColumn("tf", F.sum("n_flows").over(wt)).withColumn(
        "tb", F.sum("bytes").over(wt)
    )
    return t.select(
        "cls",
        F.col("n_flows").cast("bigint").alias("n_flows"),
        F.col("bytes").cast("bigint").alias("bytes"),
        F.expr("10000 * n_flows DIV tf").cast("bigint").alias("flow_share_bp"),
        F.expr("10000 * bytes DIV tb").cast("bigint").alias("byte_share_bp"),
    ).orderBy("cls")
