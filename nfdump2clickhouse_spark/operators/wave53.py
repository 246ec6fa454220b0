"""Wave-53 key (round 10): the §17.2 #1 registry-growth key.

- ``filter_nfdump_extended``: nfdump's EXTENDED filter-language
  primaries — tos / AS-number / interface / forwarding-status — parsed
  by ``functions.nffilter.compile_filter(text, extended=True)`` and
  executed end-to-end over a widened flow table [P — nfdump's published
  filter grammar (nfdump(1) man page: `tos`, `as`, `in if`/`out if`,
  `fwdstat`) against nfdump's public CSV field names
  stos/dtos/sas/das/input/output/fwd]. The frozen §1.2 13-column flow
  contract does NOT carry these columns (VERDICT r6/r7 missing-#3), so
  the key ships its own deterministic widened-fixture derivation
  instead of unfreezing the contract.

Registered mid-list (after wave52, before the wave21/wave9/wave15/
scans expensive tail) per the operators/__init__ placement rule: it is
a cheap hash key, not a stream_* lifecycle demo.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions.nffilter import compile_filter
from ..registry import register

# ---------------------------------------------------------------------------
# filter_nfdump_extended
# ---------------------------------------------------------------------------

#: One widened-flow derivation, written twice: Spark columns in
#: ``ext_flows_from_events`` and the byte-equivalent DuckDB SQL here.
#: Deterministic modular arithmetic over the REAL events parquet — the
#: key's own fixture generator (SURVEY §17.2 #1: "ships its own widened
#: fixture"; the §1.2 contract stays frozen). The r9 dress rehearsal
#: (tests/test_nffilter.py) imports both sides from here.
EXT_DERIVE_SQL = """
    SELECT event_id,
           CAST(64512 + user_id  % 16  AS INT) AS sas,
           CAST(64512 + event_id % 128 AS INT) AS das,
           CAST(event_id % 4 * 8 AS INT)       AS stos,
           CAST(user_id  % 4 * 8 AS INT)       AS dtos,
           CAST(event_id % 8 AS INT)           AS input,
           CAST(user_id  % 8 AS INT)           AS output,
           CAST(event_id % 3 * 64 AS INT)      AS fwd,
           CASE WHEN event_id % 2 = 0 THEN 'TCP' ELSE 'UDP' END AS pr,
           CAST(1024 + event_id % 50000 AS INT) AS sp,
           CAST(CASE event_id % 3 WHEN 0 THEN 443 WHEN 1 THEN 80
                ELSE 53 END AS INT)             AS dp
    FROM events
"""

#: (nfdump filter text, equivalent DuckDB predicate) — every extended
#: primary exercised at least once: tos (src/dst), as (src/any/negated),
#: if (in/out/any), fwdstat, mixed with standard proto/port primaries.
#: Each extended comparison is wrapped COALESCE(cmp, FALSE) to mirror
#: the engine's per-comparison two-valued contract (nffilter.py
#: `two_valued`; nfdump's filter language has no NULLs) — without it,
#: `not as`/`not out if` silently drop NULL-field rows under SQL
#: three-valued logic (nullmix edge mode). pr/dp derive from the
#: non-null primary key, so the standard primaries stay bare.
EXT_CASES: list[tuple[str, str]] = [
    (
        "src as 64512 and out if 0",
        "COALESCE(sas = 64512, FALSE) AND COALESCE(output = 0, FALSE)",
    ),
    (
        "dst tos > 8 or fwdstat 64",
        "COALESCE(dtos > 8, FALSE) OR COALESCE(fwd = 64, FALSE)",
    ),
    (
        "as 64513",
        "(COALESCE(sas = 64513, FALSE) OR COALESCE(das = 64513, FALSE))",
    ),
    (
        "not as 64513",
        "NOT (COALESCE(sas = 64513, FALSE) OR COALESCE(das = 64513, FALSE))",
    ),
    ("in if 4 and proto tcp", "COALESCE(input = 4, FALSE) AND pr = 'TCP'"),
    ("if 3", "(COALESCE(input = 3, FALSE) OR COALESCE(output = 3, FALSE))"),
    (
        "tos 16 and dst port 443",
        "COALESCE(stos = 16, FALSE) AND dp = 443",
    ),
    (
        "fwdstat > 0 and not out if 7",
        "COALESCE(fwd > 0, FALSE) AND NOT COALESCE(output = 7, FALSE)",
    ),
]


def ext_flows_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of ``EXT_DERIVE_SQL`` — column-for-column."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.lit(64512) + F.col("user_id") % 16).cast("int").alias("sas"),
        (F.lit(64512) + F.col("event_id") % 128).cast("int").alias("das"),
        (F.col("event_id") % 4 * 8).cast("int").alias("stos"),
        (F.col("user_id") % 4 * 8).cast("int").alias("dtos"),
        (F.col("event_id") % 8).cast("int").alias("input"),
        (F.col("user_id") % 8).cast("int").alias("output"),
        (F.col("event_id") % 3 * 64).cast("int").alias("fwd"),
        F.when(F.col("event_id") % 2 == 0, "TCP").otherwise("UDP").alias("pr"),
        (F.lit(1024) + F.col("event_id") % 50000).cast("int").alias("sp"),
        F.when(F.col("event_id") % 3 == 0, 443)
        .when(F.col("event_id") % 3 == 1, 80)
        .otherwise(53)
        .cast("int")
        .alias("dp"),
    )


def _ext_oracle() -> str:
    """Build the oracle from the SAME case list the engine compiles —
    one aggregate row over one scan, unpivoted with a VALUES ladder
    (the `stats_corr_matrix` oracle shape)."""
    aggs = []
    n_case, s_case, values = [], [], []
    for i, (text, pred) in enumerate(EXT_CASES):
        # COALESCE: DuckDB count_if over ZERO rows is NULL where Spark's
        # is 0 (§5.5 convention — the empty edge mode)
        aggs.append(f"CAST(COALESCE(count_if({pred}), 0) AS BIGINT) AS n{i}")
        aggs.append(
            f"CAST(SUM(CASE WHEN {pred} THEN CAST(event_id AS HUGEINT) END)"
            f" AS BIGINT) AS s{i}"
        )
        n_case.append(f"WHEN {i} THEN a.n{i}")
        s_case.append(f"WHEN {i} THEN a.s{i}")
        values.append(f"({i}, '{text}')")
    return f"""
    WITH f AS ({EXT_DERIVE_SQL}),
    a AS (
      SELECT {', '.join(aggs)}
      FROM f
    )
    SELECT p.predicate,
           CASE p.i {' '.join(n_case)} END AS n_matched,
           CASE p.i {' '.join(s_case)} END AS id_sum
    FROM a, (VALUES {', '.join(values)}) AS p(i, predicate)
    ORDER BY p.predicate
    """


@register("filter_nfdump_extended", oracle=_ext_oracle())
def filter_nfdump_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nfdump extended filter language end-to-end: tos / AS / interface
    / forwarding-status predicates (`compile_filter(extended=True)`,
    nfdump's published grammar) evaluated over the widened flow table
    derived deterministically from the events parquet, one summary row
    per filter text with its match count and exact match-set id sum.

    Plan shape: ONE scan of the fact table; all 8 compiled predicates
    run as parallel conditional aggregates (count_if + guarded SUM →
    map-side partials, a single 1-row exchange), then the row is
    unpivoted driver-free with `stack`. At 100 TB this is one pass over
    the corpus — per-predicate re-scans would be 8× the IO. The id sums
    accumulate in decimal(38,0) engine-side / HUGEINT oracle-side (the
    r9 hurst convention) with the final cast BIGINT — representable
    while Σ event_id < 2^63, the documented bound shared with
    `stats_ks_test.max_diff`.

    Degenerate-input parity: a global Spark aggregate emits its one row
    even over an EMPTY scan, and so does DuckDB's — both sides unpivot
    to 8 rows with n_matched = 0 (oracle count_if COALESCE-guarded,
    §5.5) and id_sum NULL (SUM over no rows). A NULL user_id (nullmix
    mode — the bad-exporter day) NULLs sas/dtos/output; the engine's
    extended primaries evaluate two-valued via coalesce(cmp, False)
    per the r9 nffilter contract, and the oracle predicates carry the
    SAME per-comparison COALESCE so negations agree."""
    flows = ext_flows_from_events(spark, sf_dir)
    aggs = []
    for i, (text, _pred) in enumerate(EXT_CASES):
        pred = compile_filter(text, extended=True)
        aggs.append(F.count_if(pred).alias(f"n{i}"))
        aggs.append(
            F.sum(
                F.when(pred, F.col("event_id").cast("decimal(38,0)"))
            )
            .cast("bigint")
            .alias(f"s{i}")
        )
    one = flows.agg(*aggs)
    stack = ", ".join(
        f"'{text}', n{i}, s{i}" for i, (text, _p) in enumerate(EXT_CASES)
    )
    return one.select(
        F.expr(
            f"stack({len(EXT_CASES)}, {stack})"
            " AS (predicate, n_matched, id_sum)"
        )
    ).orderBy("predicate")
