"""Behavioral event analytics: cohort retention and ordered-sequence
matching — the ClickHouse event-analytics surface (`retention`,
`sequenceMatch` [P]) that the flows/events table serves, alongside
`events_funnel` (operators/aggregations.py).

Both are single-shuffle conditional aggregations: per-user state is
bounded (a set of active days / an ordered type string), so the
`collect_set`/`collect_list` payloads stay small no matter the corpus
row count — the property that makes these safe at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register


@register(
    "events_retention",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    u AS (
      SELECT user_id, MIN(d) AS cohort, list(d) AS ds FROM d GROUP BY user_id
    )
    SELECT CAST(cohort AS VARCHAR) AS cohort,
           COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN list_contains(ds, cohort + 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
           CAST(SUM(CASE WHEN list_contains(ds, cohort + 7)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_d7,
           ROUND(SUM(CASE WHEN list_contains(ds, cohort + 1)
                     THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS d1_rate,
           ROUND(SUM(CASE WHEN list_contains(ds, cohort + 7)
                     THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS d7_rate
    FROM u GROUP BY cohort
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention table (ClickHouse `retention()` [P]): users
    grouped by first-seen day; for each cohort, how many came back on
    day 1 and day 7. Two aggregations but the second reuses the first's
    hash partitioning on `user_id` (Catalyst exchange reuse): the
    per-user day set is `collect_set` of calendar DATEs — bounded by the
    retention horizon (≤ ~30 here, ≤ 90 under the flows TTL [P §2.1]),
    never by event count, so the aggregation buffer is O(days) per user
    at any corpus scale. Day flags are then `array_contains` lookups —
    no self-join of events against events, which is the naive (and at
    100 TB unrunnable) formulation of retention."""
    e = table(spark, sf_dir, "events")
    d = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    u = d.groupBy("user_id").agg(
        F.min("d").alias("cohort"), F.collect_set("d").alias("ds")
    )
    d1 = F.when(
        F.array_contains("ds", F.date_add(F.col("cohort"), 1)), 1
    ).otherwise(0)
    d7 = F.when(
        F.array_contains("ds", F.date_add(F.col("cohort"), 7)), 1
    ).otherwise(0)
    # cohort rendered as an ISO string: DATE round-trips through the two
    # engines' pandas bridges differently (date vs midnight timestamp)
    return u.groupBy(F.col("cohort").cast("string").alias("cohort")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(d1).alias("n_d1"),
        F.sum(d7).alias("n_d7"),
        F.round(F.sum(d1) * 1.0 / F.count(F.lit(1)), 4).alias("d1_rate"),
        F.round(F.sum(d7) * 1.0 / F.count(F.lit(1)), 4).alias("d7_rate"),
    )


@register(
    "events_sequence_match",
    oracle="""
    WITH s AS (
      SELECT user_id, COUNT(*) AS n_events,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CASE WHEN regexp_matches(seq, 's.*c.*p')
                THEN 1 ELSE 0 END AS matched
    FROM s
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-pattern match over each user's event stream (ClickHouse
    `sequenceMatch('(?1).*(?2).*(?3)')` [P]): did signup → click →
    purchase happen in time order? The per-user stream is materialized
    as a compact type-initial string ('scvpe…') via
    `array_sort(collect_list(struct(ts_us, event_id, type)))` — struct
    sort gives (time, unique-id) ordering with no window shuffle — and
    the pattern is one `rlike` over that string, so arbitrary regex
    sequences (not just subsequence-exists, which a conditional-min
    funnel can answer) run in the same single-shuffle plan. Timestamps
    compare as `unix_micros` and carry the `event_id` tiebreaker
    (SURVEY §5.3.2-3). Per-user payload is O(events-per-user) — fine
    for interactive streams; for adversarially hot keys, pre-cap with a
    per-user `row_number` limit before collecting."""
    e = table(spark, sf_dir, "events")
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.substring("event_type", 1, 1).alias("c"),
            )
        )
    )
    s = e.groupBy("user_id").agg(evs.alias("evs"))
    seq = F.concat_ws("", F.transform("evs", lambda x: x["c"]))
    return s.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        F.when(seq.rlike("s.*c.*p"), 1).otherwise(0).alias("matched"),
    )


@register(
    "events_path_ngrams",
    oracle="""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS seq
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT substr(seq, i, 3) AS path
      FROM (SELECT seq FROM s WHERE len(seq) >= 3),
           UNNEST(generate_series(1, len(seq) - 2)) AS t(i)
    )
    SELECT path, COUNT(*) AS n
    FROM g GROUP BY path
    ORDER BY n DESC, path LIMIT 5
    """,
)
def events_path_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common 3-step behavioral paths across all user streams —
    the 'what do users do next' query behind path-flow dashboards.
    Reuses the sequence-string trick (`events_sequence_match`): per-user
    ordered type string, sliding 3-grams via a `transform(sequence(…))`
    HOF (array allocation is per-user-stream, not per-corpus), explode,
    count, keyed top-5. Two shuffles (per-user collect, trigram count) +
    a `TakeOrderedAndProject` — no window over the global trigram set.
    The top-5 order carries the `path` tiebreaker so the result set is
    deterministic (SURVEY §5.3.4)."""
    e = table(spark, sf_dir, "events")
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.substring("event_type", 1, 1).alias("c"),
            )
        )
    )
    s = e.groupBy("user_id").agg(evs.alias("evs")).select(
        F.concat_ws("", F.transform("evs", lambda x: x["c"])).alias("seq")
    )
    # explicit len >= 3 guard: Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0] (not empty like generate_series), so short streams must be
    # filtered out, not clamped
    g = s.filter(F.length("seq") >= 3).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(seq) - 2),"
                " i -> substring(seq, i, 3))"
            )
        ).alias("path")
    )
    return (
        g.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(5)
    )


@register(
    "events_dau_wau",
    oracle="""
    WITH dau AS (
      SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY day
    ),
    wau AS (
      SELECT d.day, COUNT(DISTINCT e.user_id) AS wau
      FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events) d
      JOIN events e
        ON date_trunc('day', e.ts) > d.day - INTERVAL 7 DAY
       AND date_trunc('day', e.ts) <= d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(dau.dau * 1.0 / wau.wau, 4) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the front-page
    product metric. The WAU side is a (distinct day) × events range join
    on the day key: the build side is |days| rows (broadcast), and each
    event lands in ≤ 7 day-windows, so the expansion is bounded ×7 — a
    per-day distinct state, never an all-pairs product. The exact
    distinct is two-phase; at 100 TB swap in HLL partials merged across
    the 7-day frame."""
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    dau = e.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    days = e.select("day").distinct().withColumnRenamed("day", "d")
    wau = (
        e.join(
            F.broadcast(days),
            (F.col("day") > F.col("d") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("d", "day")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
    )


@register(
    "events_markov_transition",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 4) AS p
    FROM c
    """,
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: P(next event type |
    current) per user stream (the input to next-action prediction and
    anomaly scoring over flows/event logs). One lead window per user,
    then a |types|²-row aggregate; the probability normalization runs on
    the aggregated matrix, not the raw stream. Ordered by the unique
    event_id so the chain is engine-deterministic."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("p"),
    )
