"""Wave-31 keys (round 5): PPS sampling, variance-equality testing,
lift/gains curves, CUSUM drift detection, WordPiece encoding.

- ``sample_ppswor``: probability-proportional-to-size sampling WITHOUT
  replacement via the Efraimidis–Spirakis exponential-key method
  [P — Efraimidis & Spirakis 2006], with deterministic multiplicative-
  hash uniforms so reruns/backfills select the same rows.
- ``stats_levene_test``: Brown–Forsythe variance-equality test (Levene
  with median centers) [P — Brown & Forsythe 1974] — the
  heteroscedasticity gate before trusting `stats_anova_f`.
- ``ml_eval_lift``: decile gains/lift table [P — standard campaign-
  targeting evaluation]: cumulative capture rate and lift per score
  decile.
- ``ts_cusum_anomaly``: one-sided CUSUM drift detection on daily
  series [P — Page 1954], expressed CLOSED-FORM as cumulative-sum
  minus running-minimum (no recursion, no UDF).
- ``tokenizer_wordpiece_apply``: WordPiece greedy longest-match-first
  encoding [P — Wu et al. 2016, BERT tokenizer] — the fourth member of
  the tokenizer family (BPE train / BPE apply / unigram-LM EM / this).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import register

_MULT = 2654435761  # Knuth multiplicative hash (shared with sample_hash_bucket)
_M32 = 4294967296

# ---------------------------------------------------------------------------
# sample_ppswor
# ---------------------------------------------------------------------------


@register(
    "sample_ppswor",
    oracle=f"""
    WITH scored AS (
      SELECT o_orderkey,
             ROUND(o_totalprice, 4) AS weight,
             -LN(((o_orderkey * {_MULT}) % {_M32} + 1.0) / ({_M32} + 1.0))
               / o_totalprice AS es_key
      FROM orders
    ),
    r AS (
      SELECT o_orderkey, weight,
             ROW_NUMBER() OVER (ORDER BY ROUND(es_key, 9), o_orderkey) AS rn
      FROM scored
    )
    SELECT o_orderkey, weight FROM r WHERE rn <= 200
    """,
)
def sample_ppswor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS-without-replacement sample of 200 orders, weight =
    o_totalprice, via Efraimidis–Spirakis: each row draws an
    exponential key -ln(u)/w and the n SMALLEST keys win — exactly a
    weighted without-replacement draw. The uniform u is a pure function
    of the key (Knuth multiplicative hash, the `sample_hash_bucket`
    discipline), so the sample is reproducible across engines, reruns
    and backfills — `df.sample()` is neither.

    The ES key is scan-local codegen arithmetic; selection is a global
    top-n that Catalyst executes as TakeOrderedAndProject (map-side
    partial top-200 per partition, then a 200·P-row merge — plan-pinned;
    no global sort materializes). Keys are rounded to 1e-9 before
    comparison with the order key as tiebreak, so a last-ulp ln()
    divergence between engines cannot flip the boundary."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    u = ((F.col("o_orderkey") * F.lit(_MULT)) % F.lit(_M32) + F.lit(1.0)) / F.lit(
        float(_M32 + 1)
    )
    es_key = -F.log(u) / F.col("o_totalprice")
    scored = o.select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("weight"),
        F.round(es_key, 9).alias("es_r"),
    )
    return (
        scored.orderBy("es_r", "o_orderkey")
        .limit(200)
        .select("o_orderkey", "weight")
    )


# ---------------------------------------------------------------------------
# stats_levene_test
# ---------------------------------------------------------------------------


@register(
    "stats_levene_test",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type, ABS(e.value - m.med) AS z
      FROM events e JOIN med m USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    g AS (
      SELECT event_type, COUNT(*) AS n, SUM(z) AS sz, SUM(z * z) AS szz
      FROM z GROUP BY event_type
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(sz) AS tsz,
             SUM(sz * sz / n) AS sbetween_part,
             SUM(szz - sz * sz / n) AS ss_within
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nn AS BIGINT) AS n_total,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(nn - k AS BIGINT) AS df2,
           ROUND(
             ((nn - k) * (sbetween_part - tsz * tsz / nn))
             / ((k - 1) * ss_within), 4
           ) AS levene_w
    FROM tot
    """,
)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-equality test across event types:
    absolute deviations from the per-group MEDIAN (the robust Levene
    center), then the one-way ANOVA F statistic on those deviations —
    W = ((N−k)/(k−1)) · SS_between(z) / SS_within(z). This is the
    gate that decides whether `stats_anova_f` / pooled-variance t-tests
    are trustworthy.

    Exact medians come from one `percentile` aggregate (k rows,
    broadcast back); W assembles from map-side-combinable (n, Σz, Σz²)
    partials and one 1-row total — SS_between = Σ n_j z̄_j² − N z̄² and
    SS_within = Σ(Σz² − (Σz)²/n) expand so no second data pass is
    needed. DuckDB mirrors the identical expansion, so both engines do
    the same float ops in the same order."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    n, sz, szz = F.col("n"), F.col("sz"), F.col("szz")
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(n).alias("nn"),
        F.sum(sz).alias("tsz"),
        F.sum(sz * sz / n).alias("sbetween_part"),
        F.sum(szz - sz * sz / n).alias("ss_within"),
    )
    k, nn = F.col("k"), F.col("nn")
    return tot.select(
        k.cast("bigint").alias("k_groups"),
        nn.cast("bigint").alias("n_total"),
        (k - 1).cast("bigint").alias("df1"),
        (nn - k).cast("bigint").alias("df2"),
        F.round(
            # try_divide: k==1 or all singleton groups make the
            # denominator 0 -> W undefined -> NULL, matching DuckDB's
            # NULL-on-zero-divisor division (r7 edge sweep)
            F.try_divide(
                (nn - k)
                * (F.col("sbetween_part") - F.col("tsz") * F.col("tsz") / nn),
                (k - 1) * F.col("ss_within"),
            ),
            4,
        ).alias("levene_w"),
    )


# ---------------------------------------------------------------------------
# ml_eval_lift
# ---------------------------------------------------------------------------


@register(
    "ml_eval_lift",
    oracle="""
    WITH scored AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             NTILE(10) OVER (ORDER BY value DESC, event_id) AS decile
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT decile, COUNT(*) AS n, SUM(label) AS pos
      FROM scored GROUP BY decile
    ),
    c AS (
      SELECT decile, n, pos,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(pos) OVER (ORDER BY decile) AS cum_pos,
             SUM(n) OVER () AS tot_n,
             SUM(pos) OVER () AS tot_pos
      FROM d
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS positives,
           ROUND(cum_pos * 1.0 / tot_pos, 4) AS cum_capture,
           ROUND((cum_pos * 1.0 / cum_n) / (tot_pos * 1.0 / tot_n), 4)
             AS cum_lift
    FROM c ORDER BY decile
    """,
)
def ml_eval_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table for a scored binary outcome (score =
    event value, positive = purchase): rows rank into score deciles
    (NTILE over a uniquely-tiebroken order), and each decile reports
    its cumulative capture rate (share of all positives reached) and
    cumulative lift vs the base rate — the campaign-targeting question
    'how much better than random are my top-k%?'.

    NTILE's floor-based equal split is engine-identical given the
    unique (score desc, event_id) order — but a literal
    `ntile() OVER (ORDER BY ...)` is an unpartitioned data-sized
    window (one task sorts everything), so the decile assignment uses
    `functions.distributed.binned_exact_ntile`: the in-plan binned
    global rank + all-integer tile arithmetic, bit-identical to SQL
    NTILE with NO single-task sort (r12, VERDICT r11 next-#4: the
    sampler machinery's serial driver chain collapses to ONE executed
    job; desc order bins on the negated parquet-footer bounds of
    `value`; the label column rides only the main arm — the offsets
    arm re-plans as a narrow (value, event_id) scan, the documented
    demand-asymmetry tradeoff). The gains table itself is 10 rows, so
    the cumulative windows and totals are bounded."""
    from ..catalog import parquet_column_stats
    from ..functions.distributed import binned_exact_ntile

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    lab = ev.select(
        "event_id",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    stats = parquet_column_stats(sf_dir, "events", "value")
    lo = hi = None  # stats-less footer: in-plan broadcast bounds
    if stats is not None and stats[0] is not None and stats[1] is not None:
        lo, hi = stats[0], stats[1]
    scored = binned_exact_ntile(
        lab, 10, "value", ["event_id"], "decile", lo, hi, desc=True
    ).select("label", "decile")
    d = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = d.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wt).alias("tot_n"),
        F.sum("pos").over(wt).alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("bigint").alias("n"),
        F.col("pos").cast("bigint").alias("positives"),
        # try_divide: zero positives make capture/lift undefined -> NULL,
        # matching DuckDB's NULL-on-zero-divisor division (r7 edge sweep)
        F.round(F.try_divide(F.col("cum_pos") * 1.0, F.col("tot_pos")), 4).alias(
            "cum_capture"
        ),
        F.round(
            F.try_divide(
                F.col("cum_pos") * 1.0 / F.col("cum_n"),
                F.col("tot_pos") * 1.0 / F.col("tot_n"),
            ),
            4,
        ).alias("cum_lift"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# ts_cusum_anomaly
# ---------------------------------------------------------------------------


@register(
    "ts_cusum_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    m AS (
      -- HUGEINT squares: daily counts grow with corpus volume and the
      -- BIGINT product crosses int64 near 3e9 events/day — ~100 TB flow
      -- volume (the r9 agg_hurst_exponent find, same class)
      SELECT event_type, COUNT(*) AS nd, SUM(cnt) AS s,
             SUM(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS ss
      FROM daily GROUP BY event_type
    ),
    z AS (
      SELECT d.event_type, d.day,
             d.cnt,
             (d.cnt - s * 1.0 / nd)
               / SQRT((ss - s * 1.0 * s / nd) / (nd - 1)) - 0.5 AS dz
      FROM daily d JOIN m USING (event_type)
    ),
    p0 AS (
      SELECT event_type, day, cnt,
             SUM(dz) OVER (PARTITION BY event_type ORDER BY day) AS pt
      FROM z
    ),
    p AS (
      SELECT event_type, day, cnt, pt,
             MIN(pt) OVER (PARTITION BY event_type ORDER BY day) AS mt
      FROM p0
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(cnt AS BIGINT) AS cnt,
           ROUND(pt - LEAST(0, mt), 4) + 0 AS cusum,
           CAST(pt - LEAST(0, mt) > 3.0 AS BOOLEAN) AS is_drift
    FROM p ORDER BY event_type, day
    """,
)
def ts_cusum_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector on daily event counts per type
    (reference k = 0.5σ above mean, threshold h = 3σ, in standardized
    units). The textbook recursion S_t = max(0, S_{t-1} + z_t − k) is
    not a window aggregate — but it has the exact closed form
    S_t = P_t − min(0, min_{j≤t} P_j) where P is the plain cumulative
    sum of (z − k), so the whole detector is two stacked window
    functions: a running sum and a running min over it. No recursion,
    no UDF, no per-group iteration.

    Group moments come from integer-exact (n, Σc, Σc²) partials, so
    both engines standardize with bit-identical doubles. The windows
    partition by event_type — one hash exchange for the daily rollup,
    one for the windows. DuckDB rejects nested window calls, so the
    oracle stages P_t in a CTE (§8 catalog)."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("cnt").alias("s"),
        # decimal(19,0) squares (r9, the agg_hurst_exponent class): the
        # BIGINT product crosses int64 near 3e9 events/day — ~100 TB
        # flow volume; HUGEINT-mirrored in the oracle, one double
        # conversion at the subtraction as before
        F.sum(
            F.col("cnt").cast("decimal(19,0)")
            * F.col("cnt").cast("decimal(19,0)")
        ).alias("ss"),
    )
    nd, s, ss = F.col("nd"), F.col("s"), F.col("ss")
    z = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        "cnt",
        (
            # try_divide twice: a single day (nd==1) or zero variance
            # leaves z undefined -> NULL, matching DuckDB's
            # NULL-on-zero-divisor division (r7 edge sweep)
            F.try_divide(
                F.col("cnt") - s * 1.0 / nd,
                F.sqrt(F.try_divide(ss - s * 1.0 * s / nd, nd - 1)),
            )
            - F.lit(0.5)
        ).alias("dz"),
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    p = z.withColumn("pt", F.sum("dz").over(wd)).withColumn(
        "mt", F.min("pt").over(wd)
    )
    cusum = F.col("pt") - F.least(F.lit(0.0), F.col("mt"))
    # day emitted as a STRING: DuckDB's DATE round-trips to pandas as
    # datetime64 when the source ts is ns-precision (fixture-dependent),
    # which canonicalizes differently from Spark's datetime.date
    return p.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.round(cusum, 4) + F.lit(0)).alias("cusum"),
        (cusum > 3.0).alias("is_drift"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# tokenizer_wordpiece_apply
# ---------------------------------------------------------------------------


def wordpiece_encode(word: str, vocab: set[str], max_len: int = 100) -> list[str]:
    """Reference WordPiece greedy longest-match-first encode (BERT
    semantics): repeatedly take the LONGEST vocab piece that prefixes
    the remainder, continuation pieces carry the '##' prefix, and a
    word with any unmatchable remainder encodes to ['[UNK]']."""
    if len(word) > max_len:
        return ["[UNK]"]
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return ["[UNK]"]
        pieces.append(cur)
        start = end
    return pieces


def build_wordpiece_vocab(spark: SparkSession, sf_dir: str, top_words: int = 10) -> list[str]:
    """Deterministic corpus-derived vocab: every single character seen
    (both word-initial and '##' continuation forms) + the `top_words`
    most frequent whole words (freq desc, word asc tiebreak) — the
    shape a real WordPiece trainer converges to, built with one
    aggregate + one TakeOrderedAndProject."""
    from ..functions.text import words as _words

    tok = (
        table(spark, sf_dir, "documents")
        .select(F.explode(_words(F.lower(F.col("text")))).alias("word"))
    )
    top = [
        r["word"]
        for r in tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(top_words)
        .collect()
    ]
    chars = sorted(
        {
            ch
            for r in tok.select(
                F.explode(F.split(F.col("word"), "(?!^)")).alias("ch")
            )
            .filter(F.col("ch") != "")
            .distinct()
            .collect()
            for ch in [r["ch"]]
        }
    )
    return sorted(set(top) | set(chars) | {"##" + c for c in chars})


@register("tokenizer_wordpiece_apply")  # rows-only: vocab is corpus-derived
def tokenizer_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece encoding economics per source: encode every document
    with greedy longest-match-first over a deterministic corpus-derived
    vocab (all chars + top-10 words; the synthetic corpus has ~31
    distinct words, so the other ~21 genuinely split into pieces) and report token counts, tokens
    per word, and the share of words that fell back to [UNK]. The
    fourth tokenizer-family member — BPE learns merges bottom-up,
    WordPiece consumes a vocab top-down.

    The vocab is tiny driver state broadcast into ONE Arrow-batched
    pandas UDF; encoding is embarrassingly row-parallel (zero shuffles
    before the per-source agg). The UDF encodes each DISTINCT word
    once per batch via a local memo — the corpus repeats words heavily,
    so the hot loop runs on the vocabulary, not the token stream."""
    from pyspark.sql.functions import pandas_udf

    vocab = set(build_wordpiece_vocab(spark, sf_dir))

    @pandas_udf("struct<n_words: long, n_tokens: long, n_unk_words: long>")
    def wp_stats(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, tuple[int, int]] = {}

        def word_stats(w: str) -> tuple[int, int]:
            got = memo.get(w)
            if got is None:
                enc = wordpiece_encode(w, vocab)
                got = (len(enc), 1 if enc == ["[UNK]"] else 0)
                memo[w] = got
            return got

        rows = []
        for t in texts:
            ws = [w for w in t.lower().split(" ") if w]
            toks = unk = 0
            for w in ws:
                nt, nu = word_stats(w)
                toks += nt
                unk += nu
            rows.append((len(ws), toks, unk))
        return pd.DataFrame(rows, columns=["n_words", "n_tokens", "n_unk_words"])

    # NULL docs have no words to encode — gated before the UDF (None
    # crashes .lower(); EDGE_SWEEP_r10 class A)
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", "text")
    )
    st = docs.select("source", wp_stats("text").alias("s"))
    return (
        st.groupBy("source")
        .agg(
            F.sum("s.n_words").cast("bigint").alias("n_words"),
            F.sum("s.n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("s.n_unk_words").cast("bigint").alias("n_unk_words"),
            F.round(F.sum("s.n_tokens") * 1.0 / F.sum("s.n_words"), 4).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("source")
    )
