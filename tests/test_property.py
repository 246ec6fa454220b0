"""Property-based cross-engine checks (SURVEY §5.4): randomized filter /
aggregation / grouping queries must agree with DuckDB on the same parquet.

These catch the class of bug the fixed oracle pairs can't: expression
semantics that only diverge on operator/value combinations nobody wrote
down (null comparisons, boundary constants, negated ranges). Kept small
(sf0.001, bounded examples, no shrinking deadline pressure) so the suite
stays fast; crank `max_examples` for a nightly run.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nfdump2clickhouse_spark.catalog import table

from tests.conftest import SMALL_SF_DIR as SF

NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
OPS = ["<", "<=", ">", ">=", "=", "<>"]
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_suppkey"]


@pytest.fixture(scope="module")
def ddb_small():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


# thresholds rounded to 6 decimals: a 17-digit literal is typed DECIMAL(18,17)
# by DuckDB, whose DECIMAL↔DOUBLE comparison rounds differently from Spark's
# double promotion — a literal-typing divergence, not an engine bug (found by
# an earlier run of this very test)
num_pred = st.builds(
    lambda c, op, frac: (
        c,
        op,
        round(NUM_COLS[c][0] + frac * (NUM_COLS[c][1] - NUM_COLS[c][0]), 6),
    ),
    st.sampled_from(sorted(NUM_COLS)),
    st.sampled_from(OPS),
    st.floats(0.0, 1.0, allow_nan=False),
)
str_pred = st.builds(
    lambda c, i, op: (c, op, None, i),
    st.sampled_from(sorted(STR_COLS)),
    st.integers(0, 2),
    st.sampled_from(["=", "<>"]),
)


def _sql_pred(p) -> str:
    if len(p) == 3:
        c, op, v = p
        return f"{c} {op} {v!r}"
    c, op, _, i = p
    return f"{c} {op} '{STR_COLS[c][i % len(STR_COLS[c])]}'"


common = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@common
@given(preds=st.lists(st.one_of(num_pred, str_pred), min_size=1, max_size=3))
def test_random_conjunctive_filters_agree(spark, ddb_small, preds):
    where = " AND ".join(_sql_pred(p) for p in preds)
    expected = ddb_small.execute(f"SELECT COUNT(*) FROM lineitem WHERE {where}").fetchone()[0]
    got = table(spark, SF, "lineitem").filter(F.expr(where)).count()
    assert got == expected, where


@common
@given(
    gcol=st.sampled_from(GROUP_COLS),
    acol=st.sampled_from(sorted(NUM_COLS)),
    pred=num_pred,
)
def test_random_grouped_aggregates_agree(spark, ddb_small, gcol, acol, pred):
    where = _sql_pred(pred)
    q = (
        f"SELECT {gcol} AS g, COUNT(*) AS n, ROUND(SUM({acol}), 2) AS s "
        f"FROM lineitem WHERE {where} GROUP BY {gcol}"
    )
    expected = {
        r[0]: (r[1], r[2]) for r in ddb_small.execute(q).fetchall()
    }
    rows = (
        table(spark, SF, "lineitem")
        .filter(F.expr(where))
        .groupBy(F.col(gcol).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(acol), 2).alias("s"))
        .collect()
    )
    got = {r.g: (r.n, float(r.s)) for r in rows}
    assert got.keys() == expected.keys(), q
    for k in expected:
        en, es = expected[k]
        gn, gs = got[k]
        assert gn == en and abs(gs - float(es)) < 1e-6, (q, k)


@common
@given(
    pred=num_pred,
    gcol=st.sampled_from(["o_orderpriority", "o_orderstatus"]),
)
def test_random_filtered_join_aggregates_agree(spark, ddb_small, pred, gcol):
    """lineitem ⋈ orders under a random lineitem predicate, grouped on an
    orders column — exercises join + filter + agg interplay that the
    fixed-key suite covers only at specific constants."""
    where = _sql_pred(pred)
    q = (
        f"SELECT {gcol} AS g, COUNT(*) AS n FROM lineitem l "
        f"JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"WHERE {where} GROUP BY {gcol}"
    )
    expected = dict(ddb_small.execute(q).fetchall())
    li = table(spark, SF, "lineitem").filter(F.expr(where))
    o = table(spark, SF, "orders")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col(gcol).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r.g: r.n for r in rows}
    assert got == expected, q


WIN_FUNCS = ["row_number()", "rank()", "dense_rank()", "count(*)"]


@common
@given(
    fn=st.sampled_from(WIN_FUNCS),
    gcol=st.sampled_from(["l_returnflag", "l_linestatus"]),
    ocol=st.sampled_from(["l_extendedprice", "l_quantity"]),
    desc=st.booleans(),
)
def test_random_window_ranks_agree(spark, ddb_small, fn, gcol, ocol, desc):
    """Randomized ranking-window queries vs DuckDB: partition key, order
    column, direction, and function drawn at random. The window ORDER BY
    carries enough tiebreakers for a total order within partitions
    (SURVEY §5.3.3). NOTE: (l_orderkey, l_linenumber) is NOT unique in
    the fixtures (the generator reuses keys — found by this very test),
    so results are compared as canonically sorted full tuples, not by
    positional alignment on a non-unique output key."""
    d = "DESC" if desc else "ASC"
    over = (
        f"OVER (PARTITION BY {gcol} ORDER BY {ocol} {d}, "
        f"l_orderkey, l_linenumber, l_partkey, l_suppkey)"
    )
    q = (
        f"SELECT l_orderkey, l_linenumber, l_partkey, {fn} {over} AS w "
        f"FROM lineitem"
    )
    expected = sorted(tuple(r) for r in ddb_small.execute(q).fetchall())
    got = sorted(
        tuple(r)
        for r in spark.sql(
            q.replace("lineitem", "parquet.`" + SF + "/lineitem.parquet`")
        ).collect()
    )
    assert got == expected, q


@common
@given(
    lo=st.integers(-3, 0),
    hi=st.integers(0, 3),
    gcol=st.sampled_from(["l_returnflag", "l_linestatus"]),
)
def test_random_window_frames_agree(spark, ddb_small, lo, hi, gcol):
    """Randomized ROWS BETWEEN frames: SUM over [lo, hi] rows around the
    current row must agree exactly (integer sums of l_linenumber — no
    float ordering noise)."""
    frame = (
        f"ROWS BETWEEN {-lo} PRECEDING AND {hi} FOLLOWING"
        if lo < 0
        else f"ROWS BETWEEN CURRENT ROW AND {hi} FOLLOWING"
    )
    # (l_orderkey, l_linenumber) is not unique in the fixtures; adding
    # l_partkey/l_suppkey makes the frame's neighbor set deterministic
    over = (
        f"OVER (PARTITION BY {gcol} ORDER BY l_orderkey, l_linenumber, "
        f"l_partkey, l_suppkey {frame})"
    )
    q = (
        f"SELECT l_orderkey, l_linenumber, l_partkey, SUM(l_linenumber) {over} AS s "
        f"FROM lineitem"
    )
    expected = sorted(tuple(r) for r in ddb_small.execute(q).fetchall())
    got = sorted(
        tuple(r)
        for r in spark.sql(
            q.replace("lineitem", "parquet.`" + SF + "/lineitem.parquet`")
        ).collect()
    )
    assert got == expected, q


@common
@given(
    unit=st.sampled_from(["hour", "day", "week", "month"]),
)
def test_random_date_trunc_buckets_agree(spark, ddb_small, unit):
    """date_trunc bucketing parity across units (week start, month
    boundaries are classic cross-engine divergence points). The explicit
    TIMESTAMP cast normalizes return types: DuckDB's date_trunc on a
    coarse unit yields DATE, Spark always yields TIMESTAMP."""
    q = (
        f"SELECT CAST(date_trunc('{unit}', o_orderdate) AS TIMESTAMP) AS b, "
        f"COUNT(*) AS n FROM orders GROUP BY b ORDER BY b"
    )
    expected = ddb_small.execute(q).fetchall()
    got = [
        tuple(r)
        for r in spark.sql(
            q.replace("orders", "parquet.`" + SF + "/orders.parquet`")
        ).collect()
    ]
    assert got == [tuple(r) for r in expected], q


# --- text-core primitives vs pure-Python reference (round 2) -----------------

_word_text = st.text(
    alphabet=st.sampled_from("ab c d  efg "), min_size=0, max_size=60
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(txt=_word_text, n=st.integers(min_value=2, max_value=4))
def test_words_and_shingles_match_python(spark, txt, n):
    """The text core (`words`, `shingles`) must agree with the obvious
    Python reference on arbitrary spacing — every dedup/quality/vocab
    key builds on these two, so a boundary bug here (empty tokens,
    short docs, n>len) corrupts the whole family silently."""
    from nfdump2clickhouse_spark.functions.text import shingles, words

    row = (
        spark.createDataFrame([(txt,)], "text string")
        .select(
            words(F.col("text")).alias("ws"),
            shingles(words(F.col("text")), n).alias("sh"),
        )
        .collect()[0]
    )
    ref_ws = [w for w in txt.split(" ") if w != ""]
    ref_sh = [
        " ".join(ref_ws[i : i + n]) for i in range(max(len(ref_ws) - n + 1, 0))
    ]
    assert row.ws == ref_ws
    assert row.sh == ref_sh


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.integers(min_value=-10**9, max_value=10**9).map(abs),
        min_size=1,
        max_size=8,
    ),
)
def test_integer_halfup_division_matches_python(spark, vals):
    """(2s+n) DIV (2n) — the cross-engine exact running-mean formula the
    PIT join and RFM keys rely on — must equal Python's round-half-up
    for arbitrary sums/counts."""
    s, n = sum(vals), len(vals)
    # CAST the literal: in the real keys s is already a BIGINT SUM; a raw
    # int literal here parses as INT and 2*s overflows under ANSI mode
    got = spark.sql(
        f"SELECT CAST((2*CAST({s} AS BIGINT)+{n}) DIV (2*{n}) AS BIGINT) AS r"
    ).collect()[0].r
    import math
    assert got == math.floor(s / n + 0.5)
