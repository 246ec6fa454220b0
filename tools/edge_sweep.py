"""Edge-divergence sweep: every key against EMPTY / TINY fixtures.

The driver's gate and the judge's sample both run at sf0.01, so an
engine/oracle divergence that only appears on degenerate input (zero
rows, one row, a single group) is invisible to the gate yet real in
production (an empty day partition, a filtered-to-nothing source) —
exactly the class ADVICE r6 found by hand in
``ml_eval_average_precision`` (pos==0: engine empty, oracle one
div-by-zero row). This tool hunts the whole registry for that class.

Modes (``python tools/edge_sweep.py empty|one [keys...]``):

- ``empty``: 0-row versions of all 10 tables, schemas cloned from the
  sf0.001 parquet footers.
- ``one``: 1-row slices (the first row of each table) — exercises
  n==1 variance/stddev, single-group, self-join-degenerate paths.
- ``const``: 16 verbatim copies of the first row — sigma==0.0 with
  n>1 (duplicates primary keys, so class-6 artifacts apply).
- ``constk``: const with unique primary keys (re-sequenced) — the
  zero-variance class WITHOUT the duplicate-key artifact, so every
  flag is a real divergence candidate (r8).
- ``nullmix``: the first 16 rows with every VALUE column NULLed on odd
  rows (primary keys and FK join keys preserved) — the bad-exporter-day
  class: mixed-NULL ordering (Spark NULLS FIRST vs DuckDB NULLS LAST
  on ASC), NULL propagation through expressions, Arrow batches with
  None cells reaching Pandas UDFs (r8).

For each hash key: run the Spark query AND the DuckDB oracle on the
same fixture dir and compare with the driver's canonicalization
(tests.oracle_utils.compare_frames). For rows-only keys: run the
Spark query and record clean/crash. A crash on EITHER side is
reported (engine crash = operator not total on degenerate input;
oracle crash = latent sweep blow-up if the fixture ever degenerates).

Output: one line per key — OK / MISMATCH / ENGINE_ERR / ORACLE_ERR —
and a summary. Exit 0 always (triage tool, not a gate).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb

from nfdump2clickhouse_spark.duckdb_compat import pin_float_semantics
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nfdump2clickhouse_spark import registry
from nfdump2clickhouse_spark.session import get_spark
from tests.oracle_utils import compare_frames

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Primary-key column per table, for the constk mode: the column whose
# uniqueness the real tables guarantee and the const mode violates
# (EDGE_SWEEP_r7.md class 6). lineitem's composite key varies
# l_linenumber inside the single cloned order, so the orders FK stays
# intact.
KEY_COLS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# Columns the nullmix mode must NOT null: primary keys (row identity)
# and FK join keys (nulling them would make every join degenerate at
# once, masking the per-expression NULL findings under join emptiness).
NULLMIX_KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}

SRC = os.environ.get("SPARK_GRAFT_EDGE_SRC", "/root/testdata/sf0.001")


def build_fixture(mode: str) -> str:
    out = tempfile.mkdtemp(prefix=f"sf_edge_{mode}_")
    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        tbl = pq.read_table(src)
        if mode == "empty":
            sliced = tbl.slice(0, 0)
        elif mode == "one":
            sliced = tbl.slice(0, 1)
        elif mode == "const":
            # 16 verbatim copies of the first row: n>1 with ZERO variance
            # everywhere — the sigma==0.0 class, distinct from both the
            # empty (no row) and one (NULL sample variance) fixtures
            one = tbl.slice(0, 1)
            sliced = pa.concat_tables([one] * 16)
        elif mode == "constk":
            # const with the key contract intact: 16 copies of the first
            # row, but the table's primary-key column re-sequenced to
            # orig, orig+1, … orig+15 — zero variance in every VALUE
            # column while doc_id/vec_id/… stay unique, so class-6
            # duplicate-key artifacts cannot mask a real zero-variance
            # divergence (r8 extension of the r7 campaign)
            one = tbl.slice(0, 1)
            sliced = pa.concat_tables([one] * 16)
            kc = KEY_COLS[t]
            idx = sliced.schema.get_field_index(kc)
            field = sliced.schema.field(idx)
            base = sliced.column(idx)[0].as_py()
            new_keys = pa.array(
                [base + i for i in range(16)], type=field.type
            )
            sliced = sliced.set_column(idx, field, new_keys)
        elif mode == "nullmix":
            # first 16 rows, value columns NULLed on ODD rows: mixed-NULL
            # ordering + NULL propagation + None cells in Arrow batches
            sliced = tbl.slice(0, 16)
            n = sliced.num_rows
            mask = pa.array([bool(i % 2) for i in range(n)])
            keep = NULLMIX_KEEP[t]
            for ci, f in enumerate(sliced.schema):
                if f.name in keep:
                    continue
                nulled = pc.if_else(
                    mask, pa.nulls(n, type=f.type), sliced.column(ci)
                )
                sliced = sliced.set_column(ci, f, nulled)
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        pq.write_table(sliced, os.path.join(out, f"{t}.parquet"))
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "empty"
    only = set(sys.argv[2:])
    fixture = build_fixture(mode)
    spark = get_spark(f"edge-sweep-{mode}")
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{fixture}/{t}.parquet')"
        )
    specs = registry.all_specs()
    counts = {"OK": 0, "MISMATCH": 0, "ENGINE_ERR": 0, "ORACLE_ERR": 0,
              "ROWS_ONLY_OK": 0}
    bad: list[str] = []
    for key, spec in specs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            pdf = spec.fn(spark, fixture).toPandas()
        except Exception as ex:
            counts["ENGINE_ERR"] += 1
            bad.append(key)
            msg = f"{type(ex).__name__}: {str(ex).splitlines()[0][:160]}"
            print(f"{key}: ENGINE_ERR {msg}", flush=True)
            continue
        if spec.oracle is None:
            counts["ROWS_ONLY_OK"] += 1
            print(f"{key}: rows-only ok ({len(pdf)} rows, "
                  f"{time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            opdf = con.execute(spec.oracle).df()
        except Exception as ex:
            counts["ORACLE_ERR"] += 1
            bad.append(key)
            msg = f"{type(ex).__name__}: {str(ex).splitlines()[0][:160]}"
            print(f"{key}: ORACLE_ERR {msg}", flush=True)
            continue
        try:
            compare_frames(pdf, opdf, key)
        except AssertionError as ex:
            counts["MISMATCH"] += 1
            bad.append(key)
            print(f"{key}: MISMATCH {str(ex).splitlines()[0][:200]}",
                  flush=True)
            continue
        counts["OK"] += 1
        print(f"{key}: OK ({len(pdf)} rows, {time.time()-t0:.1f}s)",
              flush=True)
    print(f"\n== {mode} summary: {counts}")
    if bad:
        print("needs triage:", " ".join(sorted(bad)))
    spark.stop()


if __name__ == "__main__":
    main()
