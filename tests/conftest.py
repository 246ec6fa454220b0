from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfdump2clickhouse_spark.duckdb_compat import pin_float_semantics  # noqa: E402
from nfdump2clickhouse_spark.pbcompat import ensure_protobuf  # noqa: E402
from nfdump2clickhouse_spark.session import get_spark  # noqa: E402

# before any SparkSession exists: workers of JVMs launched later inherit
# the PYTHONPATH this sets, which is what lets the real
# transformWithStateInPandas path run (see pbcompat docstring)
ensure_protobuf()

_TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", os.path.join(_TESTDATA_ROOT, "sf0.01")
)
# the two OTHER scale factors for the cross-SF sweeps (ADVICE r2: derive
# from the root override instead of hardcoding, so the suite can point at
# relocated fixtures)
CROSS_SF_DIRS = [
    os.path.join(_TESTDATA_ROOT, "sf0.001"),
    os.path.join(_TESTDATA_ROOT, "sf0.1"),
]
SMALL_SF_DIR = os.path.join(_TESTDATA_ROOT, "sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark-flows-tests", master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# --- suite tiering (VERDICT r11 next-#1) -------------------------------------
# The default tier must finish well inside the driver's verify window;
# the r11 driver run truncated mid-suite (tests_ok:false with zero
# failures shown) because the flat suite outgrew it. Everything below
# is marked `slow` and runs via `-m slow`; the default tier keeps the
# complete sf0.01 oracle core (test_query_vs_oracle, all 465 keys),
# edge/degenerate + nullmix parity, enforcement, format, streaming and
# service tests. Timings are from the full r12 run (7,292 s total,
# contended box; per-function call-time aggregates):
_SLOW_TESTS = {
    # cross-SF re-sweeps: redundant oracle coverage at sf0.001/sf0.1 —
    # the driver oracle-checks those SFs itself, and every key keeps
    # its sf0.01 oracle test in the default tier. ~3,500 s combined;
    # test_label_propagation_across_sfs alone measured 2,759 s at
    # sf0.1 (iterative min-label propagation, driver-loop rounds).
    # (matched by the "_across_sfs" suffix rule below)
    #
    # full-registry plan sweep: builds all 465 plans (159 s)
    "test_no_unpartitioned_windows_full_registry",
    # scale-rehearsal contracts >= ~20 s: internal-equivalence /
    # large-volume rehearsals, not oracle or edge coverage
    "test_ivfpq_recall_contract",                        # 70 s
    "test_exact_ntile_equals_window_ntile",              # 52 s
    "test_pacf_and_cusum_survive_large_daily_volume",    # 46 s
    "test_semantic_dedup_contracts",                     # 31 s
    "test_provenance_split_reconciles",                  # 27 s
    "test_scaled_e6_statistics_survive_multimillion_counts",  # 24 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS or base.endswith("_across_sfs"):
            item.add_marker(pytest.mark.slow)
