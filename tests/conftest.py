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
