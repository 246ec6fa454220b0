"""Ad-hoc single-key oracle check: `python tools/check_keys.py key1 key2 ...`
(all wave5 keys if none given). Mirrors the driver's sf0.01 compare."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb

from nfdump2clickhouse_spark.duckdb_compat import pin_float_semantics

from nfdump2clickhouse_spark import registry
from nfdump2clickhouse_spark.session import get_spark
from tests.oracle_utils import compare_frames

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    keys = sys.argv[1:]
    specs = registry.all_specs()
    if not keys:
        keys = [k for k in specs if specs[k].fn.__module__.endswith("wave5")]
    spark = get_spark()
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failed = []
    for k in keys:
        spec = specs[k]
        t0 = time.time()
        try:
            pdf = spec.fn(spark, SF_DIR).toPandas()
            if spec.oracle is None:
                print(f"{k}: rows-only, {len(pdf)} rows, {time.time()-t0:.2f}s")
                continue
            opdf = con.execute(spec.oracle).df()
            compare_frames(pdf, opdf, k)
            print(f"{k}: OK ({len(pdf)} rows, {time.time()-t0:.2f}s)")
        except Exception as ex:
            failed.append(k)
            print(f"{k}: FAIL {type(ex).__name__}: {str(ex)[:500]}")
    if failed:
        sys.exit(f"FAILED: {failed}")


if __name__ == "__main__":
    main()
