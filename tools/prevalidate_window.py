"""Four-session-shape pre-validation of the driver's first-50 sweep
window (the r8/r9/r10 discipline, now a committed tool instead of an
ad-hoc loop): run every window key engine-vs-oracle at sf0.01 under

- house   — ``session.get_spark`` (UTC tz, 32 shuffle partitions, AQE)
- vanilla — ``SparkSession.builder.master("local[8]")``, no confs
- shuf8   — vanilla + spark.sql.shuffle.partitions=8
- shuf200 — vanilla + spark.sql.shuffle.partitions=200

because the driver builds its OWN session: window keys must not depend
on the house session tuning. One shape per process run (Spark confs
are session-global): ``python tools/prevalidate_window.py <shape> [n]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb
from pyspark.sql import SparkSession

from nfdump2clickhouse_spark import registry
from nfdump2clickhouse_spark.duckdb_compat import pin_float_semantics
from tests.oracle_utils import compare_frames

# env-configurable like the session CPU/memory knobs (ADVICE r10)
SF = os.environ.get("SPARK_GRAFT_PREVALIDATE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_session(shape: str) -> SparkSession:
    if shape == "house":
        from nfdump2clickhouse_spark.session import get_spark

        return get_spark("prevalidate-house")
    b = SparkSession.builder.master("local[8]").appName(f"prevalidate-{shape}")
    if shape == "shuf8":
        b = b.config("spark.sql.shuffle.partitions", "8")
    elif shape == "shuf200":
        b = b.config("spark.sql.shuffle.partitions", "200")
    elif shape != "vanilla":
        raise SystemExit(f"unknown shape {shape!r}")
    return b.getOrCreate()


def main() -> None:
    shape = sys.argv[1] if len(sys.argv) > 1 else "house"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = build_session(shape)
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    window = list(registry.all_specs().items())[:n]
    t0 = time.time()
    counts = {"MATCH": 0, "ROWS_ONLY": 0, "FAIL": 0}
    for key, spec in window:
        try:
            pdf = spec.fn(spark, SF).toPandas()
            if spec.oracle is None:
                counts["ROWS_ONLY"] += 1
                print(f"{key}: rows-only ({len(pdf)} rows)", flush=True)
                continue
            opdf = con.execute(spec.oracle).df()
            compare_frames(pdf, opdf, key)
            counts["MATCH"] += 1
            print(f"{key}: MATCH", flush=True)
        except Exception as ex:  # noqa: BLE001 — triage tool
            counts["FAIL"] += 1
            print(f"{key}: FAIL {type(ex).__name__}: {str(ex)[:200]}", flush=True)
    print(
        f"== {shape}: {counts['MATCH']} MATCH + {counts['ROWS_ONLY']} rows-only"
        f" + {counts['FAIL']} FAIL over {n} keys in {time.time() - t0:.1f}s",
        flush=True,
    )
    spark.stop()
    if counts["FAIL"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
