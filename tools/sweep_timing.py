"""Time every registry key at sf0.01 the way the driver does (Spark collect
+ DuckDB oracle), printing per-key wall seconds sorted descending."""
import json, sys, time, traceback

sys.path.insert(0, "/root/repo")
import duckdb

from nfdump2clickhouse_spark.duckdb_compat import pin_float_semantics
import pandas as pd

from nfdump2clickhouse_spark import registry
from nfdump2clickhouse_spark.session import get_spark

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else None
    spark = get_spark("sweep-timing")
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    specs = registry.all_specs()
    if limit:
        specs = dict(list(specs.items())[:limit])
    times = {}
    for key, spec in specs.items():
        t0 = time.time()
        err = None
        try:
            pdf = spec.fn(spark, SF).toPandas()
            if spec.oracle:
                con.execute(spec.oracle).fetch_df()
            # driver-style canonicalization: sort_values over all columns
            pdf.sort_values(by=list(pdf.columns), ignore_index=True)
        except Exception as e:
            err = f"{type(e).__name__}: {e}"
        times[key] = (round(time.time() - t0, 2), err)
        print(f"{key}: {times[key][0]}s{' ERR ' + err[:120] if err else ''}", flush=True)
    print("\n== slowest ==")
    for k, (t, e) in sorted(times.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{t:8.2f}  {k}{'  ERR' if e else ''}")
    total = sum(t for t, _ in times.values())
    errs = [k for k, (_, e) in times.items() if e]
    print(f"\ntotal: {total:.1f}s over {len(times)} keys; errors: {errs}")
    json.dump({k: t for k, (t, _) in times.items()}, open("/tmp/sweep_times.json", "w"))

if __name__ == "__main__":
    main()
