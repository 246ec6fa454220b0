import os, sys, time
sys.path.insert(0, "/root/repo")
from nfdump2clickhouse_spark import registry
from nfdump2clickhouse_spark.operators import wave15
from nfdump2clickhouse_spark.session import get_spark
from nfdump2clickhouse_spark.catalog import parquet_column_stats
from tools.scale_probe import build

BASE = "/root/testdata/sf0.1"
N = 32
std = f"/tmp/sf_winsor_probe_x{N}"
spark = get_spark("probe-winsor-x32")
if not os.path.exists(f"{std}/lineitem.parquet"):
    t0=time.perf_counter(); build(spark, BASE, std, N); print(f"built x{N} in {time.perf_counter()-t0:.0f}s", flush=True)
st = parquet_column_stats(std, "lineitem", "l_extendedprice")
print("x32 lineitem rows:", st[2], "gate:", wave15._WINSOR_BINNED_MIN_ROWS, "-> binned branch:", st[2] >= wave15._WINSOR_BINNED_MIN_ROWS, flush=True)
fn = registry.all_specs()["agg_winsorized_mean"].fn
def noop(df): df.write.format("noop").mode("overwrite").save()
def run(sf):
    t0=time.perf_counter(); noop(fn(spark, sf)); return time.perf_counter()-t0
# warm then interleave binned (gated, default) vs plain (gate disabled) at x32
run(std)
res = {"binned": [], "plain": []}
for i in range(3):
    wave15._WINSOR_BINNED_MIN_ROWS = 8_000_000
    res["binned"].append(run(std))
    wave15._WINSOR_BINNED_MIN_ROWS = 1 << 62
    res["plain"].append(run(std))
wave15._WINSOR_BINNED_MIN_ROWS = 8_000_000
# equality at x32 between branches
a = sorted(map(tuple, fn(spark, std).collect()))
wave15._WINSOR_BINNED_MIN_ROWS = 1 << 62
b = sorted(map(tuple, fn(spark, std).collect()))
print("x32 rows equal:", a == b, len(a), flush=True)
print("binned:", [round(x,2) for x in res["binned"]], "best", round(min(res["binned"]),2))
print("plain: ", [round(x,2) for x in res["plain"]], "best", round(min(res["plain"]),2))
base_t = min(run(BASE), run(BASE))
print("base sf0.1:", round(base_t,2), " x32/base ratio (binned):", round(min(res['binned'])/base_t,1))
spark.stop()
