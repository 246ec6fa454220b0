"""Degenerate-input pins for the r7 edge-divergence campaign.

`tools/edge_sweep.py` runs every registry key against EMPTY / ONE-ROW /
CONST (16 identical rows) / CONSTK (16 constant rows, unique primary
keys — r8) clones of the ten tables — the class of input the sf0.01
gate never sees (an empty day partition, a filtered-to-nothing source,
a one-class corpus). Round 7 fixed every flagged never-swept key; this
module pins those fixes so a regression cannot ride in silently:

- hash keys: engine vs DuckDB oracle on BOTH degenerate fixtures (the
  same compare_frames canonicalization as the driver);
- rows-only keys: the engine must run clean (no ANSI divide-by-zero,
  no NoneType driver arithmetic, no VOID-literal analysis errors).

Certified keys that the sweep also flagged are documented in
EDGE_SWEEP_r7.md instead of fixed (rewriting a driver-certified key
mid-round re-queues it as stale-pass and preempts the sweep window).
"""

from __future__ import annotations

import shutil

import duckdb

from nfdump2clickhouse_spark.duckdb_compat import pin_float_semantics
import pytest

from nfdump2clickhouse_spark import registry
from tests.conftest import TABLES
from tests.oracle_utils import compare_frames
from tools.edge_sweep import build_fixture

SPECS = registry.all_specs()

# every never-swept key the r7 empty/one sweeps flagged, now fixed
FIXED_KEYS = [
    "dedup_entity_resolution",
    "dedup_provenance_split",
    "dedup_semantic_cluster",
    "emb_anisotropy",
    "emb_cluster_silhouette",
    "emb_dimension_variance",
    "emb_distance_histogram",
    "emb_pq_quantize",
    "events_ab_contamination",
    "events_repeat_purchase",
    "features_scaling",
    "flows_exporter_dedup",
    "maint_partition_stats",
    "ml_cohens_kappa",
    "ml_eval_auc",
    "ml_eval_confusion_multi",
    "ml_eval_lift",
    "ml_feature_woe_binning",
    "scan_csv_column_drift",
    "sink_dynamic_partition_overwrite",
    "sql_scripting_control_flow",
    "stats_bayes_shrunk_rates",
    "stats_breusch_pagan",
    "stats_capture_recapture",
    "stats_cochran_armitage",
    "stats_cohens_d",
    "stats_durbin_watson",
    "stats_friedman_test",
    "stats_grubbs",
    "stats_jarque_bera",
    "stats_levene_test",
    "stats_mcnemar",
    "stats_ols_two_vars",
    "stats_runs_test",
    "stats_sign_test",
    "stats_sprt_early_stop",
    "text_burstiness_dispersion",
    "ts_cusum_anomaly",
    "ts_forecast_mase",
    "ts_pacf",
    "ts_subsequence_search",
    # const-mode finds (zero variance with n>1)
    "sample_neyman_allocation",
    "stats_spearman_corr",
]

# keys whose CONST (16 identical rows) behavior is a documented fixture
# artifact, not a divergence (EDGE_SWEEP_r7.md classes 6-7): duplicated
# primary keys violate the tables' key contract (the shingle pair core's
# i<j => id1<id2 invariant rests on doc_id uniqueness), and zero true
# variance amplifies 1-ulp cancellation noise astronomically
CONST_EXEMPT = {
    "dedup_provenance_split": "class 6: duplicate-doc_id pair blowup",
    # stats_jarque_bera left this list in r8: the exact min<>max
    # constancy gate (two-sided) removes the zero-variance row on both
    # engines instead of comparing amplified cancellation noise.
}


@pytest.fixture(scope="module", params=["empty", "one", "const", "constk"])
def degenerate_dir(request):
    d = build_fixture(request.param)
    yield request.param, d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def degenerate_ddb(degenerate_dir):
    _, d = degenerate_dir
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", FIXED_KEYS)
def test_degenerate_input_parity(key, spark, degenerate_dir, degenerate_ddb):
    mode, d = degenerate_dir
    if mode == "const" and key in CONST_EXEMPT:
        pytest.skip(f"documented const artifact: {CONST_EXEMPT[key]}")
    spec = SPECS[key]
    pdf = spec.fn(spark, d).toPandas()  # must not raise
    if spec.oracle is None:
        return  # rows-only contract: engine totality is the pin
    opdf = degenerate_ddb.execute(spec.oracle).df()
    compare_frames(pdf, opdf, key)


def test_distance_histogram_identical_vectors(spark, tmp_path):
    """Two identical embeddings with distinct vec_ids: exactly one pair
    at distance 0, so dmax == dmin and the bin width is 0 — the input
    class none of the empty/one/const fixtures produce (const clones
    duplicate vec_id too, tripping the key contract instead). Pins the
    explicit single-bin-0 guard and its dmax=dmin CASE mirror in the
    oracle (ADVICE r7 #1: try_divide-by-0 here would NOT be
    NULL-parity, because Spark's least() skips NULLs and clamps the
    NULL bin to 9)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vec = [1.0, 2.0, 3.0, 4.0]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array([vec, vec], pa.list_(pa.float32())),
                "label": pa.array([0, 0], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    spec = SPECS["emb_distance_histogram"]
    pdf = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    pin_float_semantics(con)
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    opdf = con.execute(spec.oracle).df()
    compare_frames(pdf, opdf, "emb_distance_histogram[identical-vectors]")
    assert pdf["bin"].tolist() == [0] and pdf["n_pairs"].tolist() == [1]


# --- nullmix mode (r8): value columns NULLed on odd rows, keys intact ---

# every key the r8 nullmix sweep flagged that was never driver-swept,
# now fixed (two-sided isNotNull gates / try_divide / UNPIVOT NULL
# alignment / None-guards before Python UDFs); certified flags are
# documented in EDGE_SWEEP_r8.md and scheduled in SURVEY §17.1
NULLMIX_FIXED_KEYS = [
    "agg_gini_concentration",
    "agg_group_quantiles_exact",
    "agg_lorenz_deciles",
    "agg_sketch_error_report",
    "dedup_semantic_cluster",
    "emb_pq_quantize",
    "events_adoption_curve",
    "events_anomaly_deseasonalized",
    "maint_partition_stats",
    "reshape_unpivot_multi",
    "scan_fixed_width",
    "stats_block_bootstrap",
    "stats_cochran_armitage",
    "stats_grubbs",
    "text_boilerplate_ngrams",
    "ts_index_rebase",
    "ts_period_over_period",
    "ts_seasonality_strength",
    "ts_theil_sen",
]


@pytest.fixture(scope="module")
def nullmix_dir():
    d = build_fixture("nullmix")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def nullmix_ddb(nullmix_dir):
    con = duckdb.connect()
    pin_float_semantics(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nullmix_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", NULLMIX_FIXED_KEYS)
def test_nullmix_parity(key, spark, nullmix_dir, nullmix_ddb):
    spec = SPECS[key]
    pdf = spec.fn(spark, nullmix_dir).toPandas()  # must not raise
    if spec.oracle is None:
        return
    opdf = nullmix_ddb.execute(spec.oracle).df()
    compare_frames(pdf, opdf, key)
