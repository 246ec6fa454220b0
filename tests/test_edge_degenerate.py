"""Degenerate-input pins for the r7 edge-divergence campaign.

`tools/edge_sweep.py` runs every registry key against EMPTY and ONE-ROW
clones of the ten tables — the class of input the sf0.01 gate never
sees (an empty day partition, a filtered-to-nothing source). Round 7
fixed every flagged never-swept key; this module pins those fixes so a
regression cannot ride in silently:

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
]


@pytest.fixture(scope="module", params=["empty", "one"])
def degenerate_dir(request):
    d = build_fixture(request.param)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def degenerate_ddb(degenerate_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", FIXED_KEYS)
def test_degenerate_input_parity(key, spark, degenerate_dir, degenerate_ddb):
    spec = SPECS[key]
    pdf = spec.fn(spark, degenerate_dir).toPandas()  # must not raise
    if spec.oracle is None:
        return  # rows-only contract: engine totality is the pin
    opdf = degenerate_ddb.execute(spec.oracle).df()
    compare_frames(pdf, opdf, key)
