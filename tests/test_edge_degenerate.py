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
    # --- r9: the SURVEY §17.1 certified-key fix batch (the 22 keys the
    # r7/r8 sweeps flagged while driver-certified, fixed at the START of
    # the r9 window as dated; each requeues as tier-1 stale-pass) ---
    # class-1/2 mechanical (try_divide / COALESCE count_if / power-sum
    # + min<>max gate / two-sided validity gates)
    "stats_corr_matrix",
    "events_cuped_adjust",
    "stats_ks_test",
    "stats_mann_whitney",
    "drift_psi",
    "agg_cramers_v",
    "stats_anova_f",
    "stats_hill_tail_index",
    "observe_metrics",
    "data_quality_rules",
    "agg_stddev_var",
    "stats_benjamini_hochberg",
    "ml_eval_regression",
    "agg_skew_kurt",
    # class-3/4 guards (None-total early returns, empty-write guard,
    # empty-codebook seed paths)
    "emb_pca_project",
    "emb_whitening",
    "graph_pagerank",
    "multimodal_binary",
    "ann_ivf_probe",
    "ann_ivfpq_search",
    "ann_recall_report",
    "sample_kcenter_coreset",
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
    "graph_pagerank": (
        "class 6: const duplicates n_nationkey, so the oracle's "
        "GROUP BY collapses to 1 node where the engine's node frame "
        "keeps 16 — constk (unique keys) is clean"
    ),
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


GROUPING_SETS_KEYS = [
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_grouping_id",
]


@pytest.mark.parametrize("key", GROUPING_SETS_KEYS)
def test_grouping_sets_empty_contract(key, spark, tmp_path):
    """SURVEY §5.5 #10 (decided r9): over EMPTY input this engine SHIPS
    Spark-native grouping-sets semantics — ZERO rows — while
    SQL-standard (and DuckDB) emits the `()` grand-total row. The
    divergence is a pinned behavior contract, not a silent gap: if
    either engine changes (a Spark release adopting the standard, a
    DuckDB release dropping it), this pin fails and the decision is
    revisited. The oracles stay untouched (no requeue burned on a
    semantics note)."""
    d = build_fixture("empty")
    try:
        spec = SPECS[key]
        engine_rows = spec.fn(spark, d).count()
        con = duckdb.connect()
        pin_float_semantics(con)
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        oracle_rows = len(con.execute(spec.oracle).df())
        assert engine_rows == 0, (
            f"{key}: Spark-native contract is zero rows over empty input"
        )
        assert oracle_rows >= 1, (
            f"{key}: DuckDB stopped emitting the SQL-standard grand-total "
            "row over empty input — the §5.5 #10 divergence is gone; "
            "revisit the decision (the oracle-side gap may now close free)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


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
    # --- r9: §17.1 batch keys that were ALSO nullmix-flagged get both
    # conventions in the same edit (§17.1(a): one requeue, both fixes)
    "agg_cramers_v",
    "agg_skew_kurt",
    "ann_ivf_probe",
    "ann_ivfpq_search",
    "ann_recall_report",
    "data_quality_rules",
    "drift_psi",
    "emb_pca_project",
    "emb_whitening",
    "events_cuped_adjust",
    "sample_kcenter_coreset",
    "stats_hill_tail_index",
    "stats_ks_test",
    "stats_mann_whitney",
    # --- r10: ADVICE r9 medium — pairwise-complete moment conditioning
    # (the nullmix-class divergence the uniform fixture can't surface;
    # the dedicated non-coinciding-NULL pin lives in test_correctness)
    "stats_corr_matrix",
    # --- r10: the §17.2 growth key ships nullmix-clean from day one
    # (per-comparison COALESCE mirrored engine/oracle)
    "filter_nfdump_extended",
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
