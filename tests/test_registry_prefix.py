"""The driver's correctness sampler checks the FIRST 50 registry
entries (insertion order = import order in queries/__init__.py).
This test pins the r11 prefix composition so a drifted import order
fails CI instead of silently rotating the wrong queries into the
driver sample (ADVICE r9: the r8 hand-counted docstring went stale —
assert it instead of documenting it).
"""

from __future__ import annotations

from sparkit_learn_spark.registry import all_oracles, all_queries

#: the exact r11 first-50 (see queries/__init__.py prefix section).
EXPECTED_FIRST_50 = [
    # wave147 (1, registered via wave149's module-level import) +
    # wave149 (1) + wave150 (5, incl. the r11 compaction audit) — the driver confirms the r10/r11
    # persisted-state family (funnel store + near-dup band index)
    "q_llm_pipeline_funnel_incremental",
    "q_llm_funnel_persisted",
    "q_llm_neardup_index_coverage", "q_llm_neardup_index_probe",
    "q_llm_neardup_index_append", "q_llm_neardup_index_compact",
    "q_llm_mmr_ann",
    # wave89 (3)
    "q_sketch_linear_counting", "q_ml_dbscan_grid", "q_ts_sax",
    # wave91 (3) — incl. the r11 folded-probe matrix profile
    "q_ts_matrix_profile", "q_stat_mcnemar", "q_agg_theil_inequality",
    # wave93 (3)
    "q_llm_lsh_bucket_stats", "q_ts_rolling_beta", "q_ts_peaks",
    # wave94 (3)
    "q_stat_qq_table", "q_dq_ship_lag_audit", "q_stream_window_topk",
    # wave95 (3)
    "q_ml_chi2_features", "q_stat_sign_test", "q_stat_influence",
    # wave96 (3)
    "q_ts_savitzky_golay", "q_ml_brier_decomposition",
    "q_ts_turning_points",
    # wave97 (3)
    "q_stat_bland_altman", "q_evt_time_to_second",
    "q_ts_loglinear_growth",
    # wave98 (3)
    "q_ml_woe_iv", "q_ml_psi", "q_ml_kfold_balance",
    # wave99 (3)
    "q_stat_gumbel_maxima", "q_fin_basket_poisson",
    "q_graph_reciprocity",
    # wave101 (3)
    "q_ts_rsi", "q_ml_auc_fairness", "q_dq_volume_anomaly",
    # wave102 (3)
    "q_stat_logrank", "q_ml_next_item_table",
    "q_stat_capture_recapture",
    # wave105 (3)
    "q_stat_anova2", "q_stat_bartlett", "q_ml_vif",
    # wave106 (3)
    "q_ts_periodogram", "q_ml_adjusted_rand", "q_stat_kendall_w",
    # wave107 (3)
    "q_stat_breusch_pagan", "q_ts_kpss", "q_ts_best_run",
    # wave108 (first 1 of 3; q_fin_segment_migration is #51)
    "q_win_days_since_event",
]


def test_first_50_composition():
    assert list(all_queries())[:50] == EXPECTED_FIRST_50


def test_first_50_mostly_never_sampled():
    """VERDICT r10 item #3: the rotation target is >=90% of the prefix
    never before in a driver sample. Only wave147's funnel (r9-sampled)
    rides along as wave149's import dependency."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    union: set[str] = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        n = int(p.rsplit("_r", 1)[1].split(".")[0])
        if n <= 10:  # rounds before this rotation shipped
            union.update(json.load(open(p)).keys())
    if not union:  # artifacts absent in a bare checkout
        return
    repeats = [q for q in EXPECTED_FIRST_50 if q in union]
    assert repeats == ["q_llm_pipeline_funnel_incremental"]


def test_first_50_oracle_coverage():
    """49 of the 50 are exactly oracled; the single rows-only entry is
    by-design (q_llm_mmr_ann: ANN candidates + float greedy, numpy
    parity + determinism pinned in pytest)."""
    oracled = set(all_oracles())
    rows_only = [n for n in EXPECTED_FIRST_50 if n not in oracled]
    assert rows_only == ["q_llm_mmr_ann"]
