"""The driver's correctness sampler checks the FIRST 50 registry
entries (insertion order = import order in queries/__init__.py).
This test pins the r9 prefix composition so a drifted import order
fails CI instead of silently rotating the wrong queries into the
driver sample (ADVICE r9: the r8 hand-counted docstring went stale —
assert it instead of documenting it).
"""

from __future__ import annotations

from sparkit_learn_spark.registry import all_oracles, all_queries

#: the exact r9 first-50 (see queries/__init__.py prefix section).
EXPECTED_FIRST_50 = [
    # wave146 (2) + wave147 (1)
    "q_llm_ann_persisted", "q_llm_ann_index_coverage",
    "q_llm_pipeline_funnel_incremental",
    # llm_pipeline2 (8) — re-confirms the r9 bounded embed_cosine
    "q_llm_simhash_dedup", "q_llm_ngram_jaccard",
    "q_llm_embed_cosine_dedup", "q_llm_lang_id", "q_llm_fingerprint",
    "q_llm_token_count", "q_llm_minhash_banded", "q_llm_edit_distance",
    # projections (7)
    "q_proj_expr", "q_filter_and_or", "q_filter_in_between",
    "q_filter_like", "q_filter_null", "q_proj_case",
    "q_filter_null_safe",
    # wave9 (6)
    "q_stat_welch_ttest", "q_stat_chi2", "q_stat_ks_2samp",
    "q_ts_autocorr", "q_ts_cusum", "q_dq_iqr_outliers",
    # wave11 (6)
    "q_ts_yoy", "q_agg_weighted_median", "q_stat_ols2",
    "q_ts_decompose", "q_graph_bfs_hops", "q_llm_dedup_incremental",
    # joins2 (5)
    "q_join_skew_salted", "q_join_interval_overlap", "q_merge_upsert",
    "q_scd2_history", "q_snapshot_diff",
    # sql_surface (5)
    "q_sql_cte_window", "q_sql_parameterized", "q_cond_try",
    "q_ids_stable", "q_sql_lateral",
    # semistructured (4)
    "q_array_funcs", "q_array_explode", "q_json_funcs", "q_map_funcs",
    # scans (3)
    "q_scan_parquet", "q_scan_pruned", "q_scan_union_sf",
    # wave148 (2) + sources_q (first 1; q_json_variant rotates next)
    "q_llm_ann_index_append", "q_llm_ann_index_merge",
    "q_scan_pysource",
]


def test_first_50_composition():
    assert list(all_queries())[:50] == EXPECTED_FIRST_50


def test_first_50_oracle_coverage():
    """47 of the 50 are exactly oracled; the 3 rows-only entries are
    by-design approximate/engine-specific (simhash banding, minhash
    banding, persisted-ANN neighbor sets) with pytest value checks."""
    oracled = set(all_oracles())
    rows_only = [n for n in EXPECTED_FIRST_50 if n not in oracled]
    assert rows_only == ["q_llm_ann_persisted", "q_llm_simhash_dedup",
                         "q_llm_minhash_banded"]
