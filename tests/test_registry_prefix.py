"""The driver's correctness sampler checks the FIRST 50 registry
entries (insertion order = import order in queries/__init__.py).
This test pins the r10 prefix composition so a drifted import order
fails CI instead of silently rotating the wrong queries into the
driver sample (ADVICE r9: the r8 hand-counted docstring went stale —
assert it instead of documenting it).
"""

from __future__ import annotations

from sparkit_learn_spark.registry import all_oracles, all_queries

#: the exact r10 first-50 (see queries/__init__.py prefix section).
EXPECTED_FIRST_50 = [
    # llm_pipeline2 (8) — the ngram_jaccard oracle-CTE root
    "q_llm_simhash_dedup", "q_llm_ngram_jaccard",
    "q_llm_embed_cosine_dedup", "q_llm_lang_id", "q_llm_fingerprint",
    "q_llm_token_count", "q_llm_minhash_banded", "q_llm_edit_distance",
    # graph_q (7) — driver re-confirms the r10 twin-quotient degree
    "q_graph_degree", "q_graph_pagerank", "q_graph_components",
    "q_graph_keep_best", "q_graph_triangles", "q_graph_clustering_coeff",
    "q_graph_cluster_sizes",
    # wave30 (3) — incl. the r10 quotient assortativity
    "q_ts_crosscorr", "q_llm_quantile_normalize", "q_graph_assortativity",
    # wave90 (3) — incl. the r9 quotient harmonic
    "q_graph_harmonic", "q_ml_ridge2", "q_evt_fano_factor",
    # wave68 (3)
    "q_stat_bootstrap_ci", "q_ml_calibration", "q_graph_kcore",
    # multimodal_q (4)
    "q_mm_decode", "q_mm_decode_audio", "q_mm_frame_sample",
    "q_mm_features",
    # llm_pipeline5 (5)
    "q_llm_chunk_docs", "q_llm_global_shuffle", "q_llm_bigram_lm",
    "q_llm_dup_passages", "q_llm_corpus_prep",
    # llm_pipeline4 (7)
    "q_llm_decontaminate", "q_llm_repetition", "q_llm_pii_redact",
    "q_llm_domain_mix", "q_llm_dedup_clusters", "q_llm_pack_sequences",
    "q_llm_domain_resample",
    # analytics2 (3)
    "q_evt_rfm", "q_evt_attribution", "q_evt_cohort",
    # wave12 (4)
    "q_llm_setjoin_prefix", "q_ts_forecast_eval", "q_dq_drift",
    "q_agg_pareto",
    # wave7 (2) + dataquality (first 1; q_dq_profile rotates next)
    "q_win_nth_value", "q_str_edit_funcs",
    "q_dq_checks",
]


def test_first_50_composition():
    assert list(all_queries())[:50] == EXPECTED_FIRST_50


def test_first_50_oracle_coverage():
    """47 of the 50 are exactly oracled; the 3 rows-only entries are
    by-design approximate/engine-specific (simhash banding, minhash
    banding, pagerank float fixpoint) with pytest value checks."""
    oracled = set(all_oracles())
    rows_only = [n for n in EXPECTED_FIRST_50 if n not in oracled]
    assert rows_only == ["q_llm_simhash_dedup", "q_llm_minhash_banded",
                         "q_graph_pagerank"]
