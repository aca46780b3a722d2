"""Persisted MinHash-LSH near-dup index (operators/neardup_index,
wave150): layout coverage, append==rebuild merge law, candidate
semantics, run_id crash-blindness, and planted-duplicate recall.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.operators.neardup_index import (
    append_to_neardup_index,
    build_neardup_if_stale,
    build_neardup_index,
    candidate_pairs,
    doc_bands,
    load_meta,
)

SF = "/root/testdata/sf0.001"
BATCH_MOD = 7


def _docs(spark):
    return load_table(spark, SF, "documents")


def _band_set(spark, path):
    return {(r["doc_id"], r["band_id"], r["band_key"])
            for r in spark.read.parquet(f"{path}/bands")
            .select("doc_id", "band_id", "band_key").collect()}


def test_build_covers_eligible_docs_exactly(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "idx")
    meta = build_neardup_index(d, path, source_fingerprint="v1")
    eligible = d.where(F.size(F.split("text", " ")) >= 5).count()
    bands = spark.read.parquet(f"{path}/bands")
    assert meta["n_docs"] == eligible
    assert bands.count() == eligible * 4  # 16 hashes / 4 rows
    assert bands.select("doc_id").distinct().count() == eligible


def test_append_equals_whole_build(spark, tmp_path):
    """Merge law: hist build + batch append produces the SAME band
    set as one whole-corpus build — the frozen family makes appends
    exact, not approximate."""
    d = _docs(spark)
    hist = d.filter(F.col("doc_id") % BATCH_MOD != 0)
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    inc = str(tmp_path / "inc")
    whole = str(tmp_path / "whole")
    build_neardup_index(hist, inc, source_fingerprint="hist")
    meta = append_to_neardup_index(batch, inc, run_id=1,
                                   expected_fingerprint="hist",
                                   new_fingerprint="full")
    build_neardup_index(d, whole, source_fingerprint="full")
    assert _band_set(spark, inc) == _band_set(spark, whole)
    assert meta["n_docs"] == load_meta(spark, whole)["n_docs"]


def test_append_guards_fingerprint_and_run_id(spark, tmp_path):
    d = _docs(spark).limit(50)
    path = str(tmp_path / "idx")
    build_neardup_index(d, path, source_fingerprint="v1")
    with pytest.raises(ValueError, match="fingerprint"):
        append_to_neardup_index(d, path, run_id=1,
                                expected_fingerprint="WRONG",
                                new_fingerprint="v2")
    with pytest.raises(ValueError, match="run_id"):
        append_to_neardup_index(d, path, run_id=0,
                                expected_fingerprint="v1",
                                new_fingerprint="v2")


def test_candidates_run_id_filter_is_crash_blind(spark, tmp_path):
    """candidate_pairs(run_id=1) must not see run 1's own appended
    keys — a crashed append's retry computes the same candidates as a
    clean first attempt."""
    d = _docs(spark)
    hist = d.filter(F.col("doc_id") % BATCH_MOD != 0)
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    path = str(tmp_path / "idx")
    build_neardup_index(hist, path, source_fingerprint="hist")
    before = set(map(tuple, candidate_pairs(batch, path, run_id=1)
                     .collect()))
    append_to_neardup_index(batch, path, run_id=1,
                            expected_fingerprint="hist",
                            new_fingerprint="full")
    after = set(map(tuple, candidate_pairs(batch, path, run_id=1)
                    .collect()))
    assert after == before
    # unbounded read DOES see the appended keys (intra-batch pairs)
    unbounded = set(map(tuple, candidate_pairs(batch, path).collect()))
    assert unbounded >= before


def test_planted_exact_duplicates_always_candidates(spark, tmp_path):
    """J=1.0 pairs share every band — banding recall is exactly 1 for
    identical shingle sets, whatever the s-curve does at J<1."""
    base = _docs(spark).where(
        F.size(F.split("text", " ")) >= 5).limit(20)
    hist = base.select(F.col("doc_id"), "text")
    clones = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                         "text")
    path = str(tmp_path / "idx")
    build_neardup_index(hist, path, source_fingerprint="v1")
    cands = candidate_pairs(clones, path).collect()
    got = {(r["batch_doc"] - 1_000_000, r["corpus_doc"]) for r in cands}
    want = {(r["doc_id"], r["doc_id"]) for r in hist.collect()}
    assert got >= want, "every planted clone must surface its original"


def test_build_if_stale_reuses_then_rebuilds(spark, tmp_path):
    d = _docs(spark).limit(80)
    path = str(tmp_path / "idx")
    _meta, rebuilt = build_neardup_if_stale(d, path,
                                            source_fingerprint="v1")
    assert rebuilt is True
    _meta, rebuilt = build_neardup_if_stale(d, path,
                                            source_fingerprint="v1")
    assert rebuilt is False
    _meta, rebuilt = build_neardup_if_stale(d, path,
                                            source_fingerprint="v2")
    assert rebuilt is True


def test_band_keys_deterministic_across_computations(spark):
    d = _docs(spark).limit(60)
    b1 = {tuple(r) for r in doc_bands(d).collect()}
    b2 = {tuple(r) for r in doc_bands(d).collect()}
    assert b1 == b2 and len(b1) > 0


def test_mmr_ann_contract(spark):
    """q_llm_mmr_ann: 5 diversified results per panel query from the
    persisted-index candidates, deterministic across runs, and the
    rank-1 pick equals the top ANN candidate (greedy's first step is
    pure relevance)."""
    from sparkit_learn_spark.registry import all_queries

    sf = SF
    got = all_queries()["q_llm_mmr_ann"](spark, sf).toPandas()
    assert got.groupby("qid").size().eq(5).all()
    assert (got.groupby("qid")["mmr_rank"].max() == 5).all()
    again = all_queries()["q_llm_mmr_ann"](spark, sf).toPandas()
    assert got.equals(again)
    r1 = got[got["mmr_rank"] == 1]
    assert (r1["diversity_penalty"] == 0.0).all(), \
        "first pick must be the pure-relevance argmax"
