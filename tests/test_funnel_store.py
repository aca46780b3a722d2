"""Persisted-state funnel store (operators/funnel_store, wave149):
standing key tables, run-ledger idempotence, and the VERDICT r9 #6
contract — run N+1 admits ZERO docs from run N.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.operators.funnel_store import (
    admit_batch,
    init_store,
    recorded_runs,
)
from sparkit_learn_spark.queries.wave147 import BATCH_MOD, MIN_TOKENS, TEST_MOD

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(spark, tmp_path):
    d = load_table(spark, SF, "documents")
    path = str(tmp_path / "funnel")
    init_store(
        d.filter(F.col("doc_id") % BATCH_MOD != 0),
        d.filter(F.col("doc_id") % TEST_MOD == 0),
        path, source_fingerprint="fp-1")
    return path, d


def _stage(df, n):
    return df.filter(F.col("stage") == n).first()


def test_first_admission_matches_recompute_funnel(spark, store):
    """Fresh store + first admission == wave147's recompute-everything
    funnel, row for row."""
    from sparkit_learn_spark.registry import all_queries

    path, d = store
    got = admit_batch(d.filter(F.col("doc_id") % BATCH_MOD == 0), path,
                      run_id=1, min_tokens=MIN_TOKENS,
                      test_mod=TEST_MOD).collect()
    want = all_queries()["q_llm_pipeline_funnel_incremental"](
        spark, SF).collect()
    assert got == want


def test_rerun_returns_recorded_stats_without_mutation(spark, store):
    path, d = store
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    first = admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                        test_mod=TEST_MOD).collect()
    n_keys = spark.read.parquet(f"{path}/digests").count()
    again = admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                        test_mod=TEST_MOD).collect()
    assert again == first
    assert spark.read.parquet(f"{path}/digests").count() == n_keys, \
        "re-run must not append keys again"
    assert recorded_runs(spark, path).count() == 5


def test_run_n_plus_1_admits_zero_docs_from_run_n(spark, store):
    """The headline contract: re-presenting run 1's batch as run 2
    admits nothing — every survivor's digest is in the standing set,
    and every non-survivor fails the same gate it failed before."""
    path, d = store
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    r1 = admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD)
    assert _stage(r1, 4)["n_docs"] > 0, "fixture sanity: run 1 admits"
    r2 = admit_batch(batch, path, run_id=2, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD)
    assert _stage(r2, 0)["n_docs"] == _stage(r1, 0)["n_docs"]
    assert _stage(r2, 4)["n_docs"] == 0


def test_disjoint_batch_still_admits_after_run_one(spark, store):
    """The standing tables must not over-filter: a second batch of
    genuinely new docs (held out of history AND run 1) still admits."""
    path, d = store
    # split the standard batch by parity into two sub-batches; rebuild
    # the store so history excludes BOTH (they are both "future")
    b = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    b1 = b.filter((F.col("doc_id") / BATCH_MOD).cast("long") % 2 == 0)
    b2 = b.filter((F.col("doc_id") / BATCH_MOD).cast("long") % 2 == 1)
    admit_batch(b1, path, run_id=1, min_tokens=MIN_TOKENS,
                test_mod=TEST_MOD)
    r2 = admit_batch(b2, path, run_id=2, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD)
    assert _stage(r2, 4)["n_docs"] > 0, \
        "new docs must survive the standing gates"
    # and run 3 re-presenting b2 admits zero again
    r3 = admit_batch(b2, path, run_id=3, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD)
    assert _stage(r3, 4)["n_docs"] == 0


def test_run_id_zero_rejected(spark, store):
    path, d = store
    with pytest.raises(ValueError, match="run_id"):
        admit_batch(d.limit(1), path, run_id=0)


def test_crash_retry_is_blind_to_partial_append(spark, store):
    """Crash-safety: keys appended by a crashed run N are excluded
    from run N's retry by the run_id<N filter, so the recomputed stats
    equal the clean-run stats."""
    path, d = store
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    clean = admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                        test_mod=TEST_MOD).collect()
    # simulate the crash: keys + ledger written, then drop the ledger
    # row (the commit point) so the retry recomputes
    runs = recorded_runs(spark, path).filter(F.col("run_id") != 1)
    rows = runs.collect()
    spark.createDataFrame(
        rows, recorded_runs(spark, path).schema) \
        .write.mode("overwrite").parquet(f"{path}/runs")
    retry = admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                        test_mod=TEST_MOD).collect()
    assert retry == clean
