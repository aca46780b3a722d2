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


def test_advancing_past_crashed_run_does_not_reject(spark, store):
    """ADVICE r10: history is restricted to LEDGER-COMMITTED runs, so
    a run N-1 that crashed after appending keys but before its ledger
    commit contributes no history — advancing to run N without
    retrying N-1 must re-admit those docs instead of silently
    rejecting them forever."""
    path, d = store
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    clean = admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                        test_mod=TEST_MOD).collect()
    # simulate run 1 crashing post-append, pre-ledger-commit
    runs = recorded_runs(spark, path).filter(F.col("run_id") != 1)
    rows = runs.collect()
    spark.createDataFrame(rows, recorded_runs(spark, path).schema) \
        .write.mode("overwrite").parquet(f"{path}/runs")
    # the pipeline ADVANCES to run 2 with the same docs (no retry of 1)
    r2 = admit_batch(batch, path, run_id=2, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD).collect()
    # run 1's orphaned keys are invisible: run 2 behaves as a clean
    # first presentation of the batch
    assert [tuple(r)[1:] for r in r2] == [tuple(r)[1:] for r in clean]


def test_compact_funnel_store_preserves_admissions(spark, store):
    """compact_funnel_store folds committed runs into run_id=0 without
    changing what a future admission sees: run 3 after compaction
    admits exactly what it would have admitted before (zero here,
    since its batch was already admitted), partitions collapse, and
    orphaned keys from a crashed run are discarded."""
    from sparkit_learn_spark.operators.funnel_store import (
        compact_funnel_store,
    )

    path, d = store
    b = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    b1 = b.filter((F.col("doc_id") / BATCH_MOD).cast("long") % 2 == 0)
    b2 = b.filter((F.col("doc_id") / BATCH_MOD).cast("long") % 2 == 1)
    admit_batch(b1, path, run_id=1, min_tokens=MIN_TOKENS,
                test_mod=TEST_MOD)
    admit_batch(b2, path, run_id=2, min_tokens=MIN_TOKENS,
                test_mod=TEST_MOD)
    keys_before = {r["text_sha"] for r in spark.read
                   .parquet(f"{path}/digests").select("text_sha")
                   .collect()}
    compact_funnel_store(spark, path)
    digests = spark.read.parquet(f"{path}/digests")
    assert {r["text_sha"] for r in digests.select("text_sha")
            .collect()} == keys_before
    assert {r["run_id"] for r in digests.select("run_id").distinct()
            .collect()} == {0}
    fps = spark.read.parquet(f"{path}/fingerprints")
    assert {r["run_id"] for r in fps.select("run_id").distinct()
            .collect()} == {0}
    # post-compaction behavior: re-presenting either batch admits zero
    r3 = admit_batch(b1, path, run_id=3, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD)
    assert _stage(r3, 4)["n_docs"] == 0
    r4 = admit_batch(b2, path, run_id=4, min_tokens=MIN_TOKENS,
                     test_mod=TEST_MOD)
    assert _stage(r4, 4)["n_docs"] == 0


def test_compact_discards_orphaned_uncommitted_keys(spark, store):
    """Keys from a run missing its ledger commit are dropped by
    compaction (they were already invisible to admissions) — the
    store's layout heals instead of carrying dead partitions."""
    from sparkit_learn_spark.operators.funnel_store import (
        compact_funnel_store,
    )

    path, d = store
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    admit_batch(batch, path, run_id=1, min_tokens=MIN_TOKENS,
                test_mod=TEST_MOD)
    n_committed = (spark.read.parquet(f"{path}/digests")
                   .filter(F.col("run_id") < 1).count())
    # orphan run 1: drop its ledger row, keep its keys
    runs = recorded_runs(spark, path).filter(F.col("run_id") != 1)
    rows = runs.collect()
    spark.createDataFrame(rows, recorded_runs(spark, path).schema) \
        .write.mode("overwrite").parquet(f"{path}/runs")
    compact_funnel_store(spark, path)
    digests = spark.read.parquet(f"{path}/digests")
    assert digests.count() == n_committed, \
        "orphaned run-1 keys must be discarded"
    assert {r["run_id"] for r in digests.select("run_id").distinct()
            .collect()} == {0}
