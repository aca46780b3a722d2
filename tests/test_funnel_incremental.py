"""Incremental corpus-prep funnel (wave147): stage semantics and the
batch≡stream parity of its near-dup gate across a two-trigger
checkpoint restart (VERDICT r8 #8 "done" criteria).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.registry import all_oracles, all_queries
from sparkit_learn_spark.streaming import transforms as T
from sparkit_learn_spark.testing import duck_connect, compare_frames

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]
NAME = "q_llm_pipeline_funnel_incremental"


@pytest.mark.parametrize("sf", SFS)
def test_funnel_incremental_oracle_parity_all_sfs(spark, sf):
    """Exactly oracled at ALL THREE fixture SFs (the verdict's done
    bar), not just the driver's sf0.01."""
    con = duck_connect(sf)
    try:
        compare_frames(
            all_queries()[NAME](spark, sf).toPandas(),
            con.sql(all_oracles()[NAME]).df(), name=f"{NAME}@{sf}")
    finally:
        con.close()


def test_funnel_stages_monotone(spark):
    rows = {r["stage_name"]: r for r in
            all_queries()[NAME](spark, "/root/testdata/sf0.01").collect()}
    order = ["raw_batch", "exact_dedup", "neardup_gate",
             "quality_gate", "decontaminated"]
    counts = [rows[s]["n_docs"] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0 and counts[-1] >= 0
    assert rows["raw_batch"]["batch_share"] == 1.0


def test_funnel_neardup_gate_stream_restart_parity(spark, tmp_path):
    """The funnel's stage-2 surviving set must be reproducible by the
    TRUE streaming near-dup gate run over the stage-1 survivors in two
    triggers with a checkpoint restart between them — with planted
    cross-trigger duplicates, so trigger-2 survival depends on state
    restored from the checkpoint."""
    sf = "/root/testdata/sf0.01"
    from sparkit_learn_spark.queries.wave147 import BATCH_MOD
    from sparkit_learn_spark.sources.parquet_io import (
        documents_batch_with_ingest_ts)

    docs = documents_batch_with_ingest_ts(spark, sf).select(
        "doc_id", "text", "source", "ingest_ts")
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
    history = docs.filter(F.col("doc_id") % BATCH_MOD != 0)
    hist_fp = (history
               .select(T.neardup_fingerprint(F.col("text")).alias("fp"))
               .distinct().cache())

    # stage-1 survivors (exact dedup) = the stream's input
    sha = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    b1 = batch.withColumn("text_sha", sha)
    intra = b1.groupBy("text_sha").agg(F.min("doc_id").alias("doc_id"))
    hist_sha = history.select(sha.alias("text_sha")).distinct()
    s1 = (b1.join(intra.select("doc_id"), "doc_id")
          .join(hist_sha, "text_sha", "left_anti")
          .select("doc_id", "text", "source", "ingest_ts").cache())

    src = str(tmp_path / "src")
    os.makedirs(src)
    even = s1.filter(F.col("doc_id") % 2 == 0)
    odd = s1.filter(F.col("doc_id") % 2 == 1)
    even.coalesce(1).write.parquet(src + "/t1.dir")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, source string, "
                "ingest_ts timestamp")
            .option("recursiveFileLookup", "true").parquet(src)
        )
        q = (T.neardup_dedup_stream(stream, hist_fp)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run_available()
    assert spark.read.parquet(sink).count() > 0
    # trigger 2 after restart: the odd docs PLUS re-sent even docs
    # (cross-trigger duplicates — survive only if state restored)
    odd.unionAll(even).coalesce(1).write.parquet(src + "/t2.dir")
    run_available()
    out = spark.read.parquet(sink)

    # parity: the stream's surviving fp set == the funnel's stage-2 set
    funnel_s2 = (
        s1.withColumn("fp", T.neardup_fingerprint(F.col("text")))
        .join(hist_fp, "fp", "left_anti")
        .select("fp").distinct()
    )
    stream_fps = {r["fp"] for r in out.select("fp").distinct().collect()}
    batch_fps = {r["fp"] for r in funnel_s2.collect()}
    assert stream_fps == batch_fps
    # no fingerprint emitted twice across the restart
    assert out.groupBy("fp").count().filter(F.col("count") > 1).count() == 0


def test_funnel_incremental_admits_only_novel_text(spark):
    """Every admitted doc's digest and fingerprint are absent from
    history — the funnel can never re-admit known content."""
    sf = "/root/testdata/sf0.01"
    from sparkit_learn_spark.queries.wave147 import BATCH_MOD

    d = load_table(spark, sf, "documents")
    sha = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    hist = d.filter(F.col("doc_id") % BATCH_MOD != 0)
    hist_keys = (hist.select(sha.alias("k")).union(
        hist.select(T.neardup_fingerprint(F.col("text")).alias("k")))
        .distinct())
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    intra = (batch.withColumn("text_sha", sha)
             .groupBy("text_sha").agg(F.min("doc_id").alias("doc_id")))
    fresh = (batch.join(intra.select("doc_id"), "doc_id")
             .withColumn("text_sha", sha)
             .join(hist.select(sha.alias("text_sha")).distinct(),
                   "text_sha", "left_anti")
             .withColumn("fp", T.neardup_fingerprint(F.col("text")))
             .join(hist.select(
                 T.neardup_fingerprint(F.col("text")).alias("fp"))
                 .distinct(), "fp", "left_anti"))
    leaked = (fresh.select(F.col("text_sha").alias("k"))
              .union(fresh.select(F.col("fp").alias("k")))
              .join(hist_keys, "k"))
    assert leaked.count() == 0
