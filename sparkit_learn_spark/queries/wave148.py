"""Round-9 wave 148: incremental ANN index maintenance — append a new
vector batch to the persisted IVF-PQ index WITHOUT retraining (the
faiss ``add`` contract), completing the index lifecycle wave146
opened: build → persist → probe → APPEND → probe.

  q_llm_ann_index_append  EXACTLY oracled: after building from history
                          (vec_id % 7 ≠ 0) and appending the batch
                          (vec_id % 7 = 0), the read-back codes must
                          cover the FULL corpus exactly once — same
                          integrity contract as
                          q_llm_ann_index_coverage, now across an
                          incremental write.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.ann_index import (
    append_to_index,
    build_if_stale,
    load_meta,
)
from ..registry import register

#: batch selector — matches the incremental-funnel convention.
BATCH_MOD = 7


def _paths(spark: SparkSession, sf_dir: str) -> str:
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(wh, "ann_index_inc", token)


def _fp(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return f"{st.st_size}:{st.st_mtime_ns}"


@register(
    "q_llm_ann_index_append",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_codes,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_distinct_ids,
           CAST(SUM(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_appended
    FROM embeddings
    """,
)
def q_llm_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index ingest: build the IVF-PQ index from HISTORY
    vectors only, then append the incoming batch against the frozen
    quantizer (no retrain — batch-sized cost), then audit the
    read-back codes: full-corpus coverage exactly once, with the
    appended share accounted separately. Idempotent across calls via
    the fingerprint ladder (hist-fp → full-fp): a re-run on the same
    fixture reuses the already-appended index; a regenerated fixture
    rebuilds from scratch.

    Scale: this is how a 100 TB similarity service actually ingests —
    daily batches encode against the standing quantizer and land as
    new code partitions; rebuild only when ivf_list_balance's cv
    degrades. Probe semantics over the appended index are pinned in
    tests/test_ann_index.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    history = emb.filter(F.col("vec_id") % BATCH_MOD != 0)
    batch = emb.filter(F.col("vec_id") % BATCH_MOD == 0)
    path = _paths(spark, sf_dir)
    hist_fp = "hist:" + _fp(sf_dir)
    full_fp = "full:" + _fp(sf_dir)

    appended = False
    try:
        appended = load_meta(spark, path)["source_fingerprint"] == full_fp
    except Exception:
        pass
    if not appended:
        _meta, _rebuilt = build_if_stale(
            history, path, source_fingerprint=hist_fp, seed=42)
        append_to_index(batch, path,
                        expected_fingerprint=hist_fp,
                        new_fingerprint=full_fp)

    codes = spark.read.parquet(f"{path}/codes")
    batch_ids = batch.select(F.col("vec_id").alias("id"))
    return codes.join(batch_ids.withColumn("_b", F.lit(1)), "id", "left").agg(
        F.count("*").cast("long").alias("n_codes"),
        F.countDistinct("id").cast("long").alias("n_distinct_ids"),
        F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("long")
        .alias("n_appended"),
    )
