"""Round-9 wave 146: persisted ANN index lifecycle (VERDICT r8 #4).

Build once, persist, probe many — the first capability a production
100 TB similarity user needs that the surface lacked: every earlier
q_llm_ann* retrains its quantizer/codebooks per call. Here the IVF-PQ
index persists as parquet under the Spark warehouse dir (the
bucketing.py amortize-one-expensive-pass pattern), keyed by a corpus
fingerprint so staleness rebuilds instead of silently probing wrong
neighbors.

  q_llm_ann_persisted       rows-only (approximate neighbors by
                            design); value-pinned against the
                            fresh-build ivf_pq_topk path + recall
                            vs exact in tests/test_ann_index.py
  q_llm_ann_index_coverage  EXACTLY oracled: the persisted codes
                            partition must hold every corpus vector
                            exactly once — integrity of the index
                            file layout is SQL-checkable even though
                            neighbor sets are not.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.ann_index import build_if_stale, probe_index
from ..registry import register

#: fixed probe panel: the PANEL_N lowest vec_ids (deterministic).
PANEL_N = 64


def _index_path(spark: SparkSession, sf_dir: str) -> str:
    """Per-scale index location under the session warehouse dir (the
    write_bucketed namespacing convention)."""
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(wh, "ann_index", token)


def _fingerprint(sf_dir: str) -> str:
    """Corpus identity: size+mtime of the embeddings parquet — changes
    whenever the driver regenerates the fixture, so a new round's data
    triggers a rebuild instead of probing a stale index."""
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return f"{st.st_size}:{st.st_mtime_ns}"


def _built_index(spark: SparkSession, sf_dir: str) -> tuple[str, dict, bool]:
    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_path(spark, sf_dir)
    meta, rebuilt = build_if_stale(
        emb, path, source_fingerprint=_fingerprint(sf_dir), seed=42)
    return path, meta, rebuilt


@register("q_llm_ann_persisted")  # rows-only: ANN neighbor sets are
# engine-specific by design; pinned in tests/test_ann_index.py against
# the fresh-build IVF-PQ path and an exact-recall floor.
def q_llm_ann_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors for a fixed {PANEL_N}-query panel from the
    PERSISTED IVF-PQ index: loads centroids+codebooks (driver state,
    corpus-size-independent), scans only the probed lists' code
    partitions (hive partition pruning on list_id), ADC-scores, and
    exactly re-ranks against the raw vector store.

    First call per fixture builds the index (one corpus encode pass +
    one shuffle by list_id); every later call — this session or the
    next, the warehouse dir survives — skips training entirely and
    pays only the probe. Staleness is fingerprint-guarded: a
    regenerated fixture rebuilds, a matching one reuses.

    Scale: the amortization IS the point at 100 TB — quantizer
    training and corpus encoding are once-per-corpus-version, probes
    read √n_lists of the code partitions (pruned scan), candidates
    join vectors by id. Cited shape: faiss IVFPQ + refine."""
    path, _meta, _rebuilt = _built_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    panel = emb.orderBy("vec_id").limit(PANEL_N)
    return probe_index(
        spark, path, panel, k=5, refine=4, corpus=emb,
        expected_fingerprint=_fingerprint(sf_dir),
    )


@register(
    "q_llm_ann_index_coverage",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_codes,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_distinct_ids,
           CAST(MIN(vec_id) AS BIGINT) AS min_id,
           CAST(MAX(vec_id) AS BIGINT) AS max_id
    FROM embeddings
    """,
)
def q_llm_ann_index_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity audit of the PERSISTED index read back from disk: the
    codes partition must contain every corpus vector exactly once
    (count, distinct-id count, id range all match the source table).
    The one part of an ANN index that IS exactly SQL-oracled — the
    layout's completeness, not the (by-design approximate) neighbor
    sets. Catches dropped partitions, double-encodes, and truncated
    writes in the persisted layout."""
    path, _meta, _rebuilt = _built_index(spark, sf_dir)
    codes = spark.read.parquet(f"{path}/codes")
    return codes.agg(
        F.count("*").cast("long").alias("n_codes"),
        F.countDistinct("id").cast("long").alias("n_distinct_ids"),
        F.min("id").cast("long").alias("min_id"),
        F.max("id").cast("long").alias("max_id"),
    )
