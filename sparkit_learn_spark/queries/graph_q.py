"""Graph queries over the near-dup document graph (round 6): degree
centrality (exactly oracled by reusing the exact-Jaccard pair SQL as
a CTE) and PageRank (iterative; rows-only with a numpy-oracle pytest,
tests/test_graph.py). The graph's edges are the exact shingle-Jaccard
near-dup pairs — deterministic in both engines, unlike the
xxhash-based MinHash candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register("q_graph_degree")
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree centrality of the near-dup graph: how many documents
    each document is near-duplicate to — the fan-out statistic that
    finds template/boilerplate clusters (high degree = one text
    duplicated everywhere).

    Scale: one explode of the (already candidate-bounded) pair list +
    one count — edge-grain, never all-pairs. explode, not a unionAll
    of two selects: the union form would execute the expensive
    candidate-verify pair lineage TWICE."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    return (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
    )


set_oracle("q_graph_degree", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]})
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
FROM (SELECT doc_a AS doc_id FROM pairs
      UNION ALL SELECT doc_b AS doc_id FROM pairs)
GROUP BY doc_id
""")


@register("q_graph_pagerank")  # rows-only: float fixpoint — numpy-oracled in pytest
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup graph (damping 0.85, 10
    iterations): ranks the CANONICAL document inside each duplicate
    cluster higher than its satellites — a principled keep-choice for
    dedup (keep the highest-rank member), vs keep-min-id's arbitrary
    one. Iterative edges⋈ranks aggregation per iteration
    (operators/graph.py); numpy power-iteration parity asserted in
    tests/test_graph.py.

    Scale: node-grain state, edge-grain shuffle per iteration, fixed
    iteration count, one pinned checkpoint — the web-scale shape."""
    from ..operators.graph import pagerank

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    ranks = pagerank(pairs.select(F.col("doc_a").alias("src"),
                                  F.col("doc_b").alias("dst")))
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round("rank", 8).alias("rank"),
    )
