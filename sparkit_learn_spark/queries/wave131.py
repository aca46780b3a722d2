"""Round-7 wave 131: SemDeDup-style semantic dedup (cluster-then-
dedup-within-cluster, the published scale recipe for embedding-level
near-dup removal) and its survivor statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SEED = 42


@register("q_llm_semdedup")  # rows-only: kmeans cluster ids are
# engine-internal; exactness within clusters is pytest-verified
# against the brute-force pair set (tests/test_ml.py)
def q_llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup over the embeddings corpus
    (operators/similarity.py:semdedup): ~sqrt(n) KMeans clusters bound
    the quadratic term to sum(|cluster|^2); within each cluster, exact
    cosine >= 0.4 pairs fold under a local union-find and each dup
    group keeps its minimum vec_id. One row per vector:
    (vec_id, keep, dup_of).

    Scale: the only driver state is the centroid matrix (~sqrt(n) x d);
    vectors shuffle ONCE (by cluster); each task's matmul is ~sqrt(n)
    x sqrt(n), streamed in 4096-row chunks. Cross-cluster dups are
    deliberately traded away (the paper's recall/cost trade) — the
    LSH-candidates path (q_llm_embed_cosine_dedup) is the recall-first
    twin, and their survivor counts are cross-checked in pytest."""
    from ..operators.similarity import semdedup

    e = load_table(spark, sf_dir, "embeddings")
    return (semdedup(e, threshold=0.4, seed=SEED)
            .select("vec_id", "keep", "dup_of")  # cluster ids are seed-internal
            .orderBy("vec_id"))


@register(
    "q_llm_semdedup_stats",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) >= 0.4),
    nodes AS (
        SELECT vec_a AS v FROM pairs UNION SELECT vec_b FROM pairs),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM embeddings)
    SELECT n.total AS n_vectors,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_dup_pairs,
           CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_in_dup_pairs,
           ROUND((SELECT COUNT(*) FROM nodes) / CAST(n.total AS DOUBLE), 6)
               AS dup_involvement_rate
    FROM n
    """,
)
def q_llm_semdedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth statistics for the semantic-dedup family: exact
    count of cosine>=0.4 pairs and the share of vectors involved —
    the denominator every approximate dedup (SemDeDup clusters, LSH
    buckets) is judged against. Exactly oracled (DuckDB computes the
    same exact pair set).

    Scale: exact O(n^2) math through the SAME broadcast-matrix BLAS
    shape as q_llm_cosine_topk — one matmul per Arrow batch against
    the broadcast candidate matrix, emitting only two per-batch
    partial counts. (r7: the first version expressed the pair set as
    a `vec_a < vec_b` theta join, which Spark planned as a
    BroadcastNestedLoopJoin with a per-pair JVM array fold — 11x of
    linear at sf1, the round's one measured cliff; this form is 0.1x.)
    At 100 TB the audit runs on a sample, never the corpus."""
    import numpy as np
    import pandas as pd

    from ..functions.vector import dot
    from ..operators.similarity import DEFAULT_MAX_BROADCAST_ROWS, _spread

    e = load_table(spark, sf_dir, "embeddings")
    # bounded-scan broadcast guard (same contract as cosine_topk):
    # above the cap fall back to the distributed exact pair join —
    # slower but never a driver-sized collect
    if (e.limit(DEFAULT_MAX_BROADCAST_ROWS + 1).count()
            > DEFAULT_MAX_BROADCAST_ROWS):
        a = e.select(F.col("vec_id").alias("vec_a"),
                     F.col("embedding").alias("va"))
        b = e.select(F.col("vec_id").alias("vec_b"),
                     F.col("embedding").alias("vb"))
        pairs = (
            a.join(b, F.col("vec_a") < F.col("vec_b"))
            .withColumn("sim", dot("va", "vb"))
            .filter(F.col("sim") >= 0.4)
            .select("vec_a", "vec_b")
        )
        nodes = (pairs.select(F.col("vec_a").alias("v"))
                 .union(pairs.select(F.col("vec_b"))).distinct())
        total = e.agg(F.count(F.lit(1)).alias("n_vectors"))
        return (
            total.crossJoin(F.broadcast(
                pairs.agg(F.count(F.lit(1)).alias("n_dup_pairs"))))
            .crossJoin(F.broadcast(
                nodes.agg(F.count(F.lit(1)).alias("n_in_dup_pairs"))))
            .select(
                "n_vectors", "n_dup_pairs", "n_in_dup_pairs",
                F.round(F.col("n_in_dup_pairs")
                        / F.col("n_vectors").cast("double"), 6)
                 .alias("dup_involvement_rate"),
            )
        )
    cand = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    C = np.array([np.asarray(r["embedding"], np.float64) for r in cand])
    sc = spark.sparkContext
    b_ids, b_C = sc.broadcast(ids), sc.broadcast(C)

    def partials(batches):
        cn, cm = b_ids.value, b_C.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, np.float64) for v in pdf["embedding"]])
            qid = pdf["vec_id"].to_numpy()
            S = X @ cm.T
            hit = S >= 0.4
            # pair count at (a < b) grain: neighbors with larger id
            n_pairs = int((hit & (cn[None, :] > qid[:, None])).sum())
            # involvement: any >=0.4 neighbor other than self
            inv = (hit & (cn[None, :] != qid[:, None])).any(1)
            yield pd.DataFrame({"n_pairs": [n_pairs],
                                "n_involved": [int(inv.sum())],
                                "n_rows": [len(qid)]})

    agg = (
        _spread(e.select("vec_id", "embedding"))
        .mapInPandas(partials,
                     schema="n_pairs long, n_involved long, n_rows long")
        .agg(F.sum("n_pairs").alias("n_dup_pairs"),
             F.sum("n_involved").alias("n_in_dup_pairs"),
             F.sum("n_rows").alias("n_vectors"))
    )
    return agg.select(
        "n_vectors", "n_dup_pairs", "n_in_dup_pairs",
        F.round(F.col("n_in_dup_pairs")
                / F.col("n_vectors").cast("double"), 6)
         .alias("dup_involvement_rate"),
    )
