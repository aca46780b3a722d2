"""Round-6 wave 66: hubness audit — the k-occurrence distribution of
the kNN graph over an embedding sample (how often each vector appears
in others' top-k), with moment-based skewness. Exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_hubness",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 10 = 0 AND vec_id < 5000),
    sims AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               ROUND(list_sum(list_transform(
                     list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                     6) AS sim
        FROM s a JOIN s b ON b.vec_id <> a.vec_id),
    topk AS (
        SELECT cid
        FROM (SELECT qid, cid,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, cid) AS rn
              FROM sims)
        WHERE rn <= 10),
    occ AS (
        SELECT s.vec_id,
               CAST(COALESCE(o.n, 0) AS BIGINT) AS n_k
        FROM s LEFT JOIN (
            SELECT cid, CAST(COUNT(*) AS BIGINT) AS n
            FROM topk GROUP BY cid) o ON o.cid = s.vec_id),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_k) AS BIGINT) AS s1,
               CAST(SUM(n_k * n_k) AS BIGINT) AS s2,
               CAST(SUM(n_k * n_k * n_k) AS BIGINT) AS s3,
               CAST(MAX(n_k) AS BIGINT) AS max_occ,
               CAST(SUM(CASE WHEN n_k = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_orphans
        FROM occ)
    SELECT n AS n_vectors, max_occ, n_orphans,
           ROUND((s3 / CAST(n AS DOUBLE)
                  - 3.0 * (s1 / CAST(n AS DOUBLE))
                        * (s2 / CAST(n AS DOUBLE))
                  + 2.0 * (s1 / CAST(n AS DOUBLE))
                        * (s1 / CAST(n AS DOUBLE))
                        * (s1 / CAST(n AS DOUBLE)))
                 / POWER(s2 / CAST(n AS DOUBLE)
                         - (s1 / CAST(n AS DOUBLE))
                           * (s1 / CAST(n AS DOUBLE)), 1.5), 6)
               AS hubness_skewness
    FROM m
    """,
)
def q_ml_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit: the k-occurrence distribution of the 10-NN
    graph over the FIXED 500-vector panel (every 10th id under
    5000 — bounded, so the probe's cost is constant in corpus
    size) — how often each
    vector appears in OTHERS' top-10 — summarized by its max, orphan
    count (vectors in nobody's top-10), and moment-based skewness:
    high positive skew is the high-dimensional 'hub' pathology where
    a few vectors dominate every neighbor list, silently degrading
    kNN classification and ANN recall. Exact integer occurrence
    moments; deterministic ranking as everywhere.

    Scale: quadratic IN THE BOUNDED PANEL only (the estimator
    probes hubness, it doesn't need the full graph — an unbounded
    %-sample would grow quadratically with the corpus, measured
    1.7× of linear before the cap); at 100 TB build the occurrence
    counts from the ANN index's candidate lists instead — the
    aggregation contract (count by cid, moment rollup) is
    unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 5000)
    ).select("vec_id", "embedding")
    a = s.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("ea"))
    b = s.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("eb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = a.join(F.broadcast(b), F.col("cid") != F.col("qid")).select(
        "qid", "cid", F.round(dot, 6).alias("sim")
    )
    wk = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
    topk = sims.select(
        "cid", F.row_number().over(wk).alias("rn")
    ).filter(F.col("rn") <= 10)
    occ_counts = topk.groupBy("cid").agg(F.count("*").alias("n"))
    occ = s.join(occ_counts, s.vec_id == occ_counts.cid, "left").select(
        F.coalesce("n", F.lit(0)).cast("long").alias("n_k")
    )
    m = occ.agg(
        F.count("*").alias("n"),
        F.sum("n_k").alias("s1"),
        F.sum(F.col("n_k") * F.col("n_k")).alias("s2"),
        F.sum(F.col("n_k") * F.col("n_k") * F.col("n_k")).alias("s3"),
        F.max("n_k").alias("max_occ"),
        F.sum(F.when(F.col("n_k") == 0, 1).otherwise(0)).alias("n_orphans"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3.0 * mu * (F.col("s2") / n) + 2.0 * mu * mu * mu
    return m.select(
        F.col("n").alias("n_vectors"),
        "max_occ",
        "n_orphans",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("hubness_skewness"),
    )
