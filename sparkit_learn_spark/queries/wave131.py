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


@register(
    "q_llm_sq8_quantize",
    oracle="""
    WITH dims AS (
        SELECT CAST(u.i - 1 AS BIGINT) AS dim,
               CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS val
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS u(i)),
    rng AS (
        SELECT dim, MIN(val) AS mn, MAX(val) AS mx
        FROM dims GROUP BY dim),
    coded AS (
        SELECT d.dim, d.val, r.mn, r.mx,
               LEAST(255, GREATEST(0,
                   FLOOR((d.val - r.mn) * 255.0 / (r.mx - r.mn) + 0.5)))
                   AS code
        FROM dims d JOIN rng r ON r.dim = d.dim)
    SELECT CAST(dim AS BIGINT) AS dim,
           ROUND(mn, 6) AS dim_min,
           ROUND(mx, 6) AS dim_max,
           ROUND(AVG(ABS(mn + code * (mx - mn) / 255.0 - val)), 6)
               AS mean_abs_err
    FROM coded
    GROUP BY dim, mn, mx
    ORDER BY dim
    """,
)
def q_llm_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (SQ8) of the embedding corpus — the
    standard 4x storage compression for vector indexes (FAISS
    ScalarQuantizer): per-dimension [min, max] learned from the
    corpus, each value coded to floor((x-mn)*255/(mx-mn)+0.5), and
    the per-dim mean absolute reconstruction error reported — the
    audit that decides whether SQ8 (or PQ, its lossier sibling in
    q_llm_ann_ivfpq) is safe for a given corpus. All math is IEEE
    double + integer codes, so the oracle is exact.

    Scale: two shuffles at (dim)-grain (range learn, error agg) over
    the posexploded corpus; codes never materialize corpus-wide here
    — storage writers stream them per batch. At 100 TB the range
    statistics come from a sample; the error audit is the same plan."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("dim", "val")
    )
    rng = dims.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    code = F.least(F.lit(255.0), F.greatest(F.lit(0.0), F.floor(
        (F.col("val") - F.col("mn")) * 255.0
        / (F.col("mx") - F.col("mn")) + 0.5)))
    recon = F.col("mn") + code * (F.col("mx") - F.col("mn")) / 255.0
    return (
        dims.join(F.broadcast(rng), "dim")
        .groupBy(F.col("dim").cast("long").alias("dim"),
                 F.round("mn", 6).alias("dim_min"),
                 F.round("mx", 6).alias("dim_max"))
        .agg(F.round(F.avg(F.abs(recon - F.col("val"))), 6)
             .alias("mean_abs_err"))
        .orderBy("dim")
    )


@register("q_llm_semdedup_recall")  # rows-only: depends on kmeans cells
def q_llm_semdedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup recall audit: of the EXACT cosine>=0.4 pairs, how many
    did cluster-bounded dedup actually fold (at most one side kept)?
    The honest price tag of the cluster trade — read beside
    q_llm_semdedup_stats (the denominator) and q_llm_embed_cosine_dedup
    (the LSH recall-first alternative). One output row:
    (n_true_pairs, n_deduped, recall).

    Scale: truth pairs come from the same guarded broadcast-BLAS
    sweep as q_llm_semdedup_stats; the join against keeper flags is
    pair-grain. At 100 TB the audit runs on a sample."""
    import numpy as np
    import pandas as pd

    from ..operators.similarity import _spread, semdedup

    e = load_table(spark, sf_dir, "embeddings")
    cand = e.select("vec_id", "embedding").collect()  # fixture-bounded audit
    ids = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    C = np.array([np.asarray(r["embedding"], np.float64) for r in cand])
    sc = spark.sparkContext
    b_ids, b_C = sc.broadcast(ids), sc.broadcast(C)

    def true_pairs(batches):
        cn, cm = b_ids.value, b_C.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, np.float64) for v in pdf["embedding"]])
            qid = pdf["vec_id"].to_numpy()
            hit = (X @ cm.T >= 0.4) & (cn[None, :] > qid[:, None])
            qi, cj = np.nonzero(hit)
            yield pd.DataFrame({"vec_a": qid[qi], "vec_b": cn[cj]})

    pairs = _spread(e.select("vec_id", "embedding")).mapInPandas(
        true_pairs, schema="vec_a long, vec_b long"
    )
    keeps = semdedup(e, threshold=0.4, seed=SEED).select("vec_id", "keep")
    ka = keeps.select(F.col("vec_id").alias("vec_a"),
                      F.col("keep").alias("keep_a"))
    kb = keeps.select(F.col("vec_id").alias("vec_b"),
                      F.col("keep").alias("keep_b"))
    return (
        pairs.join(F.broadcast(ka), "vec_a").join(F.broadcast(kb), "vec_b")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum((~(F.col("keep_a") & F.col("keep_b"))).cast("long"))
             .alias("n_deduped"),
        )
        .select(
            "n_true_pairs", "n_deduped",
            F.round(F.col("n_deduped")
                    / F.col("n_true_pairs").cast("double"), 6)
             .alias("recall"),
        )
    )
