"""Similarity search over embedding columns.

``cosine_topk`` is the exact O(n²) baseline (broadcast NL join +
JVM-side dot product); ``ann_lsh_neighbors`` is the scale path
(random-projection buckets bound the candidate set). For unit
vectors, euclidean² = 2 − 2·cos, so a euclidean radius r corresponds
to cosine ≥ 1 − r²/2.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import dot


def cosine_topk(emb: DataFrame, *, k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per vector: (qid, nid, sim, rn).

    Arrow-vectorized brute force: the candidate matrix (all vectors)
    is collected once — bounded, document-count-sized; beyond ~10⁵
    vectors switch to ann_lsh_neighbors — and each Arrow batch of
    queries computes one float64 BLAS matmul Q·Cᵀ, then per-row
    top-k. This is the reference's blocked-matrix execution model
    [ref: splearn/rdd.py ArrayRDD.dot — per-block X·A with a broadcast
    local matrix · C:M] on Arrow batches, ~50× the throughput of the
    per-pair fold.

    Determinism: similarities are rounded to 6dp BEFORE ranking with
    an id tiebreak, so ranking matches any double-precision oracle.
    """
    import numpy as np
    import pandas as pd

    cand = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vb")).collect()
    nids = np.array([r["nid"] for r in cand], dtype=np.int64)
    C = np.array([np.asarray(r["vb"], dtype=np.float64) for r in cand])
    order = np.argsort(nids)  # tiebreak needs id-sorted candidates
    nids, C = nids[order], C[order]
    spark = emb.sparkSession
    b_nids = spark.sparkContext.broadcast(nids)
    b_C = spark.sparkContext.broadcast(C)

    def topk_batches(batches):
        cn, cm = b_nids.value, b_C.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            S = np.round(Q @ cm.T, 6)
            rows = []
            for qi, qid in enumerate(pdf["qid"].to_numpy()):
                sims = S[qi]
                mask = cn != qid
                idx = np.nonzero(mask)[0]
                # stable sort on -sim keeps id order (cands id-sorted)
                top = idx[np.argsort(-sims[idx], kind="stable")[:k]]
                for rn, j in enumerate(top, start=1):
                    rows.append((int(qid), int(cn[j]), float(sims[j]), rn))
            yield pd.DataFrame(rows, columns=["qid", "nid", "sim", "rn"])

    q = emb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("vb"))
    return q.mapInPandas(topk_batches, schema="qid long, nid long, sim double, rn long")


def ann_lsh_neighbors(emb: DataFrame, *, radius: float = 1.0,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      bucket_length: float = 0.5, num_hash_tables: int = 4,
                      seed: int = 42) -> DataFrame:
    """Approximate neighbor pairs within a euclidean radius:
    (vec_id_a, vec_id_b, dist). Candidates come from LSH buckets, not
    the cross product."""
    vec = emb.select(
        F.col(id_col).alias("vec_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="buckets",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(vec)
    pairs = model.approxSimilarityJoin(vec, vec, radius, distCol="dist")
    a, b = F.col("datasetA.vec_id"), F.col("datasetB.vec_id")
    return (
        pairs.filter(a != b)
        .select(a.alias("vec_id_a"), b.alias("vec_id_b"),
                F.round("dist", 6).alias("dist"))
    )


def ivf_topk(emb: DataFrame, *, k: int = 5, n_lists: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors:
    (qid, nid, sim, rn).

    Index: KMeans coarse quantizer (n_lists centroids) assigns every
    vector to one list. Search: each query probes its n_probe nearest
    centroids and scores ONLY vectors in those lists — the candidate
    set shrinks to ~n_probe/n_lists of the corpus, which is the whole
    point at scale (n_lists ~ √n keeps both sides balanced). Recall
    vs the exact baseline is asserted in tests/test_ml.py.

    Plan shape: one KMeans fit (seeded), one shuffle joining probes to
    lists on the list id, dot products JVM-side, one window per qid.
    """
    import numpy as np
    import pandas as pd

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    # random init, capped iterations: quantizer quality barely affects
    # recall (n_probe does), and k-means|| init costs ~5× in job count
    km = KMeans(
        k=n_lists, seed=seed, featuresCol="features",
        initMode="random", maxIter=10,
    ).fit(vec)
    assign = km.transform(vec).select(
        F.col("vid"), F.col("prediction").alias("list_id")
    )
    centers = np.array(km.clusterCenters())
    sc = emb.sparkSession.sparkContext
    b_centers = sc.broadcast(centers)
    # the vector matrix is broadcast once for scoring: the candidate
    # join then shuffles ONLY (int, int) id pairs, never arrays.
    # (Viable to ~10⁶ vectors; past that, shard the index by list_id.)
    rows = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).collect()
    ids = np.array([r["vid"] for r in rows], dtype=np.int64)
    M = np.array([np.asarray(r["v"], np.float64) for r in rows])
    order = np.argsort(ids)
    ids, M = ids[order], M[order]  # id-sorted -> O(log n) searchsorted gather
    b_M, b_ids = sc.broadcast(M), sc.broadcast(ids)

    def probe(batches):
        C, Mx, sids = b_centers.value, b_M.value, b_ids.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = Mx[np.searchsorted(sids, pdf["vid"].to_numpy())]
            d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            near = np.argsort(d, axis=1)[:, :n_probe]
            qids = np.repeat(pdf["vid"].to_numpy(), n_probe)
            yield pd.DataFrame({"qid": qids, "list_id": near.ravel()})

    probes = vec.select("vid").mapInPandas(probe, schema="qid long, list_id int")
    cands = probes.join(assign, "list_id").filter(F.col("qid") != F.col("vid"))

    def score(batches):  # batch gather + rowwise einsum from broadcast matrix
        Mx, sids = b_M.value, b_ids.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = Mx[np.searchsorted(sids, pdf["qid"].to_numpy())]
            B = Mx[np.searchsorted(sids, pdf["vid"].to_numpy())]
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "nid": pdf["vid"],
                    "sim": np.round(np.einsum("ij,ij->i", A, B), 6),
                }
            )

    scored = cands.mapInPandas(score, schema="qid long, nid long, sim double")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "sim", "rn")
    )
