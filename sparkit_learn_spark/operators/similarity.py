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
    Similarity is rounded to 6dp BEFORE ranking (id tiebreak) so the
    ranking is deterministic across engines."""
    a = emb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        pairs.withColumn("sim", F.round(dot("va", "vb"), 6))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "sim", "rn")
    )


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
