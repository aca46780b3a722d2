"""Deduplication operators: exact (hash) and near-dup (MinHash-LSH).

Scale design: exact dedup shuffles 32-byte digests, never documents;
MinHash collapses the O(n²) comparison to per-bucket joins
(shingle → minhash signature → band → bucket join — the standard LSH
pipeline). Both are pure DataFrame transforms.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, shingles, tokens


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Group by sha2(normalized text); keep the min id per group.
    Returns (id, text_sha, n_copies)."""
    return (
        docs.select(id_col, F.sha2(normalized_text(text_col), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "text_sha", "n_copies")
    )


def minhash_candidate_pairs(docs: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 5,
                            num_hash_tables: int = 5,
                            max_jaccard_dist: float = 0.6,
                            num_features: int = 1 << 18,
                            seed: int = 42) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b, jaccard_dist).

    k-token shingle sets → binary HashingTF → MinHash signatures →
    approxSimilarityJoin at the distance threshold. jaccard_dist is
    MLlib's 1 − |A∩B|/|A∪B| over hashed shingle sets.
    """
    sh = (
        docs.select(id_col, tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= k)
        .select(id_col, F.array_distinct(shingles(F.col("toks"), k)).alias("sh"))
    )
    tf = HashingTF(inputCol="sh", outputCol="features",
                   numFeatures=num_features, binary=True)
    feat = tf.transform(sh)
    mh = MinHashLSH(inputCol="features", outputCol="sig",
                    numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, max_jaccard_dist,
                                       distCol="jaccard_dist")
    a, b = F.col(f"datasetA.{id_col}"), F.col(f"datasetB.{id_col}")
    return (
        pairs.filter(a < b)
        .select(a.alias("doc_a"), b.alias("doc_b"),
                F.round("jaccard_dist", 4).alias("jaccard_dist"))
    )
