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


#: Shingles appearing in more documents than this are treated as
#: boilerplate and excluded from CANDIDATE GENERATION (never from
#: verification): one viral shingle ("all rights reserved...") would
#: otherwise create a quadratic candidate bucket. Far above any
#: fixture's max shingle doc-frequency (4 at sf0.1), so fixture
#: results are byte-identical with or without the cap.
DEFAULT_MAX_SHINGLE_DF = 100


def shingle_index(docs: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Distinct (id, shingle) inverted-index rows for k-token shingles
    of documents with ≥ k tokens.

    r11 negative result (guide §1.1): spreading the single-row-group
    fixture scan here (catalog.spread_scan) was tried and REVERTED —
    the map itself is cheap, but every localCheckpoint consumer then
    reads 32 tiny partitions and pays per-task overhead on each of its
    ~6 downstream aggregates/joins (q_llm_setjoin_prefix 1.2 -> 5.8 s,
    q_llm_ngram_jaccard 0.9 -> 2.2 s). The spread belongs where ONE
    heavy JVM map dominates (q_llm_lsh_bucket_stats), not ahead of a
    many-consumer checkpoint."""
    return (
        docs.select(id_col, tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= k)
        .select(id_col,
                F.explode(F.array_distinct(shingles(F.col("toks"), k))).alias("sh"))
    )


def shingle_candidate_pairs(index: DataFrame, *, id_col: str = "doc_id",
                            max_df: int = DEFAULT_MAX_SHINGLE_DF) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) sharing ≥ 1 NON-VIRAL shingle.

    Shingles with document frequency > ``max_df`` are dropped before
    the inverted-index self-join — the hot set is tiny at any scale
    (by definition each member appears in many docs), so it travels as
    a broadcast anti-join, and the per-bucket join cost is bounded by
    max_df² per shingle instead of unbounded. Candidates only — exact
    verification (Jaccard / edit distance) stays the caller's job and
    runs over the FULL shingle/text data, so the cap can only shrink
    the candidate set, never corrupt a verified metric.
    """
    hot = (
        index.groupBy("sh").agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("sh")
    )
    rare = index.join(F.broadcast(hot), "sh", "left_anti")
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def shingle_pair_common_counts(index: DataFrame, *, id_col: str = "doc_id",
                               max_df: int = DEFAULT_MAX_SHINGLE_DF) -> DataFrame:
    """(doc_a, doc_b, n_common) — EXACT shared-shingle counts for every
    pair sharing ≥1 non-viral shingle, in ONE pass over the inverted
    index: the rare self-join already emits one row per shared rare
    shingle per pair, so aggregating it IS the intersection count —
    no distinct + re-join of the full index afterwards (measured ~25%
    faster than the join-back verify at sf0.1). Shared HOT (df >
    max_df) shingles are counted separately over the tiny hot slice
    and added back, so n_common stays exact over the FULL index while
    candidate generation stays bounded by max_df² per bucket.

    AQE caveat (r9, measured at the 100× fixture): adaptive partition
    COALESCING sizes post-shuffle partitions by MAP-OUTPUT bytes, but
    this self-join's OUTPUT is quadratic in bucket density — coalesced
    partitions concentrate multi-GB pair-aggregation maps on a handful
    of tasks and can OOM executors that plain fixed partitioning
    handles easily. On duplicate-heavy corpora run this stage with
    ``spark.sql.adaptive.coalescePartitions.enabled=false`` (or a
    small advisoryPartitionSizeInBytes) — the skew-OPPOSITE failure
    mode.
    """
    hot = (
        index.groupBy("sh").agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("sh")
    )
    rare = index.join(F.broadcast(hot), "sh", "left_anti")
    a, b = rare.alias("a"), rare.alias("b")
    pair_rare = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("n_rare"))
    )
    hot_idx = index.join(F.broadcast(hot), "sh", "left_semi")
    ha = hot_idx.select(F.col(id_col).alias("doc_a"), "sh")
    hb = hot_idx.select(F.col(id_col).alias("doc_b"), "sh")
    n_hot = (
        pair_rare.select("doc_a", "doc_b")
        .join(ha, "doc_a")
        .join(hb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_hot"))
    )
    return (
        pair_rare.join(n_hot, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a", "doc_b",
            (F.col("n_rare") + F.coalesce(F.col("n_hot"), F.lit(0)))
            .alias("n_common"),
        )
    )


def minhash_banded_pairs(docs: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 5,
                         num_perm: int = 32, band_rows: int = 2,
                         max_jaccard_dist: float = 0.6) -> DataFrame:
    """Hand-rolled banded MinHash near-dup pipeline (no MLlib):
    shingle sets → num_perm min-hash signature (xxhash64 with per-
    permutation salts, computed as num_perm codegen'd MIN aggregates)
    → (num_perm / band_rows) bands → band-bucket self-join for
    candidates → EXACT Jaccard verification on the candidates only.

    Returns (doc_a, doc_b, jaccard_dist) with exact distances ≤
    threshold — the candidates-then-verify shape production dedup
    uses: the sketch bounds the join, the exact check kills false
    positives. All JVM-side (no Python, no sparse vectors); at scale
    only 16-byte (band, hash) keys shuffle.

    With band_rows=2, num_perm=32 → 16 bands: P(candidate) =
    1−(1−s²)¹⁶ ≈ 0.94 at s=0.4 — recall comparable to MLlib's
    5-table OR while verification stays exact.
    """
    n_bands = num_perm // band_rows
    # materialize the shingle index ONCE: FOUR consumers read it (the
    # signature aggregation, doc sizes, and both verify-join sides) —
    # each would re-run tokenize+explode otherwise. Same tradeoff note
    # as q_llm_ngram_jaccard: at cluster scale persist to storage
    # instead (localCheckpoint pins executor storage). Lifetime: the
    # returned DataFrame's lineage references these blocks, so they
    # cannot be unpersisted here; ContextCleaner reclaims them when
    # the result (and this handle) go out of scope.
    sh = shingle_index(docs, text_col=text_col, id_col=id_col, k=k
                       ).localCheckpoint(eager=True)
    # SQL-string expressions: num_perm stacked-Column aggregates cost
    # ~4 py4j round-trips each at plan-build time; one parse call each
    # builds the identical plan ~4x faster (same fix as simhash)
    sig = sh.groupBy(id_col).agg(
        *[F.expr(f"min(xxhash64(concat('p{i}#', sh))) AS m{i}")
          for i in range(num_perm)]
    )
    band_structs = [
        F.expr("named_struct('band', {b}, 'bh', xxhash64({cols}))".format(
            b=b, cols=", ".join(f"m{b * band_rows + r}" for r in range(band_rows))))
        for b in range(n_bands)
    ]
    bands = sig.select(id_col, F.explode(F.array(*band_structs)).alias("bv")).select(
        id_col, "bv.band", "bv.bh"
    )
    a, b_ = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    # exact verification restricted to candidates
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sha"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("shb"))
    inter = (
        cands.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("sha") == F.col("shb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jd = 1 - F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(F.broadcast(na), "doc_a").join(F.broadcast(nb), "doc_b")
        .filter(jd <= max_jaccard_dist)
        .select("doc_a", "doc_b", F.round(jd, 4).alias("jaccard_dist"))
    )
