"""LLM-pipeline wave 3: retrieval scoring (BM25), dataset splitting,
stratified sampling, vocabulary heavy hitters — the curation /
retrieval side of a training-data pipeline.

All four are exactly oracled (pure relational algebra + md5, which
both engines implement bit-identically). Determinism rules follow the
house style: scores rounded to 6dp BEFORE ranking, id/term tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ..registry import register

#: Fixed retrieval query for q_llm_bm25_topk (a real system would take
#: these per request; a benchmark needs them pinned).
BM25_QUERY_TERMS = ("join", "filter", "stream")
BM25_K1, BM25_B = 1.2, 0.75


@register(
    "q_llm_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
      WHERE term IN {BM25_QUERY_TERMS} GROUP BY 1, 2
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks
      WHERE term IN {BM25_QUERY_TERMS} GROUP BY 1
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                 * tf.tf * ({BM25_K1} + 1)
                 / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
             ) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
      GROUP BY 1
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
)
def q_llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-20 documents for a fixed query term set
    (Okapi BM25, k1=1.2 b=0.75) — the standard lexical ranking a
    training-data pipeline uses for quality-targeted retrieval and
    decontamination lookups.

    Scale: tf is filtered to the query terms BEFORE the aggregate, so
    the scored set is |docs containing ≥1 query term|, never the full
    corpus×vocab; df/avgdl/N are tiny aggregates (df is
    query-term-sized and broadcast). Final top-20 is a rounded-score
    window — at a real query volume this becomes per-query
    TakeOrdered. Scores rounded to 6dp before ranking, doc_id
    tiebreak (cross-engine deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    srow = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = srow["n_docs"], srow["avgdl"]
    qt = list(BM25_QUERY_TERMS)
    tf = (
        toks.filter(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_ = (
        toks.filter(F.col("term").isin(qt))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("double").alias("df"))
    )
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / denom).alias("score"))
    )
    w = Window.orderBy(F.round("score", 6).desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


@register(
    "q_ml_train_test_split",
    oracle="""
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                THEN 'train' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY 1, 2
    """,
)
def q_ml_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~75/25 train/test split by content-free hash of
    the id (md5 hex, first nibble < 'c' → train, 12/16 of hash space)
    — the sklearn train_test_split counterpart that stays stable
    across engines, reruns, and repartitions (NO rand(): a seeded
    rand() is plan-dependent, a hash split never is). Output: per
    (split, lang) counts + id range, the shape a dataset card needs.

    Scale: one narrow projection + one aggregation; the split column
    is a pure row-local expression, so it composes with any
    downstream query and partition-prunes if written out partitioned
    by split."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "c", "train"
    ).otherwise("test")
    return (
        d.select(split.alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@register(
    "q_llm_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          < CASE WHEN lang = 'en' THEN '4' ELSE '8' END
    """,
)
def q_llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language rates (en 25%,
    others 50% of hash space) to rebalance an en-heavy corpus — the
    language-rebalancing pass of training-data curation. Hash-gated
    (md5 nibble vs per-stratum threshold), so the sample is exactly
    reproducible on any engine/partitioning, unlike df.sampleBy
    (seeded Bernoulli — plan-dependent row order sensitivity).

    Scale: row-local predicate, no shuffle, prunes columns at the
    scan; rates are a broadcast-sized CASE (per-stratum map)."""
    d = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", "4").otherwise("8")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < threshold
    ).select("doc_id", "lang", "source")


@register(
    "q_llm_heavy_hitters",
    oracle="""
    WITH tf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY 1
    )
    SELECT term, n
    FROM (SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rn FROM tf)
    WHERE rn <= 10
    """,
)
def q_llm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vocabulary heavy hitters: top-10 most frequent tokens —
    the stopword/boilerplate discovery pass that feeds the df caps
    used by the dedup family (see operators.dedup
    DEFAULT_MAX_SHINGLE_DF).

    Scale: explode → partial+final hash aggregate (map-side combine
    collapses each partition to its local vocab), then a
    TakeOrderedAndProject top-10 (orderBy+limit — a bounded heap per
    partition + driver merge of 10-row heaps, NOT a global sort or a
    single-partition window)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    return tf.orderBy(F.col("n").desc(), "term").limit(10)


@register(
    "q_llm_inverted_index",
    oracle="""
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
    GROUP BY term
    """,
)
def q_llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term → document frequency + sorted
    posting list — the retrieval-side artifact BM25 and the
    shingle-candidate dedup both conceptually read from; here
    materialized as a first-class output (postings serialized as a
    comma string so the oracle hash is representation-stable across
    engines).

    Scale: explode + distinct + one aggregation keyed by term;
    collect_list is bounded per key by document frequency — for
    stopword-grade terms pair this with the heavy-hitters df cap
    (see q_llm_heavy_hitters / DEFAULT_MAX_SHINGLE_DF) or store
    postings bucketed (term, bucket) at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    terms = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .distinct()
    )
    return terms.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings"),
    )


@register(
    "q_llm_embed_normalize",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT e.vec_id,
           ROUND(n.nrm, 6) AS l2_norm,
           ROUND(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE) / (n.nrm * n.nrm))),
                 6) AS unit_check
    FROM embeddings e JOIN n USING (vec_id)
    """,
)
def q_llm_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization audit of the embedding column: per-vector norm
    plus the re-normalized self-dot (≡ 1 up to rounding) — the
    preprocessing invariant every cosine operator in this engine
    assumes (unit vectors ⇒ dot = cosine).

    Scale: pure higher-order array functions (aggregate/transform),
    row-local, zero shuffles, codegen'd — the normalize itself is the
    same expression minus the audit columns."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda a, v: a + v,
    )
    nrm = F.sqrt(sq)
    return e.select(
        "vec_id",
        F.round(nrm, 6).alias("l2_norm"),
        F.round(sq / (nrm * nrm), 6).alias("unit_check"),
    )
