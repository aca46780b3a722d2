"""LLM-data-pipeline operators (SURVEY.md §2B north-star extensions):
deduplication, similarity search, text analysis, multimodal join.

Not in the reference — these are what a 100 TB training-data pipeline
needs on top of it. Scale notes per operator; the brute-force cosine
top-k exists as the correctness baseline for the LSH variants
(q_llm_minhash_dedup / q_llm_ann_lsh in ml_lsh.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import shingles, tokens
from ..functions.vector import dot
from ..registry import register


@register(
    "q_llm_exact_dedup",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, sha256(lower(trim(text))) AS text_sha
      FROM documents
    )
    SELECT MIN(doc_id) AS doc_id, text_sha,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM hashed GROUP BY text_sha
    """,
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: sha2-256 -> keep min doc_id per
    hash. One shuffle on the 32-byte digest (never on the text itself
    — at 100 TB you shuffle hashes, not documents). Spark sha2 and
    DuckDB sha256 both emit lowercase hex."""
    from ..operators.dedup import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "q_llm_ngram_shingle",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS shingle
    FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
    WHERE len(toks) >= 5
    """,
)
def q_llm_ngram_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-token shingles per document (the MinHash input). Pure
    higher-order functions: sequence -> slice -> array_join -> explode;
    no Python, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 5)
        .select("doc_id", F.explode(shingles(F.col("toks"), k=5)).alias("shingle"))
    )


@register(
    "q_llm_cosine_topk",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
    FROM (SELECT qid, nid, sim,
                 row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def q_llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 cosine neighbors per vector (unit-norm ->
    cosine ≡ dot). Broadcast NL join + JVM-side zip_with/aggregate dot
    + per-qid top-k window.

    Scale path: this O(N²) baseline is for ≤~10⁴ vectors (ground truth
    for recall tests); beyond that use q_llm_ann_lsh — same output
    schema, LSH-bucketed candidates. Similarity is rounded BEFORE
    ranking (with nid tiebreak) so ranking is deterministic across
    engines at float boundaries."""
    from ..operators.similarity import cosine_topk

    return cosine_topk(load_table(spark, sf_dir, "embeddings"), k=5)


@register(
    "q_llm_cosine_topk_sharded",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
    FROM (SELECT qid, nid, sim,
                 row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def q_llm_cosine_topk_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The >10⁶-vector mode of q_llm_cosine_topk: exact brute-force
    top-5 with NO driver collect and NO full-table broadcast —
    candidates hash-sharded, queries routed shard-by-shard through a
    cogrouped Arrow join, per-shard top-k, global window merge. Same
    oracle as the broadcast path (bit-identical output)."""
    from ..operators.similarity import cosine_topk_sharded

    return cosine_topk_sharded(load_table(spark, sf_dir, "embeddings"), k=5)


@register(
    "q_llm_text_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    )
    SELECT doc_id,
           ANY_VALUE(lang)                                   AS lang,
           CAST(COUNT(*) AS BIGINT)                          AS n_tokens,
           CAST(COUNT(DISTINCT term) AS BIGINT)              AS n_types,
           ROUND(AVG(CAST(len(term) AS DOUBLE)), 6)          AS avg_token_len,
           ROUND(CAST(COUNT(DISTINCT term) AS DOUBLE) / COUNT(*), 6) AS ttr
    FROM toks GROUP BY doc_id
    """,
)
def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: count, type count, mean token
    length, type-token ratio. Explode -> single hash aggregate keyed
    by doc_id (high cardinality — parallelizes perfectly)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.explode(tokens("text")).alias("term"))
    return t.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_types"),
        F.round(F.avg(F.length("term").cast("double")), 6).alias("avg_token_len"),
        F.round(F.countDistinct("term").cast("double") / F.count("*"), 6).alias("ttr"),
    )


@register(
    "q_llm_doc_quality",
    oracle="""
    WITH stats AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' '))                          AS n_tok,
             len(list_distinct(string_split(text, ' ')))           AS n_typ
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           CAST(n_tok AS BIGINT) AS n_tokens,
           ROUND(CAST(n_typ AS DOUBLE) / n_tok, 6) AS uniq_ratio
    FROM stats
    WHERE n_chars BETWEEN 100 AND 500
      AND n_tok >= 20
      AND CAST(n_typ AS DOUBLE) / n_tok >= 0.4
    """,
)
def q_llm_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality filter (char-length bounds, min token count,
    min unique-token ratio) — the fast first pass of a data-curation
    funnel. Array-function only; zero shuffles, full pushdown of the
    n_chars bound to the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    stats = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_typ"),
    )
    uniq = F.col("n_typ").cast("double") / F.col("n_tok")
    return (
        stats.filter(
            F.col("n_chars").between(100, 500) & (F.col("n_tok") >= 20) & (uniq >= 0.4)
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.col("n_tok").cast("long").alias("n_tokens"),
            F.round(uniq, 6).alias("uniq_ratio"),
        )
    )


@register(
    "q_llm_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
           ROUND(list_sum(list_transform(list_zip(e.embedding, e.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS emb_norm_sq
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.lang IN ('en', 'de') AND e.label < 5
    """,
)
def q_llm_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: text metadata ⋈ vector (doc_id=vec_id)
    with per-modality filters. The embedding stays columnar end-to-end;
    at 100 TB both sides would be bucketed on the id to avoid the
    shuffle entirely."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de"))
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("label") < 5)
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "label",
        F.round(dot("embedding", "embedding"), 6).alias("emb_norm_sq"),
    )
