"""LLM-data-pipeline, wave 8 (round 6): deterministic sampling and
data-mixing operators — the selection side of corpus curation (what
to KEEP, after dedup/quality decided what to drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_K = 100  # per-source sample size
_BUDGET = 20000  # per-language token budget


@register(
    "q_llm_reservoir_sample",
    oracle=f"""
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    ) WHERE rk <= {_K}
    """,
)
def q_llm_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum uniform sample ("frozen reservoir"):
    the k docs per source with the smallest md5(doc_id) — a hash
    order is uniform over insertion order but REPRODUCIBLE across
    runs, engines and partitionings, which rand()-based sampling is
    not. md5 (not xxhash64) so the DuckDB oracle computes the
    identical ranking.

    Scale: bottom-k per group = one shuffle + per-group heap
    (TakeOrdered shape), no global sort. This is how a 100 TB corpus
    pins a stable eval slice: re-running the pipeline regenerates
    byte-identical samples."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= _K)
    )


@register(
    "q_llm_token_budget",
    oracle=f"""
    WITH scored AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
               OVER (PARTITION BY lang
                     ORDER BY n_chars DESC, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(MAX(cum_tokens) AS BIGINT) AS budget_used
    FROM scored WHERE cum_tokens <= {_BUDGET}
    GROUP BY lang
    """,
)
def q_llm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curriculum selection: per language, greedily keep
    the longest documents (n_chars desc, deterministic doc_id
    tiebreak) until a fixed token budget fills — the mixture-weights
    step of training-data assembly, where each domain/language gets a
    token quota rather than a document count.

    Scale: one window cumsum per language partition (parallel across
    languages), one filter, one aggregate. The anti-pattern is a
    driver loop admitting documents one at a time."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (Window.partitionBy("lang")
         .orderBy(F.col("n_chars").desc(), "doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    scored = d.select(
        "lang", "doc_id",
        n_tok.alias("n_tokens"),
        F.sum(n_tok).over(w).alias("cum_tokens"),
    )
    return (
        scored.filter(F.col("cum_tokens") <= _BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_kept"),
            F.max("cum_tokens").cast("long").alias("budget_used"),
        )
    )


@register(
    "q_llm_corpus_report",
    oracle="""
    WITH per AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, tokens,
           ROUND(tokens * 1.0 / SUM(tokens) OVER (PARTITION BY lang), 6)
             AS lang_share,
           CAST(SUM(tokens) OVER (PARTITION BY lang
                                  ORDER BY tokens DESC, source
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_tokens
    FROM per
    """,
)
def q_llm_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix report: per (language, source) document and token
    counts, each source's token share within its language, and the
    cumulative token coverage walking sources largest-first — the
    table a data-mixture decision reads (e.g. 'the top 2 sources are
    90% of German'; cf. domain-mix/resample operators which then ACT
    on these weights).

    Scale: the windows run over the (lang, source) aggregate —
    |langs|×|sources| rows — not the corpus; the only corpus-sized
    step is the first hash aggregation."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
    )
    w_share = Window.partitionBy("lang")
    w_cum = (Window.partitionBy("lang")
             .orderBy(F.col("tokens").desc(), "source")
             .rowsBetween(Window.unboundedPreceding, 0))
    return per.select(
        "lang", "source", "n_docs", "tokens",
        F.round(F.col("tokens") / F.sum("tokens").over(w_share), 6)
         .alias("lang_share"),
        F.sum("tokens").over(w_cum).cast("long").alias("cum_tokens"),
    )
