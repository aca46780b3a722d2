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


@register(
    "q_llm_kn_bigram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, u.w, u.i
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
           LATERAL (SELECT UNNEST(ws) AS w,
                           generate_subscripts(ws, 1) AS i) u
    ),
    bi AS (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.i = a.i + 1
      GROUP BY 1, 2
    ),
    uni AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n_follow
            FROM bi GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_prec FROM bi GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM bi)
    SELECT w1, w2, c12,
           ROUND( (GREATEST(c12 - 0.75, 0) / c1)
                 + (0.75 / c1) * n_follow * (n_prec * 1.0 / n_bi), 6)
             AS p_kn
    FROM bi JOIN uni USING (w1) JOIN cont USING (w2) CROSS JOIN tot
    ORDER BY c12 DESC, w1, w2 LIMIT 50
    """,
)
def q_llm_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM (absolute discount d=0.75):
    P(w2|w1) = max(c12−d,0)/c1 + (d/c1)·N_follow(w1)·P_cont(w2),
    with the continuation probability N_prec(w2)/|bigrams| — the
    smoothing that makes n-gram quality scores robust to unseen
    continuations (upgrade over the add-k bigram LM,
    q_llm_bigram_lm). Every term is an exact integer count, so the
    single float formula is bit-identical cross-engine and the top-50
    report is exactly oracled.

    Scale: three count aggregations (bigram, left-marginal,
    right-continuation) + one broadcast scalar; no windows over the
    corpus. The bigram self-join in the ORACLE is the validation-only
    form — the Spark side derives bigrams positionally per document
    with zip-shifted arrays, one pass."""
    d = load_table(spark, sf_dir, "documents")
    ws = d.select(F.split("text", " ").alias("ws"))
    bi = (
        ws.select(
            F.explode(
                F.zip_with(
                    F.slice("ws", 1, F.size("ws") - 1),
                    F.slice("ws", 2, F.size("ws") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c12"))
    )
    uni = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_follow")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("n_prec"))
    tot = bi.agg(F.count("*").alias("n_bi"))
    p_kn = (
        F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
        + (0.75 / F.col("c1")) * F.col("n_follow")
        * (F.col("n_prec") * 1.0 / F.col("n_bi"))
    )
    return (
        bi.join(uni, "w1").join(cont, "w2").crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", F.round(p_kn, 6).alias("p_kn"))
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(50)
    )


@register("q_llm_mmr")  # rows-only: greedy float fixpoint — numpy-oracled in pytest
def q_llm_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (λ=0.7): each vector's top-20 cosine
    candidates greedily re-ranked to 5 results balancing relevance vs
    redundancy — the diversity step between ANN retrieval and
    training-pair selection. Greedy runs per query inside
    applyInPandas (bounded candidate sets); numpy parity in
    tests/test_ml.py."""
    from ..operators.similarity import mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    return mmr_rerank(e, k=5, fetch=20)
