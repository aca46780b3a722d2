"""Round-8 wave 133: DSIR — Data Selection via Importance Resampling
(Xie et al. 2023, arXiv:2302.03169), the standard recipe for picking
pretraining documents that "look like" a high-quality target corpus:
hashed n-gram features, a bucket-grain importance weight
log p_target(b) − log p_raw(b), per-document weight sums, and
top-quantile selection. All three queries are exactly DuckDB-oracled
via the repo's micro-quantization contract (per-bucket log-ratios
quantized to BIGINT ×1e6 BEFORE the per-doc sum, so aggregation order
can never shift a hash).

Feature space: whitespace bigrams hashed through the portable
md5-prefix hash (first 4 hex nibbles -> int, mod ``B``) used by the
sampling waves — deterministic and identical in Spark and DuckDB.
Target distribution = English documents; raw = whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import shingles, tokens
from ..registry import register

#: hashed-feature bucket count — small enough that the weight table
#: broadcasts (B rows), large enough that collisions don't flatten
#: the target/raw contrast at fixture vocabulary sizes.
B = 256

#: micro-quantization scale for per-bucket log-ratios.
SCALE = 1_000_000

# Shared DuckDB CTE chain: doc-grain bigram buckets -> target/raw
# bucket counts -> add-1-smoothed quantized log-ratio weights ->
# per-doc integer weight sums. Interpolated into all three oracles.
_DSIR_DOC_SQL = f"""
    t AS (
        SELECT doc_id, lang, source, string_split(text, ' ') AS toks
        FROM documents),
    bg AS (
        SELECT doc_id, lang, source, len(toks) AS n_toks,
               CAST(concat('0x', substr(md5(
                   concat(toks[CAST(i AS INT)], ' ',
                          toks[CAST(i AS INT) + 1])), 1, 4))
                    AS BIGINT) % {B} AS b
        FROM t, unnest(range(1, len(toks))) u(i)
        WHERE len(toks) >= 2),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg
            WHERE lang = 'en' GROUP BY b),
    rawc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
    tot AS (SELECT
                (SELECT COUNT(*) FROM bg WHERE lang = 'en') AS tn,
                (SELECT COUNT(*) FROM bg) AS rn),
    w AS (
        SELECT r.b,
               CAST(ROUND(LN(((COALESCE(t.c, 0) + 1.0) / (tot.tn + {B}.0))
                             / ((r.c + 1.0) / (tot.rn + {B}.0)))
                          * {SCALE}) AS BIGINT) AS w
        FROM rawc r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot),
    doc AS (
        SELECT bg.doc_id,
               ANY_VALUE(bg.lang) AS lang,
               ANY_VALUE(bg.source) AS source,
               ANY_VALUE(bg.n_toks) AS n_toks,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(w.w) AS BIGINT) AS sumw
        FROM bg JOIN w ON w.b = bg.b
        GROUP BY bg.doc_id)
"""


def _bucket(col) -> F.Column:
    """Portable md5-prefix hash of a bigram string -> bucket id."""
    return (F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")
            % F.lit(B))


def _doc_bigram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain bigram-bucket stream: one row per bigram occurrence
    with its hashed bucket — the shared feature space of all three
    DSIR queries (the Spark twin of ``_DSIR_DOC_SQL``'s ``bg`` CTE)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "source", tokens("text").alias("toks")
    ).where(F.size("toks") >= 2)
    return t.select(
        "doc_id", "lang", "source",
        F.size("toks").cast("long").alias("n_toks"),
        F.explode(shingles(F.col("toks"), k=2)).alias("bigram"),
    ).withColumn("b", _bucket(F.col("bigram"))).drop("bigram")


def _bucket_counts(bg: DataFrame, cnt: str | None = None):
    """(tgt, raw, tot) bucket-grain counts over a bigram-bucket
    stream — the distributions behind both the per-doc weights and
    the KL diagnostic (one definition, so the feature space cannot
    drift between them).

    r11: ONE conditional-count aggregate pass instead of three
    independent passes over the corpus-grain bigram stream (target
    filter + raw count + totals each re-ran the tokenize/explode/hash
    pipeline); tgt/raw/tot all derive from the persisted ≤B-row merged
    counts, so the corpus is scanned once here (guide §1.2: remove
    whole passes first).

    r12: ``cnt`` names an occurrence-count column when ``bg`` is
    already (doc, bucket)-grain (lang is a doc attribute, constant per
    group, so the weighted sums equal the per-occurrence counts)."""
    occ = F.col(cnt) if cnt else F.lit(1)
    counts = bg.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", occ).otherwise(0)).alias("tc"),
        F.sum(occ).alias("rc"),
    ).persist()
    # identical row set to the filtered groupBy: buckets with ≥1
    # English bigram
    tgt = counts.where(F.col("tc") > 0).select("b", "tc")
    raw = counts.select("b", "rc")
    tot = counts.agg(F.sum("tc").alias("tn"), F.sum("rc").alias("rn"))
    return tgt, raw, tot


def _dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain DSIR weights: (doc_id, lang, source, n_toks,
    n_bigrams, sumw) with sumw the micro-quantized integer log
    importance weight — the Spark twin of ``_DSIR_DOC_SQL``.

    Scale: the corpus shuffles once to bucket grain for the two count
    aggregates; the weight table is B rows and broadcast back onto the
    doc-bigram stream, so the per-doc sum is one map-side-combinable
    aggregation. Nothing materializes above doc grain.
    """
    # r12: pre-aggregate the bigram stream to (doc, bucket) grain ONCE
    # and derive BOTH the bucket counts and the per-doc weight sum from
    # it — the tokenize+shingle+md5 pipeline previously ran twice (once
    # under the bucket aggregate, once under the weight join; no
    # exchange boundary is shared, so AQE stage reuse cannot fold
    # them). Exact: lang/source/n_toks are doc attributes (constant per
    # group) and Σ_occurrences w = Σ_(doc,b) c·w.
    bg = _doc_bigram_buckets(spark, sf_dir)
    # lang/source/n_toks are doc attributes (functionally dependent on
    # doc_id) so they ride as GROUP KEYS, not any_value() aggregates:
    # a string-valued aggregate buffer forces SortAggregate (UnsafeRow
    # hash-agg buffers must be fixed-size), while string GROUP keys
    # hash fine — the stream-sized materialization stays HashAggregate.
    db = (
        bg.groupBy("doc_id", "lang", "source", "n_toks", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    tgt, raw, tot = _bucket_counts(db, cnt="c")
    w = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                     / (F.col("tn") + float(B)))
                    / ((F.col("rc") + 1.0) / (F.col("rn") + float(B)))
                )
                * SCALE
            ).cast("long").alias("w"),
        )
    )
    return (
        db.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.any_value(F.col("source")).alias("source"),
            F.any_value(F.col("n_toks")).alias("n_toks"),
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("w") * F.col("c")).alias("sumw"),
        )
    )


@register(
    "q_llm_dsir_weights",
    oracle=f"""
    WITH {_DSIR_DOC_SQL}
    SELECT doc_id, lang, n_bigrams,
           ROUND(CAST(sumw AS DOUBLE) / {SCALE}, 6) AS logw
    FROM doc ORDER BY sumw DESC, doc_id LIMIT 15
    """,
)
def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): per-document
    log p_target/p_raw under add-1-smoothed hashed-bigram multinomials
    (target = English subcorpus, raw = whole corpus); the 15 documents
    the resampler would favor most. English docs must surface — the
    weight is exactly the evidence the doc's bigrams give for the
    target domain.

    Scale: two bucket-grain counts + a broadcast of the B-row weight
    table + one doc-grain sum — the corpus is read once and shuffled
    once; the top-15 compiles to TakeOrderedAndProject."""
    doc = _dsir_doc_weights(spark, sf_dir)
    return (
        doc.select(
            "doc_id", "lang", "n_bigrams",
            F.round(F.col("sumw").cast("double") / SCALE, 6).alias("logw"),
        )
        .orderBy(F.col("logw").desc(), "doc_id")
        .limit(15)
    )


@register(
    "q_llm_dsir_select",
    oracle=f"""
    WITH {_DSIR_DOC_SQL},
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM doc),
    r AS (SELECT doc.*, ROW_NUMBER() OVER (ORDER BY sumw DESC, doc_id)
                 AS rk FROM doc),
    sel AS (
        SELECT r.*, CASE WHEN rk <= CAST(CEIL(n.n / 4.0) AS BIGINT)
                         THEN 1 ELSE 0 END AS keep
        FROM r CROSS JOIN n)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_selected,
           ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS sel_rate,
           ROUND(CAST(SUM(keep * n_toks) AS DOUBLE) / SUM(n_toks), 6)
               AS tok_share
    FROM sel GROUP BY source ORDER BY source
    """,
)
def q_llm_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR top-quantile selection audit: keep the top 25% of
    documents by importance weight (deterministic doc_id tiebreak) and
    report, per source, how many documents and what token share
    survive — the mixture-shift table you read before committing a
    resampled pretraining corpus.

    Scale: the global rank here is the sf-fixture stand-in for the
    production form (select by a weight threshold computed from an
    approx quantile — one scalar — instead of a total order); doc
    grain never exceeds one row per document and the per-source
    report is a 20-row aggregate."""
    from ..operators.ranking import global_row_number

    # pinned: both the scalar count and the ranking pass sit on the
    # full weight pipeline — without the checkpoint the corpus-scale
    # lineage executes twice (the wave-140 funnel lesson)
    doc = _dsir_doc_weights(spark, sf_dir).localCheckpoint(eager=True)
    n = doc.agg(F.count(F.lit(1)).alias("n"))
    # distributed two-pass rank — a bare Window.orderBy would plan a
    # SinglePartition stage over the whole doc table
    r = global_row_number(
        doc, [F.col("sumw").desc(), F.col("doc_id")], name="rk"
    )
    sel = r.crossJoin(F.broadcast(n)).withColumn(
        "keep",
        F.when(F.col("rk") <= F.ceil(F.col("n") / 4.0).cast("long"), 1)
        .otherwise(0),
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_selected"),
            F.round(
                F.sum("keep").cast("double") / F.count(F.lit(1)), 6
            ).alias("sel_rate"),
            F.round(
                F.sum(F.col("keep") * F.col("n_toks")).cast("double")
                / F.sum("n_toks"),
                6,
            ).alias("tok_share"),
        )
        .orderBy("source")
    )


@register(
    "q_llm_dsir_kl",
    oracle=f"""
    WITH {_DSIR_DOC_SQL},
    pq AS (
        SELECT r.b,
               (COALESCE(t.c, 0) + 1.0) / (tot.tn + {B}.0) AS p,
               (r.c + 1.0) / (tot.rn + {B}.0) AS q
        FROM rawc r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot),
    terms AS (
        SELECT
            CAST(ROUND(p * LN(p / q) * 1000000000) AS BIGINT) AS klt,
            CAST(ROUND(q * LN(q / p) * 1000000000) AS BIGINT) AS rklt,
            CAST(ROUND(ABS(p - q) * 1000000000) AS BIGINT) AS tvt,
            CAST(ROUND((p - q) * (p - q) / q * 1000000000) AS BIGINT)
                AS chit
        FROM pq)
    SELECT
        ROUND(CAST(SUM(klt) AS DOUBLE) / 1000000000, 6) AS kl_target_raw,
        ROUND(CAST(SUM(rklt) AS DOUBLE) / 1000000000, 6) AS kl_raw_target,
        ROUND(CAST(SUM(tvt) AS DOUBLE) / 2000000000, 6) AS tv_distance,
        ROUND(CAST(SUM(chit) AS DOUBLE) / 1000000000, 6) AS chi2_distance
    FROM terms
    """,
)
def q_llm_dsir_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-space divergence diagnostics for the DSIR pair: KL in
    both directions, total-variation and chi-square distance between
    the target and raw hashed-bigram bucket distributions — the 'is
    there anything to select FOR?' check (all ≈0 means importance
    weights are noise and resampling is pointless). Per-bucket terms
    are quantized to BIGINT ×1e9 before the 256-term sum, so the
    result is aggregation-order-proof.

    Scale: everything after the two bucket-grain counts is B rows."""
    bg = _doc_bigram_buckets(spark, sf_dir)
    tgt, raw, tot = _bucket_counts(bg)
    pq = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
             / (F.col("tn") + float(B))).alias("p"),
            ((F.col("rc") + 1.0) / (F.col("rn") + float(B))).alias("q"),
        )
    )
    giga = 1_000_000_000
    terms = pq.select(
        F.round(F.col("p") * F.log(F.col("p") / F.col("q")) * giga)
        .cast("long").alias("klt"),
        F.round(F.col("q") * F.log(F.col("q") / F.col("p")) * giga)
        .cast("long").alias("rklt"),
        F.round(F.abs(F.col("p") - F.col("q")) * giga)
        .cast("long").alias("tvt"),
        F.round((F.col("p") - F.col("q")) * (F.col("p") - F.col("q"))
                / F.col("q") * giga).cast("long").alias("chit"),
    )
    return terms.agg(
        F.round(F.sum("klt").cast("double") / giga, 6).alias("kl_target_raw"),
        F.round(F.sum("rklt").cast("double") / giga, 6).alias("kl_raw_target"),
        F.round(F.sum("tvt").cast("double") / (2 * giga), 6).alias("tv_distance"),
        F.round(F.sum("chit").cast("double") / giga, 6).alias("chi2_distance"),
    )
