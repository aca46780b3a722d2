"""Round-6 wave 100: generation-diversity distinct-n metric,
quality-signal correlation matrix (signal redundancy audit), and
boilerplate tail detection (shared document endings). All exactly
DuckDB-oracled with integer-exact signals and counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_distinct_n",
    oracle="""
    WITH t AS (
        SELECT source, doc_id,
               REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
        FROM documents),
    u AS (
        SELECT source, toks[CAST(i AS INT)] AS g, 1 AS n
        FROM t, UNNEST(RANGE(1, LEN(toks) + 1)) x(i)
        UNION ALL
        SELECT source,
               toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)], 2
        FROM t, UNNEST(RANGE(1, LEN(toks))) x(i)
        UNION ALL
        SELECT source,
               toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
                   || ' ' || toks[CAST(i + 2 AS INT)], 3
        FROM t, UNNEST(RANGE(1, LEN(toks) - 1)) x(i)),
    g AS (
        SELECT source, n,
               CAST(COUNT(*) AS BIGINT) AS total,
               CAST(COUNT(DISTINCT g) AS BIGINT) AS uniq
        FROM u GROUP BY source, n)
    SELECT source, CAST(n AS BIGINT) AS ngram_order, total, uniq,
           ROUND(CAST(uniq AS DOUBLE) / CAST(total AS DOUBLE), 6)
               AS distinct_n
    FROM g
    WHERE source IN ('src0', 'src1', 'src2', 'src3')
    ORDER BY source, ngram_order
    """,
)
def q_llm_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (distinct-1/2/3: unique n-grams over
    total n-grams) per source — the standard text-diversity metric
    (Li et al.) that exposes repetitive/templated corpora a length
    histogram can't: low distinct-2 with normal distinct-1 means the
    same phrases loop. Exact integer counts, sources limited to a
    fixed panel for a bounded result.

    Scale: one tokenize pass feeding three map-side n-gram streams;
    both counts are (source × n)-grain aggregates — distinct-counting
    n-grams is the only shuffle, and it's the wordcount shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2", "src3")
    )
    t = docs.select(
        "source", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks")
    )
    grams = []
    for n, expr in (
        (1, "toks"),
        (2, "transform(sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i]))"),
        (3, "transform(sequence(1, size(toks) - 2), i -> concat(toks[i - 1], ' ', toks[i], ' ', toks[i + 1]))"),
    ):
        grams.append(
            t.select(
                "source",
                F.explode(F.expr(expr)).alias("g"),
                F.lit(n).alias("n"),
            )
        )
    u = grams[0].unionAll(grams[1]).unionAll(grams[2])
    g = u.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("g").alias("uniq")
    )
    return g.select(
        "source",
        F.col("n").cast("long").alias("ngram_order"),
        "total",
        "uniq",
        F.round(F.col("uniq").cast("double") / F.col("total").cast("double"), 6).alias(
            "distinct_n"
        ),
    ).orderBy("source", "ngram_order")


_SIGS = ["len_chars", "n_words", "n_distinct_chars", "max_word_len"]

_SIG_SQL = """
        SELECT CAST(n_chars AS BIGINT) AS len_chars,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^ ]+')) AS BIGINT)
                   AS n_words,
               CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ''))) AS BIGINT)
                   AS n_distinct_chars,
               CAST((SELECT MAX(LEN(w))
                     FROM UNNEST(REGEXP_EXTRACT_ALL(text, '[^ ]+')) u(w))
                   AS BIGINT) AS max_word_len
        FROM documents
"""


def _corr_sql() -> str:
    pairs = [(a, b) for i, a in enumerate(_SIGS) for b in _SIGS[i + 1:]]
    cols = ", ".join(
        f"""ROUND((nd * s_{a}_{b} - s_{a} * s_{b})
             / (SQRT(nd * s_{a}_{a} - s_{a} * s_{a})
                * SQRT(nd * s_{b}_{b} - s_{b} * s_{b})), 6)
             AS corr_{a}__{b}"""
        for a, b in pairs
    )
    moments = ", ".join(
        [f"CAST(SUM(CAST({s} AS DECIMAL(38,0))) AS DOUBLE) AS s_{s}" for s in _SIGS]
        + [
            f"CAST(SUM(CAST({a} * {b} AS DECIMAL(38,0))) AS DOUBLE) AS s_{a}_{b}"
            for i, a in enumerate(_SIGS)
            for b in _SIGS[i:]
        ]
    )
    return f"""
    WITH x AS ({_SIG_SQL}),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, {moments} FROM x)
    SELECT CAST(nd AS BIGINT) AS n_docs, {cols} FROM m
    """


@register("q_llm_signal_correlation", oracle=_corr_sql())
def q_llm_signal_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal redundancy audit: the Pearson correlation
    matrix between four cheap document-quality signals (length, word
    count, distinct characters, longest word) — signals correlated
    ≥0.95 are redundant and one should be dropped from the filter
    ensemble; signals near 0 carry independent evidence. Every signal
    is an exact integer per document and every moment an exact
    decimal sum, so all six correlations are bit-identical doubles.

    Scale: ONE pass computes all 14 moments map-side (the classic
    all-pairs-correlation-from-sufficient-statistics trick — p²
    moments, not p² passes); output is a single row."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        F.col("n_chars").cast("long").alias("len_chars"),
        F.size(F.expr("regexp_extract_all(text, '[^ ]+', 0)")).cast("long").alias("n_words"),
        F.size(F.array_distinct(F.split("text", ""))).cast("long").alias("n_distinct_chars"),
        F.array_max(
            F.transform(F.expr("regexp_extract_all(text, '[^ ]+', 0)"), lambda w: F.length(w))
        ).cast("long").alias("max_word_len"),
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast("double").alias("nd")]
    aggs += [F.sum(F.col(s).cast(dec)).cast("double").alias(f"s_{s}") for s in _SIGS]
    aggs += [
        F.sum((F.col(a) * F.col(b)).cast(dec)).cast("double").alias(f"s_{a}_{b}")
        for i, a in enumerate(_SIGS)
        for b in _SIGS[i:]
    ]
    m = x.agg(*aggs)
    nd = F.col("nd")
    out = [nd.cast("long").alias("n_docs")]
    for i, a in enumerate(_SIGS):
        for b in _SIGS[i + 1:]:
            num = nd * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            da = F.sqrt(nd * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            db = F.sqrt(nd * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            out.append(F.round(num / (da * db), 6).alias(f"corr_{a}__{b}"))
    return m.select(*out)


@register(
    "q_llm_boilerplate_tails",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
        FROM documents),
    tails AS (
        SELECT doc_id,
               ARRAY_TO_STRING(toks[LEN(toks) - 1 : LEN(toks)], ' ') AS tail
        FROM t WHERE LEN(toks) >= 2),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM tails),
    g AS (
        SELECT tail, CAST(COUNT(*) AS BIGINT) AS df
        FROM tails GROUP BY tail HAVING COUNT(*) >= 2)
    SELECT g.tail, g.df,
           ROUND(CAST(g.df AS DOUBLE) / CAST(n.n_docs AS DOUBLE), 6)
               AS doc_share
    FROM g CROSS JOIN n
    ORDER BY g.df DESC, g.tail LIMIT 15
    """,
)
def q_llm_boilerplate_tails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate tail detection: the 15 most common 2-token document
    ENDINGS (df ≥ 2) with their corpus share (r7: window shrunk from
    4 tokens / df≥3, which matched nothing below sf0.1 — fixture docs
    are short and their 4-token tails unique — leaving the driver's
    sf0.01 oracle check trivially green) — signatures, footers,
    and template closers cluster at document tails, and tail-keyed
    detection finds them in one pass where positional shingle mining
    (q_llm_dup_passages) pays for every offset. The complement every
    cleaning pipeline wants next to head-anchored dedup keys
    (q_llm_fingerprint_key).

    Scale: one projection to a per-doc tail string (no explode —
    slice the LAST window only), then a wordcount-shaped fold and
    TakeOrdered(15)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks")
    ).filter(F.size("toks") >= 2)
    tails = t.select(
        F.array_join(F.expr("slice(toks, -2, 2)"), " ").alias("tail")
    )
    n = tails.agg(F.count(F.lit(1)).alias("n_docs"))
    g = tails.groupBy("tail").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") >= 2)
    return (
        g.crossJoin(F.broadcast(n))
        .select(
            "tail",
            "df",
            F.round(F.col("df").cast("double") / F.col("n_docs").cast("double"), 6).alias(
                "doc_share"
            ),
        )
        .orderBy(F.desc("df"), "tail")
        .limit(15)
    )
