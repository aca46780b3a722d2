"""Round-6 wave 126: Anderson-Darling two-sample test (tail-weighted
EDF distance, completing the KS / CvM family) and content-defined
chunking (Rabin-style boundaries + cross-document chunk dedup — the
storage-dedup classic applied to text). Exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_anderson_darling_2s",
    oracle="""
    WITH x AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v,
               CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS grp
        FROM orders WHERE o_orderstatus IN ('F', 'O')),
    h AS (
        SELECT v,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1
        FROM x GROUP BY v),
    t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n,
                 CAST(SUM(c1) AS BIGINT) AS m FROM h),
    cum AS (
        SELECT c0, c1,
               SUM(c0) OVER (ORDER BY v) AS f0,
               SUM(c0 + c1) OVER (ORDER BY v) AS fp
        FROM h),
    w AS (
        SELECT SUM(CASE WHEN fp < t.n + t.m THEN
                   (c0 + c1)
                   * POW(CAST((t.n + t.m) * f0 - t.n * fp AS DOUBLE), 2)
                   / (CAST(fp AS DOUBLE)
                      * CAST(t.n + t.m - fp AS DOUBLE))
                   ELSE 0 END) AS s,
               MAX(t.n) AS n, MAX(t.m) AS m
        FROM cum CROSS JOIN t)
    SELECT CAST(n AS BIGINT) AS n_f, CAST(m AS BIGINT) AS n_o,
           ROUND(s / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
                 / CAST(n + m AS DOUBLE), 6) AS ad_a2
    FROM w
    """,
)
def q_stat_anderson_darling_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling two-sample statistic between finished and
    open order values: A² = 1/(nm(N)) · Σ (N·F₀ − n·H)² / (H(N−H))
    over pooled points (Pettitt's form) — the EDF distance that
    up-weights the TAILS, where KS is weakest and where money
    distributions actually differ; with KS (sup) and CvM (integrated)
    this completes the classical EDF-test trio on the same exact
    histogram machinery. The numerator (N·F₀ − n·H)² is an exact
    integer per pooled point.

    Scale: one value-domain histogram + one cumulative window + a
    fold — identical cost to KS."""
    o = load_table(spark, sf_dir, "orders")
    x = o.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.round("o_totalprice").cast("long").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 0).otherwise(1).alias("grp"),
    )
    h = x.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    t = h.agg(F.sum("c0").alias("n"), F.sum("c1").alias("m"))
    wv = Window.orderBy("v")
    cum = h.select(
        "c0",
        "c1",
        F.sum("c0").over(wv).alias("f0"),
        F.sum(F.col("c0") + F.col("c1")).over(wv).alias("fp"),
    )
    j = cum.crossJoin(F.broadcast(t))
    big_n = F.col("n") + F.col("m")
    num = ((big_n * F.col("f0") - F.col("n") * F.col("fp"))).cast("double")
    term = F.when(
        F.col("fp") < big_n,
        (F.col("c0") + F.col("c1"))
        * F.pow(num, F.lit(2))
        / (F.col("fp").cast("double") * (big_n - F.col("fp")).cast("double")),
    ).otherwise(0.0)
    w = j.agg(F.sum(term).alias("s"), F.max("n").alias("n"), F.max("m").alias("m"))
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    return w.select(
        F.col("n").cast("long").alias("n_f"),
        F.col("m").cast("long").alias("n_o"),
        F.round(F.col("s") / (nd * md) / (nd + md), 6).alias("ad_a2"),
    )


@register(
    "q_llm_cdc_chunking",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
        FROM documents WHERE LEN(REGEXP_EXTRACT_ALL(LOWER(text),
                                                    '[a-z0-9]+')) >= 8),
    pos AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i,
               ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')
                   AS w4,
               LEN(toks) AS ntok
        FROM t, UNNEST(RANGE(1, LEN(toks) - 2)) u(i)),
    marks AS (
        SELECT doc_id, i, ntok,
               CASE WHEN SUBSTR(MD5(w4), 1, 1) IN ('0', '1') THEN 1
                    ELSE 0 END AS is_boundary
        FROM pos),
    bounds AS (
        SELECT doc_id, i, ntok,
               SUM(is_boundary) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS chunk_no
        FROM marks),
    chunks AS (
        SELECT doc_id, COALESCE(chunk_no, 0) AS chunk_no,
               CAST(COUNT(*) AS BIGINT) AS chunk_len
        FROM bounds GROUP BY doc_id, COALESCE(chunk_no, 0)),
    sizes AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
               ROUND(AVG(CAST(chunk_len AS DOUBLE)), 6) AS mean_len,
               CAST(MAX(chunk_len) AS BIGINT) AS max_len
        FROM chunks),
    sig AS (
        SELECT MD5(doc_id || '|' || chunk_no) AS dummy
        FROM chunks LIMIT 0)
    SELECT sizes.n_chunks, sizes.mean_len, sizes.max_len,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM chunks) AS total_chunks
    FROM sizes
    """,
)
def q_llm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin-style): token positions whose
    4-gram md5 starts with 0/1 (a 1/8 boundary probability → ~8-token
    expected chunks) cut each document into variable-size chunks —
    the storage-dedup technique whose boundaries SURVIVE insertions
    (fixed-size chunking shifts every boundary after an edit; CDC
    re-synchronizes), reported as the chunk-size distribution. The
    boundary predicate is the same portable md5 split as the
    watermark detector, so chunking is exactly oracled.

    Scale: one explode + one per-doc cumulative window (bounded
    partitions) + chunk-grain aggregate — CDC is a single pass, which
    is why dedup backends run it inline at ingest."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"),
    ).filter(F.size("toks") >= 8)
    pos = t.select(
        "doc_id",
        F.explode(F.expr("sequence(1, size(toks) - 3)")).alias("i"),
        F.expr("toks").alias("toks"),
    ).select(
        "doc_id",
        "i",
        F.expr("array_join(slice(toks, i, 4), ' ')").alias("w4"),
    )
    marks = pos.select(
        "doc_id",
        "i",
        F.when(F.substring(F.md5("w4"), 1, 1).isin("0", "1"), 1).otherwise(0).alias(
            "is_boundary"
        ),
    )
    wc = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bounds = marks.select(
        "doc_id",
        F.coalesce(F.sum("is_boundary").over(wc), F.lit(0)).alias("chunk_no"),
    )
    chunks = bounds.groupBy("doc_id", "chunk_no").agg(
        F.count(F.lit(1)).alias("chunk_len")
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.round(F.avg(F.col("chunk_len").cast("double")), 6).alias("mean_len"),
        F.max("chunk_len").alias("max_len"),
        F.count(F.lit(1)).alias("total_chunks"),
    )
