"""Round-6 wave 42: equi-width histogram (the profiler/BI binning
primitive), dedup-weighted statistics (duplication-bias measurement),
and the Theil–Sen robust trend slope (median of pairwise day-grain
slopes). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_histogram_equiwidth",
    oracle="""
    WITH b AS (
        SELECT MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS lo,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS hi
        FROM orders),
    binned AS (
        SELECT LEAST((CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      - b.lo) * 20 // (b.hi - b.lo + 1),
                     19) AS bin,
               b.lo, b.hi
        FROM orders CROSS JOIN b)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(lo + bin * (hi - lo + 1) // 20) AS BIGINT)
               AS bin_lo_cents
    FROM binned GROUP BY bin
    """,
)
def q_agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: 20 bins spanning the
    observed [min, max] in exact cents, bin index computed with PURE
    INTEGER arithmetic ((x−lo)·20 div span) so no float boundary can
    shift a row between engines — the distribution sketch every
    profiler and BI histogram panel starts from, and the binning
    every histogram-grain rewrite in this repo (quantiles,
    gains/lift) builds on.

    Scale: one min/max pass (map-side combining), bounds broadcast,
    then one aggregate at bin grain — two linear scans; at 100 TB
    fuse the bounds pass with a prior statistics collection or use
    fixed domain bounds."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b = o.agg(
        F.min(cents).alias("lo"), F.max(cents).alias("hi")
    )
    span = F.col("hi") - F.col("lo") + 1
    binned = o.crossJoin(F.broadcast(b)).select(
        F.least(
            F.expr(
                "(cast(round(o_totalprice * 100) as bigint) - lo) * 20"
                " div (hi - lo + 1)"
            ),
            F.lit(19).cast("bigint"),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.min(F.expr("lo + bin * (hi - lo + 1) div 20"))
        .cast("long")
        .alias("bin_lo_cents"),
    )


@register(
    "q_llm_dedup_weighted_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, n_chars,
               sha256(lower(trim(text))) AS sha
        FROM documents),
    raw AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM t GROUP BY source),
    kept AS (
        SELECT arg_min(source, doc_id) AS source,
               arg_min(n_chars, doc_id) AS k_chars
        FROM t GROUP BY sha),
    dd AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(k_chars) AS BIGINT) AS sum_k_chars
        FROM kept GROUP BY source)
    SELECT r.source, r.n_docs, dd.n_clusters,
           ROUND(r.sum_chars / CAST(r.n_docs AS DOUBLE), 6)
               AS raw_mean_chars,
           ROUND(dd.sum_k_chars / CAST(dd.n_clusters AS DOUBLE), 6)
               AS dedup_mean_chars,
           ROUND(r.sum_chars / CAST(r.n_docs AS DOUBLE)
                 - dd.sum_k_chars / CAST(dd.n_clusters AS DOUBLE), 6)
               AS dup_bias
    FROM raw r JOIN dd ON dd.source = r.source
    """,
)
def q_llm_dedup_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-bias measurement: per source, mean document length
    computed RAW (every copy counts) vs DEDUP-WEIGHTED (each exact-
    duplicate cluster counts once, attributed to its canonical
    min-id doc) — the gap is the bias duplicates inject into any
    per-doc statistic, the reason corpus stats must be quoted
    post-dedup. Exact integers until the final means.

    Scale: the raw side is one source-grain aggregate; the dedup side
    is the exact-dedup digest aggregate (arg_min carries the
    canonical's attributes through the shuffle — no join back to the
    text) then a source-grain rollup."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.sha2(F.lower(F.trim("text")), 256).alias("sha"),
    )
    raw = t.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    kept = (
        t.select(
            "sha", F.struct("doc_id", "source", "n_chars").alias("rec")
        )
        .groupBy("sha")
        .agg(F.min("rec").alias("k"))
        .select(
            F.col("k.source").alias("source"),
            F.col("k.n_chars").alias("k_chars"),
        )
    )
    dd = kept.groupBy("source").agg(
        F.count("*").alias("n_clusters"),
        F.sum("k_chars").alias("sum_k_chars"),
    )
    raw_mean = F.col("sum_chars") / F.col("n_docs").cast("double")
    dd_mean = F.col("sum_k_chars") / F.col("n_clusters").cast("double")
    return raw.join(dd, "source").select(
        "source",
        "n_docs",
        "n_clusters",
        F.round(raw_mean, 6).alias("raw_mean_chars"),
        F.round(dd_mean, 6).alias("dedup_mean_chars"),
        F.round(raw_mean - dd_mean, 6).alias("dup_bias"),
    )


@register(
    "q_ts_theil_sen",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    s AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, d, rev FROM day),
    slopes AS (
        SELECT CAST(ROUND(1e6 * (b.rev - a.rev)
                    / date_diff('day', a.d, b.d)) AS BIGINT) AS slope_u
        FROM s a JOIN s b ON b.i > a.i),
    ranked AS (
        SELECT slope_u, ROW_NUMBER() OVER (ORDER BY slope_u) AS rn,
               COUNT(*) OVER () AS n
        FROM slopes)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(slope_u / 1e6, 6) AS theil_sen_slope_cents_per_day
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise day-to-day
    slopes of the daily-revenue series — the estimator that shrugs
    off the outlier days OLS chases (breakdown point 29%). Slopes
    quantize to integer micro-units before the deterministic median
    selection (row at rank (n+1)/2).

    Scale: the pairwise join is QUADRATIC IN DAYS, not in data — the
    day series is calendar-bounded (~2.4k days/decade → ~3M pairs
    regardless of corpus size), so cost is constant as the fact table
    grows; the fact contributes one map-side-combined aggregate. For
    century-scale series swap in the repeated-median or a
    sampled-pairs variant."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    s = day.select(
        F.row_number().over(Window.orderBy("d")).alias("i"), "d", "rev"
    )
    a = s.select(
        F.col("i").alias("ia"), F.col("d").alias("da"), F.col("rev").alias("ra")
    )
    b = s.select(
        F.col("i").alias("ib"), F.col("d").alias("db"), F.col("rev").alias("rb")
    )
    slopes = a.join(b, F.col("ib") > F.col("ia")).select(
        F.round(
            1e6
            * (F.col("rb") - F.col("ra"))
            / F.datediff("db", "da")
        )
        .cast("long")
        .alias("slope_u")
    )
    ranked = slopes.select(
        "slope_u",
        F.row_number().over(Window.orderBy("slope_u")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(F.col("slope_u") / 1e6, 6).alias(
            "theil_sen_slope_cents_per_day"
        ),
    )
