"""Round-6 wave 34: top-N + Other rollup (BI long-tail compaction),
per-group OLS trend lines from exact integer moments, and the
SQL-standard PERCENTILE_CONT surface (interpolated quantiles, vs the
repo's histogram-crossing type-1 quantiles). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_topn_other",
    oracle="""
    WITH cnt AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source),
    ranked AS (
        SELECT source, n_docs, chars,
               ROW_NUMBER() OVER (ORDER BY n_docs DESC, source) AS rnk
        FROM cnt),
    bucketed AS (
        SELECT CASE WHEN rnk <= 3 THEN source ELSE 'Other' END AS bucket,
               CASE WHEN rnk <= 3 THEN rnk ELSE 999 END AS ord,
               n_docs, chars
        FROM ranked),
    agg AS (
        SELECT bucket, MIN(ord) AS ord,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(chars) AS BIGINT) AS chars
        FROM bucketed GROUP BY bucket),
    tot AS (SELECT SUM(n_docs) AS total FROM agg)
    SELECT bucket, n_docs, chars,
           ROUND(n_docs / CAST(t.total AS DOUBLE), 6) AS share
    FROM agg CROSS JOIN tot t
    """,
)
def q_agg_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + Other rollup: the three largest sources keep their
    identity, the long tail compacts into one 'Other' bucket, each
    with counts and share-of-total — the BI presentation op behind
    every pie/pareto panel (and the cardinality clamp dashboards
    apply before plotting a high-cardinality dimension).
    Deterministic ranking via (count, name) tie-break; exact
    integers until the final share.

    Scale: ranks at category grain (the post-aggregate), not row
    grain — the fact table contributes one map-side-combined count,
    the bucketing is a dimension-sized window, and the total is a
    one-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    w = Window.orderBy(F.col("n_docs").desc(), "source")
    ranked = cnt.select("*", F.row_number().over(w).alias("rnk"))
    bucketed = ranked.select(
        F.when(F.col("rnk") <= 3, F.col("source"))
        .otherwise("Other")
        .alias("bucket"),
        F.when(F.col("rnk") <= 3, F.col("rnk")).otherwise(999).alias("ord"),
        "n_docs",
        "chars",
    )
    agg = bucketed.groupBy("bucket").agg(
        F.min("ord").alias("ord"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("chars").alias("chars"),
    )
    tot = agg.agg(F.sum("n_docs").alias("total"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_docs",
        "chars",
        F.round(F.col("n_docs") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
    )


@register(
    "q_stat_ols_by_group",
    oracle="""
    WITH pts AS (
        SELECT c.c_nationkey AS nation,
               CAST(date_diff('day', DATE '1995-01-01', o.o_orderdate)
                    AS BIGINT) AS x,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    m AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM pts GROUP BY nation)
    SELECT CAST(nation AS BIGINT) AS nation, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS slope_cents_per_day,
           ROUND((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx)))
                 / n, 6) AS intercept_cents
    FROM m
    """,
)
def q_stat_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-multiples trend mining: an independent OLS line (revenue
    cents vs order-date day index) fitted PER NATION in one pass —
    the segment-level trend detector behind 'which markets are
    growing'. Moments accumulate exactly in DECIMAL(38,0)/HUGEINT
    (x·y products overflow the 2^53 double-exact range), and each
    group's slope/intercept is one closed-form double step at the
    end — no per-group iteration, no ML library.

    Scale: a single map-side-combining aggregate at (nation) grain
    carrying five moments — the same shuffle as a COUNT(*); groups
    are embarrassingly parallel."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pts = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.datediff("o_orderdate", F.lit("1995-01-01"))
        .cast("decimal(19,0)")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100)
        .cast("decimal(19,0)")
        .alias("y"),
    )
    m = pts.groupBy("nation").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("nation").cast("long").alias("nation"),
        "n",
        F.round(slope, 6).alias("slope_cents_per_day"),
        F.round((F.col("sy") - F.col("sx") * slope) / n, 6).alias(
            "intercept_cents"
        ),
    )


@register(
    "q_agg_percentile_cont",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard PERCENTILE_CONT: linearly INTERPOLATED quartiles
    and p90 of extended price per return flag — both engines define
    the continuous quantile identically (value at fractional rank
    p·(n−1), linear interpolation between neighbors), so results
    agree bit-for-bit before the 6dp round. Complements the repo's
    histogram-crossing (type-1) quantiles: interpolated quantiles are
    what BI tools emit; crossing quantiles are what scales cheaper.

    Scale: Spark's exact percentile aggregate sorts per group —
    correct but rank-materializing; at 100 TB swap in
    approx_percentile (t-digest, bounded error, one pass) or the
    histogram-crossing form (q_llm_length_quantiles) — this query IS
    the exact reference those approximations are graded against."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
    )
