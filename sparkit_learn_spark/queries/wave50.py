"""Round-6 wave 50: conversion-latency distribution (signup → first
purchase), ABC inventory classification (cumulative-share banding
with integer thresholds), and the Jarque–Bera normality test on the
daily-revenue series. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_conversion_latency",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
        SELECT e.user_id,
               MIN(e.ts) AS t1
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.t0
        GROUP BY e.user_id),
    lat AS (
        SELECT CAST(FLOOR((epoch(p.t1) - epoch(s.t0)) / 3600) AS BIGINT)
            AS hours
        FROM s JOIN p ON p.user_id = s.user_id),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signups
        FROM lat)
    SELECT CASE WHEN hours < 1 THEN '0_under_1h'
                WHEN hours < 24 THEN '1_1h_24h'
                WHEN hours < 168 THEN '2_1d_7d'
                ELSE '3_over_7d' END AS latency_band,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(COUNT(*) / CAST(t.n_signups AS DOUBLE), 6)
               AS share_of_signups
    FROM lat CROSS JOIN tot t
    GROUP BY 1, t.n_signups
    """,
)
def q_evt_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for each user who signs up
    and later purchases, the delay between first signup and first
    subsequent purchase, banded (under-1h / same-day / week / longer)
    with each band's share of ALL signups — the funnel-velocity view
    that step-conversion counts (q_evt_funnel) flatten away, and the
    number that sets a realistic attribution window. Integer hour
    arithmetic; deterministic MIN-based endpoints.

    Scale: two per-user MIN aggregates (map-side combining) and one
    user-grain join — no event-to-event self-join; the band rollup is
    constant-sized."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    lat = s.join(p, "user_id").select(
        F.floor(
            (F.unix_timestamp("t1") - F.unix_timestamp("t0")) / 3600
        )
        .cast("long")
        .alias("hours")
    )
    n_signups = s.agg(F.count("*").alias("n_signups"))
    band = (
        F.when(F.col("hours") < 1, "0_under_1h")
        .when(F.col("hours") < 24, "1_1h_24h")
        .when(F.col("hours") < 168, "2_1d_7d")
        .otherwise("3_over_7d")
    )
    return (
        lat.crossJoin(F.broadcast(n_signups))
        .groupBy(band.alias("latency_band"), "n_signups")
        .agg(F.count("*").alias("n_users"))
        .select(
            "latency_band",
            "n_users",
            F.round(
                F.col("n_users") / F.col("n_signups").cast("double"), 6
            ).alias("share_of_signups"),
        )
    )


@register(
    "q_fin_abc_classification",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1),
    ranked AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cents) OVER () AS total
        FROM pr),
    classed AS (
        SELECT CASE WHEN cum * 100 <= 80 * total THEN 'A'
                    WHEN cum * 100 <= 95 * total THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents, total
        FROM ranked)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           ROUND(SUM(cents) / CAST(MAX(total) AS DOUBLE), 6)
               AS revenue_share
    FROM classed GROUP BY abc_class
    """,
)
def q_fin_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    while cumulative revenue stays within 80% of total, B to 95%, C
    beyond — the Pareto BANDING (every part gets a class) that
    complements q_agg_pareto's how-many-cover-80% count. The class
    boundary is the INTEGER inequality cum·100 ≤ pct·total, so no
    float share can flip a part's class between engines;
    deterministic rank via (revenue, key).

    Scale: one part-grain aggregate, then a global revenue-ordered
    cumulative window — at 100 TB replace with histogram-banded
    cumulative shares (gains/lift pattern); class rollup is
    3 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents")
    )
    wcum = Window.orderBy(F.col("cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ranked = pr.select(
        "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(wall).alias("total"),
    )
    classed = ranked.select(
        F.when(F.col("cum") * 100 <= 80 * F.col("total"), "A")
        .when(F.col("cum") * 100 <= 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "total",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("cents").alias("revenue_cents"),
        F.round(
            F.sum("cents") / F.max("total").cast("double"), 6
        ).alias("revenue_share"),
    )


@register(
    "q_stat_jarque_bera",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100
                   AS rev
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(rev AS HUGEINT)) AS DOUBLE) AS s1,
               CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE) AS s2,
               CAST(SUM(CAST(rev AS HUGEINT) * rev * rev) AS DOUBLE)
                   AS s3,
               CAST(SUM(CAST(rev AS HUGEINT) * rev * rev * rev)
                    AS DOUBLE) AS s4
        FROM day),
    c AS (
        SELECT n, s1 / n AS mu,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3 * (s1 / n) * (s2 / n)
                 + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4 * (s1 / n) * (s3 / n)
                 + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                 - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM m)
    SELECT n AS n_days,
           ROUND(m3 / POWER(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis,
           ROUND(n / 6.0 * (POWER(m3 / POWER(m2, 1.5), 2)
                 + POWER(m4 / (m2 * m2) - 3, 2) / 4.0), 6) AS jb_stat
    FROM c
    """,
)
def q_stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test on the daily-revenue series:
    JB = n/6·(S² + K²/4) from the exact 128-bit power sums — the
    gate on every Gaussian assumption downstream (z-intervals,
    3-sigma outlier fences, the CUPED normal approximation); a large
    JB says use the robust/nonparametric twins instead (MAD fences,
    runs test, Mann-Whitney). One double step after exact moments.

    Scale: day-grain series after one map-side aggregate; the series
    floors to integer DOLLARS first (pure integer division, identical
    both engines) so the rev⁴ sums stay inside 128-bit accumulators
    (HUGEINT/DECIMAL38 — daily cents to the 4th power would not),
    then constant-size algebra."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "sum(cast(round(o_totalprice * 100) as bigint)) div 100"
        )
        .cast("decimal(38,0)")
        .alias("rev")
    )
    m = day.agg(
        F.count("*").alias("n"),
        F.sum("rev").cast("double").alias("s1"),
        F.sum(F.col("rev") * F.col("rev")).cast("double").alias("s2"),
        F.sum(F.col("rev") * F.col("rev") * F.col("rev"))
        .cast("double")
        .alias("s3"),
        F.sum(F.col("rev") * F.col("rev") * F.col("rev") * F.col("rev"))
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2) - 3
    return m.select(
        F.col("n").alias("n_days"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(n / 6.0 * (F.pow(skew, 2) + F.pow(kurt, 2) / 4.0), 6).alias(
            "jb_stat"
        ),
    )
