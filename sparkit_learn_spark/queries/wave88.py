"""Round-6 wave 88: rank/association statistics — Kendall tau-b
(pairwise concordance at day grain), the Kruskal-Wallis H test
(k-sample rank ANOVA on a value-domain-bounded rank histogram), and
the Durbin-Watson serial-correlation statistic (closed over exact
integer difference moments, no residual materialization). All exactly
DuckDB-oracled: every accumulated moment is an exact integer, so both
engines derive the final doubles from bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_kendall_tau",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS y
        FROM orders GROUP BY 1),
    p AS (
        SELECT CAST(SUM(
                   (CASE WHEN a.x < b.x THEN 1
                         WHEN a.x > b.x THEN -1 ELSE 0 END)
                 * (CASE WHEN a.y < b.y THEN 1
                         WHEN a.y > b.y THEN -1 ELSE 0 END)) AS BIGINT)
                   AS s
        FROM d a JOIN d b ON a.day < b.day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    tx AS (SELECT COALESCE(SUM(c * (c - 1) / 2), 0) AS n1
           FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY x)),
    ty AS (SELECT COALESCE(SUM(c * (c - 1) / 2), 0) AS n2
           FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY y))
    SELECT n.n AS n_days, p.s AS s_minus_d,
           ROUND(CAST(p.s AS DOUBLE)
                 / SQRT((CAST(n.n * (n.n - 1) / 2 - tx.n1 AS DOUBLE))
                        * (CAST(n.n * (n.n - 1) / 2 - ty.n2 AS DOUBLE))),
                 6) AS tau_b
    FROM p CROSS JOIN n CROSS JOIN tx CROSS JOIN ty
    """,
)
def q_stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily order volume and
    daily revenue: the pairwise-concordance statistic (robust to any
    monotone transform, unlike Pearson), with the tau-b tie
    correction for both margins. S = sum of sign-products over day
    pairs is an exact integer; the tie terms n1/n2 come from exact
    count histograms, so tau is one double division both engines
    compute identically.

    Scale: the fact collapses to day grain FIRST, so the pairwise
    set is days² — dimension-sized, the same contract as Theil-Sen /
    Mann-Kendall / Hodges-Lehmann — distributed as a self-join, with
    the tie histograms a value-bounded aggregate."""
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.round("o_totalprice").cast("long")).alias("y"),
        )
        .persist()
    )
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    sgn_x = F.when(F.col("xa") < F.col("xb"), 1).when(F.col("xa") > F.col("xb"), -1).otherwise(0)
    sgn_y = F.when(F.col("ya") < F.col("yb"), 1).when(F.col("ya") > F.col("yb"), -1).otherwise(0)
    p = (
        a.join(b, F.col("da") < F.col("db"))
        .select((sgn_x * sgn_y).cast("long").alias("sp"))
        .agg(F.sum("sp").alias("s"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    tx = (
        d.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.expr("c * (c - 1) / 2")), F.lit(0)).cast("long").alias("n1"))
    )
    ty = (
        d.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.expr("c * (c - 1) / 2")), F.lit(0)).cast("long").alias("n2"))
    )
    return (
        p.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_minus_d"),
            F.round(
                F.col("s").cast("double")
                / F.sqrt(
                    (F.expr("n * (n - 1) / 2 - n1")).cast("double")
                    * (F.expr("n * (n - 1) / 2 - n2")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


@register(
    "q_stat_kruskal_wallis",
    oracle="""
    WITH g AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v,
               o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS cg
        FROM orders GROUP BY 1, 2),
    h AS (SELECT v, SUM(cg) AS c FROM g GROUP BY v),
    r AS (
        SELECT v, c,
               2 * COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS avg2
        FROM h),
    pg AS (
        SELECT g.grp, SUM(g.cg) AS ng, SUM(g.cg * r.avg2) AS r2
        FROM g JOIN r ON g.v = r.v GROUP BY g.grp),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(c * c * c - c) AS DOUBLE) AS tie
          FROM h),
    hh AS (
        SELECT 3.0 / (CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) + 1))
               * SUM(CAST(pg.r2 AS DOUBLE) * CAST(pg.r2 AS DOUBLE)
                     / CAST(pg.ng AS DOUBLE))
               - 3 * (CAST(n.n AS DOUBLE) + 1) AS h_raw,
               CAST(COUNT(*) AS BIGINT) - 1 AS df,
               1 - n.tie / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)
                            * CAST(n.n AS DOUBLE) - CAST(n.n AS DOUBLE))
                   AS tie_c
        FROM pg CROSS JOIN n GROUP BY n.n, n.tie)
    SELECT pg.grp AS o_orderpriority, CAST(pg.ng AS BIGINT) AS n_g,
           ROUND(CAST(pg.r2 AS DOUBLE) / 2 / CAST(pg.ng AS DOUBLE), 6)
               AS mean_rank,
           ROUND(hh.h_raw, 6) AS h_raw,
           ROUND(hh.h_raw / hh.tie_c, 6) AS h_adj,
           hh.df
    FROM pg CROSS JOIN hh ORDER BY pg.grp
    """,
)
def q_stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does order value differ across the five
    order priorities? The k-sample rank ANOVA (the nonparametric
    one-way ANOVA), with mid-ranks for ties and the standard tie
    correction. Ranks are never materialized per row: the rank
    histogram keys on the ROUNDED price value (a bounded domain), and
    twice-the-mid-rank (2·cum + c + 1) keeps every per-group rank sum
    an exact integer, so H is derived from bit-identical doubles in
    both engines.

    Scale: one fact pass builds the (value, group) histogram; the
    global cumulative window runs over the VALUE DOMAIN (≤ ~600k
    rounded prices regardless of row count — TPC-H prices are range-
    bounded), not over rows — the classic histogram-rank trick that
    makes rank tests embarrassingly scalable."""
    o = load_table(spark, sf_dir, "orders")
    g = (
        o.groupBy(
            F.round("o_totalprice").cast("long").alias("v"),
            F.col("o_orderpriority").alias("grp"),
        )
        .agg(F.count(F.lit(1)).alias("cg"))
        .persist()
    )
    h = g.groupBy("v").agg(F.sum("cg").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "v",
        "c",
        (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias("avg2"),
    )
    # pg is 5 rows but fans out to TWO consumers (hh and the final
    # projection); without materialization the whole g->window->join
    # pipeline executes once per consumer (the before-plan showed the
    # value-domain window twice — 34 exchanges). Persisting the 5-row
    # frame runs the pipeline exactly once (guide §5: reuse + cheap
    # recompute is the persist case).
    pg = (
        g.join(r, "v")
        .groupBy("grp")
        .agg(F.sum("cg").alias("ng"), F.sum(F.col("cg") * F.col("avg2")).alias("r2"))
        .persist()
    )
    n = h.agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("c * c * c - c")).cast("double").alias("tie"),
    )
    nd = F.col("n").cast("double")
    hh = (
        pg.crossJoin(F.broadcast(n))
        .groupBy("n", "tie")
        .agg(
            (
                F.lit(3.0)
                / (nd * (nd + 1))
                * F.sum(
                    F.col("r2").cast("double")
                    * F.col("r2").cast("double")
                    / F.col("ng").cast("double")
                )
                - 3 * (nd + 1)
            ).alias("h_raw"),
            (F.count(F.lit(1)) - 1).alias("df"),
        )
        .select(
            "h_raw",
            "df",
            (1 - F.col("tie") / (nd * nd * nd - nd)).alias("tie_c"),
        )
    )
    return (
        pg.crossJoin(F.broadcast(hh))
        .select(
            F.col("grp").alias("o_orderpriority"),
            F.col("ng").alias("n_g"),
            F.round(F.col("r2").cast("double") / 2 / F.col("ng").cast("double"), 6).alias(
                "mean_rank"
            ),
            F.round("h_raw", 6).alias("h_raw"),
            F.round(F.col("h_raw") / F.col("tie_c"), 6).alias("h_adj"),
            "df",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_stat_durbin_watson",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    t AS (
        SELECT v,
               CAST(DATEDIFF('day', MIN(day) OVER (), day) AS BIGINT) AS t,
               v - LAG(v) OVER (ORDER BY day) AS dv,
               CAST(DATEDIFF('day', LAG(day) OVER (ORDER BY day), day)
                    AS BIGINT) AS dt
        FROM d),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(t) AS st, SUM(v) AS sv,
               SUM(CAST(t * t AS DECIMAL(38, 0))) AS stt,
               SUM(CAST(t * v AS DECIMAL(38, 0))) AS stv,
               SUM(CAST(v * v AS DECIMAL(38, 0))) AS svv,
               SUM(CAST(dv * dv AS DECIMAL(38, 0))) AS sdvv,
               SUM(CAST(dv * dt AS DECIMAL(38, 0))) AS sdvt,
               SUM(CAST(dt * dt AS DECIMAL(38, 0))) AS sdtt
        FROM t),
    b AS (
        SELECT n,
               (CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)
                    / CAST(n AS DOUBLE)) /
               (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS slope,
               CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                   / CAST(n AS DOUBLE) AS ayy,
               CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)
                   / CAST(n AS DOUBLE) AS aty,
               CAST(sdvv AS DOUBLE) AS ddvv, CAST(sdvt AS DOUBLE) AS ddvt,
               CAST(sdtt AS DOUBLE) AS ddtt
        FROM m)
    SELECT n AS n_days, ROUND(slope, 6) AS slope,
           ROUND((ddvv - 2 * slope * ddvt + slope * slope * ddtt)
                 / (ayy - slope * aty), 6) AS dw,
           ROUND(1 - (ddvv - 2 * slope * ddvt + slope * slope * ddtt)
                     / (ayy - slope * aty) / 2, 6) AS rho_approx
    FROM b
    """,
)
def q_stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation test on the residuals of
    daily revenue regressed on time (detrended autocorrelation — the
    classic "is there momentum left after the trend?" diagnostic).
    Residuals are NEVER materialized: DW's numerator expands to
    Σdv² − 2b·Σdv·dt + b²·Σdt² over exact integer first-difference
    moments and the denominator to the centered moments of the OLS —
    so the whole statistic is a constant-size expression over exact
    integer sums, bit-identical across engines.

    Scale: one fact pass to day grain, one day-grain window for the
    lag diffs (dimension-sized, single partition over ~2.4k days),
    then a constant-time solve. The residual-free expansion is what
    makes DW distributable — no per-row residual join, no second
    regression pass."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    t = d.select(
        "v",
        F.datediff("day", F.min("day").over(Window.partitionBy())).cast("long").alias("t"),
        (F.col("v") - F.lag("v").over(w)).alias("dv"),
        F.datediff("day", F.lag("day").over(w)).cast("long").alias("dt"),
    )
    dec = "decimal(38,0)"
    m = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("v").alias("sv"),
        F.sum((F.col("t") * F.col("t")).cast(dec)).alias("stt"),
        F.sum((F.col("t") * F.col("v")).cast(dec)).alias("stv"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("svv"),
        F.sum((F.col("dv") * F.col("dv")).cast(dec)).alias("sdvv"),
        F.sum((F.col("dv") * F.col("dt")).cast(dec)).alias("sdvt"),
        F.sum((F.col("dt") * F.col("dt")).cast(dec)).alias("sdtt"),
    )
    nd = F.col("n").cast("double")
    b = m.select(
        "n",
        (
            (F.col("stv").cast("double") - F.col("st").cast("double") * F.col("sv").cast("double") / nd)
            / (F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st").cast("double") / nd)
        ).alias("slope"),
        (F.col("svv").cast("double") - F.col("sv").cast("double") * F.col("sv").cast("double") / nd).alias("ayy"),
        (F.col("stv").cast("double") - F.col("st").cast("double") * F.col("sv").cast("double") / nd).alias("aty"),
        F.col("sdvv").cast("double").alias("ddvv"),
        F.col("sdvt").cast("double").alias("ddvt"),
        F.col("sdtt").cast("double").alias("ddtt"),
    )
    num = F.col("ddvv") - 2 * F.col("slope") * F.col("ddvt") + F.col("slope") * F.col("slope") * F.col("ddtt")
    sse = F.col("ayy") - F.col("slope") * F.col("aty")
    return b.select(
        F.col("n").alias("n_days"),
        F.round("slope", 6).alias("slope"),
        F.round(num / sse, 6).alias("dw"),
        F.round(1 - num / sse / 2, 6).alias("rho_approx"),
    )
