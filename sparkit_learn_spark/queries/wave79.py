"""Round-6 wave 79: a Granger-style lagged-predictor F-test (does
yesterday's shipped quantity improve today's revenue forecast beyond
revenue's own lag), the Mann-Kendall trend test (the significance
twin of the registered Theil-Sen slope, exact pairwise integer
signs), and a winsorized mean (histogram-fence clamping, exact
interior sums). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_GRANGER_SQL = """
    WITH y AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS yv
        FROM {orders} GROUP BY 1),
    x AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS xv
        FROM {lineitem} GROUP BY 1),
    ser AS (
        SELECT y.d, y.yv,
               LAG(y.yv) OVER (ORDER BY y.d) AS y1,
               LAG(COALESCE(x.xv, 0)) OVER (ORDER BY y.d) AS x1
        FROM y LEFT JOIN x ON x.d = y.d),
    obs AS (SELECT yv, y1, x1 FROM ser WHERE y1 IS NOT NULL),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yv) AS DECIMAL(38, 0)) AS sy,
               CAST(SUM(y1) AS DECIMAL(38, 0)) AS s1,
               CAST(SUM(x1) AS DECIMAL(38, 0)) AS s2,
               SUM(CAST(yv AS DECIMAL(38, 0)) * CAST(yv AS DECIMAL(38, 0)))
                   AS syy,
               SUM(CAST(y1 AS DECIMAL(38, 0)) * CAST(y1 AS DECIMAL(38, 0)))
                   AS s11,
               SUM(CAST(x1 AS DECIMAL(38, 0)) * CAST(x1 AS DECIMAL(38, 0)))
                   AS s22,
               SUM(CAST(yv AS DECIMAL(38, 0)) * CAST(y1 AS DECIMAL(38, 0)))
                   AS sy1,
               SUM(CAST(yv AS DECIMAL(38, 0)) * CAST(x1 AS DECIMAL(38, 0)))
                   AS sy2,
               SUM(CAST(y1 AS DECIMAL(38, 0)) * CAST(x1 AS DECIMAL(38, 0)))
                   AS s12
        FROM obs),
    c AS (
        SELECT n,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / n AS vyy,
               CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / n AS v11,
               CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / n AS v22,
               CAST(sy1 AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / n AS vy1,
               CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / n AS vy2,
               CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / n AS v12
        FROM m),
    f AS (
        SELECT n,
               vyy - vy1 * vy1 / v11 AS rss_a,
               vyy - (v22 * vy1 - v12 * vy2) / (v11 * v22 - v12 * v12)
                     * vy1
                   - (v11 * vy2 - v12 * vy1) / (v11 * v22 - v12 * v12)
                     * vy2 AS rss_b
        FROM c)
    SELECT n AS n_days,
           ROUND(rss_a / rss_b + 0.0, 6) AS rss_ratio,
           ROUND((rss_a - rss_b) / (rss_b / (n - 3)) + 0.0, 6) AS f_stat,
           ROUND(1.0 - rss_b / rss_a + 0.0, 6) AS partial_r2
    FROM f
"""


@register(
    "q_ts_granger",
    oracle=_GRANGER_SQL.format(orders="orders", lineitem="lineitem"),
)
def q_ts_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style lagged-predictor test: does yesterday's shipped
    quantity add forecasting power for today's revenue beyond
    revenue's own lag? Restricted model y_t ~ y_{t−1} vs full model
    y_t ~ y_{t−1} + x_{t−1}, both solved in closed form from exact
    DECIMAL(38,0) day-grain moments (2×2 normal equations), compared
    by the incremental F statistic — the standard
    "does-this-signal-lead-that-one" screen before anyone builds a
    multivariate forecaster.

    Scale: two fact tables collapse map-side to day grain (~2.4k
    rows), one LAG window over the dimension-sized series, one
    moments aggregate — identical closed-form doubles both engines.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_granger_v"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_granger_v"
    )
    return spark.sql(
        _GRANGER_SQL.format(
            orders="orders_granger_v", lineitem="lineitem_granger_v"
        )
    )


_MK_SQL = """
    WITH ser AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM {orders} GROUP BY 1),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM ser a JOIN ser b ON a.d < b.d),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ser),
    ties AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                    AS BIGINT) AS tc
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
              FROM ser GROUP BY v HAVING COUNT(*) > 1))
    SELECT n.n AS n_days, s.s AS mk_s,
           ROUND(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tc
                      AS DOUBLE) / 18.0, 6) AS var_s,
           ROUND((s.s - CASE WHEN s.s > 0 THEN 1
                             WHEN s.s < 0 THEN -1 ELSE 0 END)
                 / SQRT(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tc
                             AS DOUBLE) / 18.0) + 0.0, 6) AS z_stat
    FROM s CROSS JOIN n CROSS JOIN ties
"""


@register("q_ts_mann_kendall", oracle=_MK_SQL.format(orders="orders"))
def q_ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily revenue: S = Σ_{i<j}
    sign(v_j − v_i) over all day pairs with the tie-corrected
    variance and continuity-corrected Z — the nonparametric
    significance twin of the registered Theil-Sen slope (Theil-Sen
    answers "how steep", Mann-Kendall answers "is it real"). S and
    the tie correction are exact integers; only the final Z divides.

    Scale: the fact collapses to day grain first, so the pairwise
    sign join is bounded by days² (dimension-sized), not rows² —
    the same contract as Theil-Sen; at very long horizons the
    O(n log n) rank rewrite applies.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_mk_v"
    )
    return spark.sql(_MK_SQL.format(orders="orders_mk_v"))


_PCT_LO, _PCT_HI = 5, 95


@register(
    "q_stat_winsorized_mean",
    oracle=f"""
    WITH base AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    h AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c
          FROM base GROUP BY cents),
    cum AS (SELECT cents, c, SUM(c) OVER (ORDER BY cents) AS cc FROM h),
    lo AS (SELECT MIN(cents) AS p05 FROM cum CROSS JOIN n
           WHERE cc >= ({_PCT_LO} * n.n + 99) // 100),
    hi AS (SELECT MIN(cents) AS p95 FROM cum CROSS JOIN n
           WHERE cc >= ({_PCT_HI} * n.n + 99) // 100),
    w AS (
        SELECT CAST(SUM(CASE WHEN b.cents < lo.p05 THEN lo.p05
                             WHEN b.cents > hi.p95 THEN hi.p95
                             ELSE b.cents END) AS BIGINT) AS s,
               CAST(SUM(CASE WHEN b.cents < lo.p05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_lo,
               CAST(SUM(CASE WHEN b.cents > hi.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hi,
               CAST(SUM(b.cents) AS BIGINT) AS s_raw
        FROM base b CROSS JOIN lo CROSS JOIN hi)
    SELECT n.n AS n_orders, lo.p05 AS p05_cents, hi.p95 AS p95_cents,
           w.n_lo AS n_clipped_low, w.n_hi AS n_clipped_high,
           ROUND(CAST(w.s AS DOUBLE) / n.n / 100.0, 6) AS winsorized_mean,
           ROUND(CAST(w.s_raw AS DOUBLE) / n.n / 100.0, 6) AS raw_mean
    FROM n CROSS JOIN lo CROSS JOIN hi CROSS JOIN w
    """,
)
def q_stat_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of order value: the 5th/95th percentile fences
    come from the histogram cumulative-crossing idiom (never a global
    sort), every value is clamped to the fences, and the mean divides
    one exact clamped-cents sum — the robust-location companion to
    the registered trimmed mean (winsorizing keeps the tails' COUNT
    but caps their leverage; trimming removes them).

    Scale: one histogram aggregate at distinct-value grain, a window
    over that bounded domain for both fences, then a second single
    pass with two broadcast scalars. Exact integers until the final
    division.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    ).persist()
    n = base.agg(F.count(F.lit(1)).alias("n"))
    h = base.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    cum = h.select(
        "cents", "c", F.sum("c").over(Window.orderBy("cents")).alias("cc")
    )

    def fence(pct: int, name: str) -> DataFrame:
        return (
            cum.crossJoin(F.broadcast(n))
            .filter(F.col("cc") >= F.expr(f"({pct} * n + 99) div 100"))
            .agg(F.min("cents").alias(name))
        )

    lo = fence(_PCT_LO, "p05")
    hi = fence(_PCT_HI, "p95")
    w = (
        base.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.sum(
                F.when(F.col("cents") < F.col("p05"), F.col("p05"))
                .when(F.col("cents") > F.col("p95"), F.col("p95"))
                .otherwise(F.col("cents"))
            ).alias("s"),
            F.sum(
                F.when(F.col("cents") < F.col("p05"), 1).otherwise(0)
            ).alias("n_lo"),
            F.sum(
                F.when(F.col("cents") > F.col("p95"), 1).otherwise(0)
            ).alias("n_hi"),
            F.sum("cents").alias("s_raw"),
        )
    )
    return (
        n.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(w))
        .select(
            F.col("n").alias("n_orders"),
            F.col("p05").alias("p05_cents"),
            F.col("p95").alias("p95_cents"),
            F.col("n_lo").alias("n_clipped_low"),
            F.col("n_hi").alias("n_clipped_high"),
            F.round(
                F.col("s").cast("double") / F.col("n") / 100.0, 6
            ).alias("winsorized_mean"),
            F.round(
                F.col("s_raw").cast("double") / F.col("n") / 100.0, 6
            ).alias("raw_mean"),
        )
    )
