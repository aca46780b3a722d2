"""Round-6 wave 96: Savitzky-Golay smoothing/derivative (literal
integer convolution kernels), the Murphy decomposition of the Brier
score (reliability / resolution / uncertainty), and the
turning-points randomness test. All exactly DuckDB-oracled — the SG
kernels keep every numerator an exact integer, the Brier predictions
are fixed 1-dp literals, and turning points are pure integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_savitzky_golay",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    l AS (
        SELECT day, v,
               LAG(v, 3) OVER w AS m3, LAG(v, 2) OVER w AS m2,
               LAG(v, 1) OVER w AS m1,
               LEAD(v, 1) OVER w AS p1, LEAD(v, 2) OVER w AS p2,
               LEAD(v, 3) OVER w AS p3
        FROM d WINDOW w AS (ORDER BY day))
    SELECT day, CAST(v AS BIGINT) AS revenue,
           ROUND((-2 * m3 + 3 * m2 + 6 * m1 + 7 * v + 6 * p1 + 3 * p2
                  - 2 * p3) / 21.0, 6) AS sg_smooth,
           ROUND((-3 * m3 - 2 * m2 - 1 * m1 + 1 * p1 + 2 * p2 + 3 * p3)
                 / 28.0, 6) AS sg_deriv
    FROM l
    WHERE m3 IS NOT NULL AND p3 IS NOT NULL
    ORDER BY day
    """,
)
def q_ts_savitzky_golay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Savitzky-Golay filtering of daily revenue: the 7-point
    quadratic smoothing kernel (−2,3,6,7,6,3,−2)/21 and the 7-point
    first-derivative kernel (−3,−2,−1,0,1,2,3)/28 — the polynomial
    least-squares smoother that preserves peak height and width where
    a moving average flattens them, plus the local trend velocity.
    The kernels are LITERAL integers, so each numerator is one exact
    integer combination of lag/lead values and the output is a single
    division — exactly oracled. Frames are over observed days (row
    kernel), the standard convention for business-day series.

    Scale: one fact pass to day grain, then six lag/leads in ONE
    ordered window pass over the dimension-sized series — convolution
    as a window, no self-join, no UDF."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    l = d.select(
        "day",
        "v",
        F.lag("v", 3).over(w).alias("m3"),
        F.lag("v", 2).over(w).alias("m2"),
        F.lag("v", 1).over(w).alias("m1"),
        F.lead("v", 1).over(w).alias("p1"),
        F.lead("v", 2).over(w).alias("p2"),
        F.lead("v", 3).over(w).alias("p3"),
    )
    smooth_num = (
        -2 * F.col("m3") + 3 * F.col("m2") + 6 * F.col("m1") + 7 * F.col("v")
        + 6 * F.col("p1") + 3 * F.col("p2") - 2 * F.col("p3")
    )
    deriv_num = (
        -3 * F.col("m3") - 2 * F.col("m2") - F.col("m1")
        + F.col("p1") + 2 * F.col("p2") + 3 * F.col("p3")
    )
    return (
        l.filter(F.col("m3").isNotNull() & F.col("p3").isNotNull())
        .select(
            "day",
            F.col("v").cast("long").alias("revenue"),
            F.round(smooth_num / 21.0, 6).alias("sg_smooth"),
            F.round(deriv_num / 28.0, 6).alias("sg_deriv"),
        )
        .orderBy("day")
    )


@register(
    "q_ml_brier_decomposition",
    oracle="""
    WITH p AS (
        SELECT ROUND(LEAST(n_chars, 999) / 1000.0, 1) AS pred,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
        FROM documents),
    g AS (
        SELECT pred, CAST(COUNT(*) AS BIGINT) AS nk,
               CAST(SUM(o) AS BIGINT) AS pk
        FROM p GROUP BY pred),
    t AS (
        SELECT CAST(SUM(nk) AS BIGINT) AS n,
               CAST(SUM(pk) AS BIGINT) AS pos
        FROM g),
    terms AS (
        SELECT SUM(CAST(nk AS DOUBLE)
                   * (pred - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE))
                   * (pred - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)))
                   / CAST(t.n AS DOUBLE) AS rel,
               SUM(CAST(nk AS DOUBLE)
                   * (CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)
                      - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * (CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)
                      - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE)))
                   / CAST(t.n AS DOUBLE) AS res,
               (CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * (1 - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))
                   AS unc,
               t.n AS n
        FROM g CROSS JOIN t GROUP BY t.n, t.pos)
    SELECT n, ROUND(rel, 6) AS reliability, ROUND(res, 6) AS resolution,
           ROUND(unc, 6) AS uncertainty,
           ROUND(rel - res + unc, 6) AS brier_score
    FROM terms
    """,
)
def q_ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for a fixed
    length-based English predictor (p = min(n_chars, 999)/1000,
    1-dp binned): Brier = reliability − resolution + uncertainty.
    Reliability isolates miscalibration, resolution rewards bins that
    separate outcomes, uncertainty is the data's irreducible floor —
    together they tell you whether to fix the model or accept the
    task is hard, which the raw Brier (or ECE alone,
    q_ml_calibration) cannot. Predictions are fixed 1-dp literals, so
    bins are exact and every term derives from integer (n_k, pos_k)
    cells — exactly oracled.

    Scale: one conditional pass to (prediction-bin)-grain — 11 rows
    of state regardless of corpus size; the decomposition is a fold
    over bins."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        F.round(F.least(F.col("n_chars"), F.lit(999)) / 1000.0, 1).alias("pred"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("o"),
    )
    g = p.groupBy("pred").agg(
        F.count(F.lit(1)).alias("nk"), F.sum("o").alias("pk")
    )
    t = g.agg(F.sum("nk").alias("n"), F.sum("pk").alias("pos"))
    nkd = F.col("nk").cast("double")
    ok = F.col("pk").cast("double") / nkd
    obar = F.col("pos").cast("double") / F.col("n").cast("double")
    terms = (
        g.crossJoin(F.broadcast(t))
        .groupBy("n", "pos")
        .agg(
            (F.sum(nkd * (F.col("pred") - ok) * (F.col("pred") - ok))).alias("rel_num"),
            (F.sum(nkd * (ok - obar) * (ok - obar))).alias("res_num"),
        )
        .select(
            "n",
            (F.col("rel_num") / F.col("n").cast("double")).alias("rel"),
            (F.col("res_num") / F.col("n").cast("double")).alias("res"),
            (obar * (1 - obar)).alias("unc"),
        )
    )
    return terms.select(
        "n",
        F.round("rel", 6).alias("reliability"),
        F.round("res", 6).alias("resolution"),
        F.round("unc", 6).alias("uncertainty"),
        F.round(F.col("rel") - F.col("res") + F.col("unc"), 6).alias("brier_score"),
    )


@register(
    "q_ts_turning_points",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    l AS (
        SELECT v, LAG(v) OVER w AS prev, LEAD(v) OVER w AS next
        FROM d WINDOW w AS (ORDER BY day)),
    c AS (
        SELECT CAST(SUM(CASE WHEN (v > prev AND v > next)
                             OR (v < prev AND v < next)
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(COUNT(*) AS BIGINT) + 2 AS n
        FROM l WHERE prev IS NOT NULL AND next IS NOT NULL)
    SELECT tp AS turning_points, n AS n_days,
           ROUND(2.0 * (CAST(n AS DOUBLE) - 2) / 3.0, 6) AS expected_iid,
           ROUND((CAST(tp AS DOUBLE)
                  - 2.0 * (CAST(n AS DOUBLE) - 2) / 3.0)
                 / SQRT((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6)
               AS z_score
    FROM c
    """,
)
def q_ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test on daily revenue: count the
    strict local extrema and compare to the i.i.d. expectation
    2(n−2)/3 with variance (16n−29)/90 — fewer turning points than
    chance means momentum/trend, more means oscillation
    (overdifferencing). The rank-free cousin of the runs test
    (q_stat_runs_test tests signs around a level; this tests SHAPE).
    Pure integer comparisons and counts; one closed-form z.

    Scale: day-grain lag/lead in one window pass, one fold —
    dimension-sized everywhere."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    l = d.select(
        "v", F.lag("v").over(w).alias("prev"), F.lead("v").over(w).alias("next")
    ).filter(F.col("prev").isNotNull() & F.col("next").isNotNull())
    c = l.agg(
        F.sum(
            F.when(
                ((F.col("v") > F.col("prev")) & (F.col("v") > F.col("next")))
                | ((F.col("v") < F.col("prev")) & (F.col("v") < F.col("next"))),
                1,
            ).otherwise(0)
        ).alias("tp"),
        (F.count(F.lit(1)) + 2).alias("n"),
    )
    nd = F.col("n").cast("double")
    exp = 2.0 * (nd - 2) / 3.0
    return c.select(
        F.col("tp").alias("turning_points"),
        F.col("n").alias("n_days"),
        F.round(exp, 6).alias("expected_iid"),
        F.round(
            (F.col("tp").cast("double") - exp) / F.sqrt((16.0 * nd - 29.0) / 90.0), 6
        ).alias("z_score"),
    )
