"""Round-6 wave 107: Breusch-Pagan heteroskedasticity test on the
daily trend regression, KPSS level-stationarity statistic (exact
integer partial sums), and the best consecutive revenue run
(max-subarray via prefix-sum windows — the positive twin of max
drawdown). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_breusch_pagan",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    t AS (
        SELECT v, CAST(DATEDIFF('day', MIN(day) OVER (), day) AS BIGINT)
                   AS t
        FROM d),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(t) AS st, SUM(v) AS sv,
               SUM(CAST(t * t AS DECIMAL(38, 0))) AS stt,
               SUM(CAST(t * v AS DECIMAL(38, 0))) AS stv
        FROM t),
    b AS (
        SELECT n, CAST(st AS DOUBLE) AS std, CAST(sv AS DOUBLE) AS svd,
               CAST(n AS DOUBLE) AS nd,
               (CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS slope
        FROM m),
    e AS (
        SELECT CAST(t.t AS DOUBLE) AS td,
               POW(CAST(t.v AS DOUBLE)
                   - ((b.svd - b.slope * b.std) / b.nd
                      + b.slope * CAST(t.t AS DOUBLE)), 2) AS e2
        FROM t CROSS JOIN b),
    m2 AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(td) AS st, SUM(e2) AS se,
               SUM(td * td) AS stt, SUM(td * e2) AS ste, SUM(e2 * e2) AS see
        FROM e)
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(n * POW(ste - st * se / n, 2)
                 / ((stt - st * st / n) * (see - se * se / n)), 6)
               AS bp_lm_stat
    FROM m2
    """,
)
def q_stat_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test on the daily-revenue
    trend regression: regress the SQUARED residuals on time and
    report the LM statistic n·R² — is the variance itself growing
    (fan-shaped residuals), which silently invalidates every OLS
    standard error, CI, and the Durbin-Watson companion test? First
    pass is exact integer moments; the residual-square pass sums
    per-day doubles derived from bit-identical inputs (day-grain
    float-sum contract, error « 6dp).

    Scale: two aggregate passes over the day grain with one
    broadcast of four scalars between them — the auxiliary
    regression never materializes a residual table wider than the
    day dimension."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    t = d.select(
        "v",
        F.datediff("day", F.min("day").over(Window.partitionBy())).cast("long").alias("t"),
    )
    dec = "decimal(38,0)"
    m = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("v").alias("sv"),
        F.sum((F.col("t") * F.col("t")).cast(dec)).alias("stt"),
        F.sum((F.col("t") * F.col("v")).cast(dec)).alias("stv"),
    )
    nd = F.col("n").cast("double")
    b = m.select(
        nd.alias("nd"),
        F.col("st").cast("double").alias("std"),
        F.col("sv").cast("double").alias("svd"),
        (
            (F.col("stv").cast("double") - F.col("st").cast("double") * F.col("sv").cast("double") / nd)
            / (F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st").cast("double") / nd)
        ).alias("slope"),
    )
    e = t.crossJoin(F.broadcast(b)).select(
        F.col("t").cast("double").alias("td"),
        F.pow(
            F.col("v").cast("double")
            - (
                (F.col("svd") - F.col("slope") * F.col("std")) / F.col("nd")
                + F.col("slope") * F.col("t").cast("double")
            ),
            F.lit(2),
        ).alias("e2"),
    )
    m2 = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("td").alias("st"),
        F.sum("e2").alias("se"),
        F.sum(F.col("td") * F.col("td")).alias("stt"),
        F.sum(F.col("td") * F.col("e2")).alias("ste"),
        F.sum(F.col("e2") * F.col("e2")).alias("see"),
    )
    n2 = F.col("n")
    num = F.pow(F.col("ste") - F.col("st") * F.col("se") / n2, F.lit(2))
    den = (F.col("stt") - F.col("st") * F.col("st") / n2) * (
        F.col("see") - F.col("se") * F.col("se") / n2
    )
    return m2.select(
        n2.cast("long").alias("n_days"),
        F.round(n2 * num / den, 6).alias("bp_lm_stat"),
    )


@register(
    "q_ts_kpss",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s,
               SUM(CAST(v * v AS DECIMAL(38, 0))) AS q
        FROM d),
    c AS (
        SELECT SUM(d.v * m.n - m.s) OVER (ORDER BY d.day) AS st,
               m.n AS n, m.s AS s, m.q AS q
        FROM d CROSS JOIN m),
    agg AS (
        SELECT n,
               SUM(CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS sum_st2,
               (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS var_unit
        FROM c GROUP BY n, q, s)
    SELECT n AS n_days,
           ROUND(sum_st2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * var_unit), 6) AS kpss_stat
    FROM agg
    """,
)
def q_ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (lag-0 variant) for daily
    revenue: Σ S_t² / (n²·σ̂²) over the cumulative demeaned partial
    sums — the test whose NULL is stationarity (the complement of
    unit-root tests: reject ⇒ the series wanders and every
    same-mean assumption downstream is wrong; ~0.05-0.15 = stationary,
    >0.463 rejects at 5%). Partial sums stay EXACT integers via the
    v·n − S demeaning trick (S_t·n = n·Σv_i − t·S), so the statistic
    is one double ratio.

    Scale: day-grain cumulative window + one fold — the
    dimension-sized single-partition contract."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("q"),
    )
    c = d.crossJoin(F.broadcast(m)).select(
        F.sum(F.col("v") * F.col("n") - F.col("s")).over(Window.orderBy("day")).alias("st"),
        "n",
        "s",
        "q",
    )
    agg = c.groupBy("n", "s", "q").agg(
        F.sum(F.col("st").cast("double") * F.col("st").cast("double")).alias("sum_st2")
    )
    nd = F.col("n").cast("double")
    var_unit = nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")
    return agg.select(
        F.col("n").alias("n_days"),
        F.round(F.col("sum_st2") / (nd * nd * var_unit), 6).alias("kpss_stat"),
    )


@register(
    "q_ts_best_run",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    m AS (SELECT CAST(SUM(v) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n FROM d),
    x AS (
        SELECT day, d.v * m.n - m.s AS dv, m.n, m.s
        FROM d CROSS JOIN m),
    p0 AS (
        SELECT day, SUM(dv) OVER (ORDER BY day) AS pref
        FROM x),
    p AS (
        SELECT day, pref,
               COALESCE(MIN(pref) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS minpref
        FROM p0),
    best AS (
        SELECT day AS end_day, pref - minpref AS gain,
               ROW_NUMBER() OVER (ORDER BY pref - minpref DESC, day) AS rn
        FROM p)
    SELECT b.end_day, CAST(b.gain AS BIGINT) AS excess_units,
           ROUND(CAST(b.gain AS DOUBLE) / CAST(m.n AS DOUBLE), 6)
               AS excess_revenue
    FROM best b CROSS JOIN m WHERE b.rn = 1
    """,
)
def q_ts_best_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best consecutive revenue run (maximum subarray of
    above-average days): the contiguous stretch with the largest
    cumulative excess over the series mean — Kadane's answer computed
    WITHOUT Kadane's sequential recurrence, as prefix-sum minus
    running-minimum-prefix in two window passes (the positive twin of
    q_ts_max_drawdown, which is the same identity with max/min
    swapped). Demeaning by v·n − S keeps every prefix an exact
    integer; the reported excess converts back to revenue units by
    one division.

    Scale: two cumulative windows over the day grain and a top-1 —
    the classic 'sequential algorithm, relational formulation'
    pattern: O(n) work, fully distributable."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    m = d.agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    x = d.crossJoin(F.broadcast(m)).select(
        "day", (F.col("v") * F.col("n") - F.col("s")).alias("dv"), "n"
    )
    w = Window.orderBy("day")
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    p = x.select(
        "day",
        "n",
        F.sum("dv").over(w).alias("pref"),
    ).select(
        "day",
        "n",
        "pref",
        F.coalesce(F.min("pref").over(wprev), F.lit(0)).alias("minpref"),
    )
    best = p.select(
        F.col("day").alias("end_day"),
        "n",
        (F.col("pref") - F.col("minpref")).alias("gain"),
    )
    rn = F.row_number().over(Window.orderBy(F.desc("gain"), "end_day"))
    return (
        best.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "end_day",
            F.col("gain").cast("long").alias("excess_units"),
            F.round(F.col("gain").cast("double") / F.col("n").cast("double"), 6).alias(
                "excess_revenue"
            ),
        )
    )
