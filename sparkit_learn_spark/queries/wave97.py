"""Round-6 wave 97: Bland-Altman agreement analysis (stated order
total vs line-item recomputation), time-to-second-purchase
distribution (the repeat-conversion latency), and a log-linear
exponential growth fit for daily revenue. Exactly DuckDB-oracled;
Bland-Altman and the latency distribution are exact-integer, the
log-linear fit documents the 6dp float-sum contract (day-grain ln
terms, same contract as q_agg_entropy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_bland_altman",
    oracle="""
    WITH r AS (
        SELECT l_orderkey AS k,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax) * 100) AS BIGINT)) AS recomputed
        FROM lineitem GROUP BY 1),
    d AS (
        SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) - r.recomputed
                   AS diff
        FROM orders o JOIN r ON r.k = o.o_orderkey),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(diff) AS s,
               SUM(CAST(diff * diff AS DECIMAL(38, 0))) AS q
        FROM d),
    b AS (
        SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
               SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sd
        FROM m),
    oob AS (
        SELECT CAST(SUM(CASE WHEN CAST(d.diff AS DOUBLE) < b.bias - 1.96 * b.sd
                             OR CAST(d.diff AS DOUBLE) > b.bias + 1.96 * b.sd
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
        FROM d CROSS JOIN b)
    SELECT b.n AS n_orders,
           ROUND(b.bias / 100.0, 6) AS bias_dollars,
           ROUND((b.bias - 1.96 * b.sd) / 100.0, 6) AS loa_low,
           ROUND((b.bias + 1.96 * b.sd) / 100.0, 6) AS loa_high,
           oob.n_outside,
           ROUND(CAST(oob.n_outside AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
               AS share_outside
    FROM b CROSS JOIN oob
    """,
)
def q_stat_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman agreement analysis between each order's stated
    total and its line-item recomputation (per-line cent rounding):
    the bias (mean difference), the 95% limits of agreement
    (bias ± 1.96·sd), and how many orders fall outside them — the
    method-comparison statistic that answers "do these two measures
    agree well enough to be interchangeable?", where a correlation
    would be misleadingly high. Differences are exact integer cents;
    bias/LoA derive from exact moments; the outside-count compares
    integers to the same two doubles in both engines.

    Scale: one line-grain aggregate (map-side combine on orderkey),
    one order-grain join, one moment fold, then a second bounded pass
    with two broadcast scalars — no sort, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    r = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
            ).cast("long")
        ).alias("recomputed")
    )
    d = (
        o.join(r, o["o_orderkey"] == r["k"])
        .select(
            (F.round(F.col("o_totalprice") * 100).cast("long") - F.col("recomputed")).alias("diff")
        )
        .persist()
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("diff").alias("s"),
        F.sum((F.col("diff") * F.col("diff")).cast("decimal(38,0)")).alias("q"),
    )
    nd = F.col("n").cast("double")
    b = m.select(
        "n",
        (F.col("s").cast("double") / nd).alias("bias"),
        F.sqrt(
            (nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
            / (nd * (nd - 1))
        ).alias("sd"),
    )
    oob = (
        d.crossJoin(F.broadcast(b))
        .agg(
            F.sum(
                F.when(
                    (F.col("diff").cast("double") < F.col("bias") - 1.96 * F.col("sd"))
                    | (F.col("diff").cast("double") > F.col("bias") + 1.96 * F.col("sd")),
                    1,
                ).otherwise(0)
            ).alias("n_outside")
        )
    )
    return (
        b.crossJoin(F.broadcast(oob))
        .select(
            F.col("n").alias("n_orders"),
            F.round(F.col("bias") / 100.0, 6).alias("bias_dollars"),
            F.round((F.col("bias") - 1.96 * F.col("sd")) / 100.0, 6).alias("loa_low"),
            F.round((F.col("bias") + 1.96 * F.col("sd")) / 100.0, 6).alias("loa_high"),
            "n_outside",
            F.round(F.col("n_outside").cast("double") / F.col("n").cast("double"), 6).alias(
                "share_outside"
            ),
        )
    )


@register(
    "q_evt_time_to_second",
    oracle="""
    WITH p AS (
        SELECT user_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'),
    gap AS (
        SELECT a.user_id,
               CAST(FLOOR((EPOCH(b.ts) - EPOCH(a.ts)) / 3600) AS BIGINT)
                   AS hours
        FROM p a JOIN p b ON b.user_id = a.user_id AND b.rn = 2
        WHERE a.rn = 1),
    n1 AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS buyers
           FROM events WHERE event_type = 'purchase'),
    h AS (SELECT hours, CAST(COUNT(*) AS BIGINT) AS c FROM gap GROUP BY 1),
    n2 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    cum AS (SELECT hours, SUM(c) OVER (ORDER BY hours) AS cc FROM h),
    med AS (SELECT MIN(hours) AS v FROM cum CROSS JOIN n2
            WHERE cc >= (n2.n + 1) // 2),
    p90 AS (SELECT MIN(hours) AS v FROM cum CROSS JOIN n2
            WHERE cc >= (n2.n * 9 + 9) // 10)
    SELECT n1.buyers, n2.n AS repeat_buyers,
           ROUND(CAST(n2.n AS DOUBLE) / CAST(n1.buyers AS DOUBLE), 6)
               AS repeat_share,
           med.v AS median_hours, p90.v AS p90_hours
    FROM n1 CROSS JOIN n2 CROSS JOIN med CROSS JOIN p90
    """,
)
def q_evt_time_to_second(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-second-purchase: for every user with ≥2 purchases, the
    hours between their first and second — summarized as the repeat
    share and the exact median / p90 latency (histogram
    cumulative-crossing order statistics on integer hours). The
    repeat-conversion metric subscription and marketplace teams
    steer by: q_evt_conversion_latency measures first conversion,
    this measures the habit-forming one.

    Scale: per-user rank over bounded purchase partitions, a rn=1 ×
    rn=2 self-join at user grain, then an hour-domain histogram — no
    global sort; the order statistics come from the cumulative
    histogram like every exact quantile in this engine."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.filter(F.col("event_type") == "purchase")
    p = pu.select(
        "user_id",
        "ts",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    a = p.filter(F.col("rn") == 1).select(F.col("user_id").alias("ua"), F.col("ts").alias("t1"))
    bb = p.filter(F.col("rn") == 2).select(F.col("user_id").alias("ub"), F.col("ts").alias("t2"))
    gap = a.join(bb, F.col("ua") == F.col("ub")).select(
        F.floor((F.unix_timestamp("t2") - F.unix_timestamp("t1")) / 3600)
        .cast("long")
        .alias("hours")
    )
    n1 = pu.agg(F.countDistinct("user_id").alias("buyers"))
    h = gap.groupBy("hours").agg(F.count(F.lit(1)).alias("c"))
    n2 = h.agg(F.sum("c").alias("n"))
    cum = h.select("hours", F.sum("c").over(Window.orderBy("hours")).alias("cc"))
    med = (
        cum.crossJoin(F.broadcast(n2))
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .agg(F.min("hours").alias("median_hours"))
    )
    p90 = (
        cum.crossJoin(F.broadcast(n2))
        .filter(F.col("cc") >= F.expr("(n * 9 + 9) div 10"))
        .agg(F.min("hours").alias("p90_hours"))
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(p90))
        .select(
            "buyers",
            F.col("n").alias("repeat_buyers"),
            F.round(F.col("n").cast("double") / F.col("buyers").cast("double"), 6).alias(
                "repeat_share"
            ),
            "median_hours",
            "p90_hours",
        )
    )


@register(
    "q_ts_loglinear_growth",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    t AS (
        SELECT LN(CAST(v AS DOUBLE)) AS y,
               CAST(DATEDIFF('day', MIN(day) OVER (), day) AS DOUBLE) AS t
        FROM d),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(t) AS st, SUM(y) AS sy,
               SUM(t * t) AS stt, SUM(t * y) AS sty, SUM(y * y) AS syy
        FROM t),
    b AS (
        SELECT n,
               (sty - st * sy / n) / (stt - st * st / n) AS slope,
               (syy - sy * sy / n) AS ayy,
               (sty - st * sy / n) AS aty,
               (stt - st * st / n) AS att
        FROM m)
    SELECT n AS n_days,
           ROUND(slope * 100, 6) AS growth_pct_per_day,
           ROUND(0.6931471805599453 / slope, 2) AS doubling_days,
           ROUND(aty * aty / (att * ayy), 6) AS r2
    FROM b
    """,
)
def q_ts_loglinear_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-linear exponential growth fit: regress ln(daily revenue)
    on time — the slope IS the continuously-compounded daily growth
    rate, with the implied doubling time and R². The standard way to
    ask "is this series growing exponentially, and how fast?" without
    eyeballing. Float-sum contract: moments of ln-values accumulate
    as doubles over the ~2.4k-day grain (error « 6dp tolerance —
    the documented q_agg_entropy contract); doubling time rounds to
    2dp because it is the RECIPROCAL of a near-zero slope, which
    amplifies last-bit noise past 6dp.

    Scale: one fact pass to day grain, five sums, constant-time
    solve — the cheapest possible trend diagnostic."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    t = d.select(
        F.log(F.col("v").cast("double")).alias("y"),
        F.datediff("day", F.min("day").over(Window.partitionBy())).cast("double").alias("t"),
    )
    m = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    slope = (F.col("sty") - F.col("st") * F.col("sy") / nd) / (
        F.col("stt") - F.col("st") * F.col("st") / nd
    )
    b = m.select(
        "n",
        slope.alias("slope"),
        (F.col("syy") - F.col("sy") * F.col("sy") / nd).alias("ayy"),
        (F.col("sty") - F.col("st") * F.col("sy") / nd).alias("aty"),
        (F.col("stt") - F.col("st") * F.col("st") / nd).alias("att"),
    )
    return b.select(
        F.col("n").alias("n_days"),
        F.round(F.col("slope") * 100, 6).alias("growth_pct_per_day"),
        F.round(F.lit(0.6931471805599453) / F.col("slope"), 2).alias("doubling_days"),
        F.round(F.col("aty") * F.col("aty") / (F.col("att") * F.col("ayy")), 6).alias("r2"),
    )
