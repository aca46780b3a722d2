"""Round-6 wave 120: hash-uniformity audit (exact KS distance of the
portable hash against uniform), novelty-effect detector (weekly
uplift trend between experiment arms), and revenue bus-factor
(minimum customers covering half of revenue). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_dq_hash_uniformity",
    oracle="""
    WITH b AS (
        SELECT ((c_custkey * 2654435761) % 4294967296) % 1000 AS bucket
        FROM customer),
    h AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    gaps AS (
        SELECT ABS(CAST(SUM(c) OVER (ORDER BY bucket) AS DOUBLE)
                   / CAST(n.n AS DOUBLE)
                   - (CAST(bucket AS DOUBLE) + 1) / 1000.0) AS gap,
               n.n AS n
        FROM h CROSS JOIN n),
    k AS (SELECT MAX(gap) AS ks_d, MAX(CAST(n AS BIGINT)) AS n FROM gaps),
    chi AS (
        SELECT SUM(POW(CAST(c AS DOUBLE)
                       - CAST(n.n AS DOUBLE) / 1000.0, 2)
                   / (CAST(n.n AS DOUBLE) / 1000.0)) AS chi2
        FROM h CROSS JOIN n)
    SELECT k.n AS n_keys,
           ROUND(k.ks_d, 6) AS ks_distance,
           ROUND(k.ks_d * SQRT(CAST(k.n AS DOUBLE)), 6) AS ks_scaled,
           ROUND(chi.chi2, 6) AS chi2_vs_uniform
    FROM k CROSS JOIN chi
    """,
)
def q_dq_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-uniformity audit of the engine's portable multiplicative
    hash over 1000 buckets: the exact KS distance of the bucket ECDF
    against uniform (√n-scaled: > ~1.63 rejects at 1%) and the
    chi-square vs equal expected counts — the fairness proof behind
    every hash-based operator in this engine (k-folds, salting,
    watermark green lists, A/B splits all assume it). The ECDF is a
    cumulative integer histogram, so the KS sup-distance is EXACT,
    not a sampled approximation.

    Scale: 1000-bucket histogram + one cumulative window over the
    bucket domain — the audit is free, and portable-hash fairness is
    checked once per engine, not per dataset."""
    c = load_table(spark, sf_dir, "customer")
    b = c.select(F.expr("((c_custkey * 2654435761) % 4294967296) % 1000").alias("bucket"))
    h = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    n = h.agg(F.sum("c").alias("n"))
    hn = h.crossJoin(F.broadcast(n))
    k = hn.select(
        (
            F.abs(
                F.sum("c").over(Window.orderBy("bucket")).cast("double") / F.col("n").cast("double")
                - (F.col("bucket").cast("double") + 1) / 1000.0
            )
        ).alias("gap"),
        "n",
    ).agg(F.max("gap").alias("ks_d"), F.max("n").alias("n"))
    chi = hn.agg(
        F.sum(
            F.pow(F.col("c").cast("double") - F.col("n").cast("double") / 1000.0, F.lit(2))
            / (F.col("n").cast("double") / 1000.0)
        ).alias("chi2")
    )
    return (
        k.crossJoin(F.broadcast(chi))
        .select(
            F.col("n").alias("n_keys"),
            F.round("ks_d", 6).alias("ks_distance"),
            F.round(F.col("ks_d") * F.sqrt(F.col("n").cast("double")), 6).alias("ks_scaled"),
            F.round("chi2", 6).alias("chi2_vs_uniform"),
        )
    )


@register(
    "q_evt_novelty_effect",
    oracle="""
    WITH u AS (
        SELECT user_id,
               ((user_id * 2654435761) % 4294967296) % 2 AS arm,
               CAST(FLOOR(DATEDIFF('day', DATE '2024-01-01',
                                   CAST(ts AS DATE)) / 7) AS BIGINT) AS week,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events),
    g AS (
        SELECT week, arm,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
               CAST(COUNT(DISTINCT CASE WHEN conv = 1 THEN user_id END)
                    AS BIGINT) AS converters
        FROM u GROUP BY week, arm),
    up AS (
        SELECT week,
               MAX(CASE WHEN arm = 1 THEN CAST(converters AS DOUBLE)
                   / CAST(users AS DOUBLE) END)
             - MAX(CASE WHEN arm = 0 THEN CAST(converters AS DOUBLE)
                   / CAST(users AS DOUBLE) END) AS uplift
        FROM g GROUP BY week),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(week) AS sw,
               SUM(uplift) AS su, SUM(week * week) AS sww,
               SUM(week * uplift) AS swu
        FROM up)
    SELECT up.week, ROUND(up.uplift, 6) AS weekly_uplift,
           ROUND((m.swu - m.sw * m.su / m.n)
                 / (m.sww - m.sw * m.sw / m.n), 8) AS uplift_trend_per_week
    FROM up CROSS JOIN m ORDER BY up.week
    """,
)
def q_evt_novelty_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty-effect detector: weekly conversion uplift between the
    two hash arms, with its OLS trend — a significant NEGATIVE trend
    means the treatment effect decays as the novelty wears off, the
    failure mode that makes week-1 A/B readouts overstate long-run
    impact. Weekly rates from exact distinct counts; the trend from
    closed-form moments over the week domain.

    Scale: (week × arm)-grain distinct aggregates then a handful of
    rows — the monitor every long-running experiment should chart."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        F.expr("((user_id * 2654435761) % 4294967296) % 2").alias("arm"),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
        ).cast("long").alias("week"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    g = u.groupBy("week", "arm").agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct(F.when(F.col("conv") == 1, F.col("user_id"))).alias("converters"),
    )
    rate = F.col("converters").cast("double") / F.col("users").cast("double")
    up = g.groupBy("week").agg(
        (
            F.max(F.when(F.col("arm") == 1, rate)) - F.max(F.when(F.col("arm") == 0, rate))
        ).alias("uplift")
    )
    m = up.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("week").cast("double").alias("sw"),
        F.sum("uplift").alias("su"),
        F.sum(F.col("week") * F.col("week")).cast("double").alias("sww"),
        F.sum(F.col("week") * F.col("uplift")).alias("swu"),
    )
    return (
        up.crossJoin(F.broadcast(m))
        .select(
            "week",
            F.round("uplift", 6).alias("weekly_uplift"),
            F.round(
                (F.col("swu") - F.col("sw") * F.col("su") / F.col("n"))
                / (F.col("sww") - F.col("sw") * F.col("sw") / F.col("n")),
                8,
            ).alias("uplift_trend_per_week"),
        )
        .orderBy("week")
    )


@register(
    "q_fin_bus_factor",
    oracle="""
    WITH c AS (
        SELECT o_custkey, SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS rev
        FROM orders GROUP BY 1),
    t AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_cust FROM c),
    r AS (
        SELECT rev,
               SUM(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum,
               ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rk
        FROM c),
    bf AS (
        SELECT MIN(rk) AS k50 FROM r CROSS JOIN t
        WHERE 2 * cum >= t.tot),
    top10 AS (
        SELECT CAST(SUM(rev) AS BIGINT) AS rev10 FROM r WHERE rk <= 10)
    SELECT t.n_cust,
           CAST(bf.k50 AS BIGINT) AS bus_factor_50pct,
           ROUND(CAST(bf.k50 AS DOUBLE) / CAST(t.n_cust AS DOUBLE), 6)
               AS bus_factor_share,
           ROUND(CAST(top10.rev10 AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
               AS top10_revenue_share
    FROM t CROSS JOIN bf CROSS JOIN top10
    """,
)
def q_fin_bus_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bus-factor: the MINIMUM number of customers whose
    combined revenue reaches 50% of the total (ties broken by key for
    determinism), plus the top-10 concentration — the single-number
    dependency risk a Gini/Pareto share doesn't give you ("we lose
    half our revenue if THESE k accounts churn"). The crossing uses
    2·cum ≥ total in exact integers — no percentage rounding can
    move it.

    Scale: customer-grain aggregate, one descending cumulative
    window, one crossing — identical machinery to every exact
    quantile in the engine, pointed at concentration risk."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.sum(F.round("o_totalprice").cast("long")).alias("rev"))
    t = c.agg(F.sum("rev").alias("tot"), F.count(F.lit(1)).alias("n_cust"))
    w = Window.orderBy(F.desc("rev"), "o_custkey")
    r = c.select(
        "rev",
        F.sum("rev").over(w).alias("cum"),
        F.row_number().over(w).alias("rk"),
    )
    bf = (
        r.crossJoin(F.broadcast(t))
        .filter(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("rk").alias("k50"))
    )
    top10 = r.filter(F.col("rk") <= 10).agg(F.sum("rev").alias("rev10"))
    return (
        t.crossJoin(F.broadcast(bf))
        .crossJoin(F.broadcast(top10))
        .select(
            "n_cust",
            F.col("k50").cast("long").alias("bus_factor_50pct"),
            F.round(F.col("k50").cast("double") / F.col("n_cust").cast("double"), 6).alias(
                "bus_factor_share"
            ),
            F.round(F.col("rev10").cast("double") / F.col("tot").cast("double"), 6).alias(
                "top10_revenue_share"
            ),
        )
    )
