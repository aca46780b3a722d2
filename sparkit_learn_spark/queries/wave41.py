"""Round-6 wave 41: distribution shape (skewness/kurtosis from exact
power sums), customer reactivation (win-back) analysis, and a
precision-recall curve at decile score cutoffs. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_skew_kurtosis",
    oracle="""
    WITH m AS (
        SELECT l_returnflag AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
        FROM lineitem GROUP BY 1),
    c AS (
        SELECT grp, n, s1 / n AS mu,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3 * (s1 / n) * (s2 / n)
                 + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4 * (s1 / n) * (s3 / n)
                 + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                 - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM m)
    SELECT grp, n, ROUND(mu, 6) AS mean_qty,
           ROUND(m3 / POWER(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM c
    """,
)
def q_stat_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shape per return flag: population skewness and
    excess kurtosis of order quantity, computed from EXACT integer
    power sums Σx…Σx⁴ (quantity ≤ 50 keeps x⁴ sums far inside
    BIGINT) expanded to central moments in one final double step —
    the engine-portable alternative to built-in skewness()/kurtosis()
    aggregates, whose sample-vs-population conventions differ across
    engines. The tail-shape screen that decides whether mean-based
    monitoring is even meaningful.

    Scale: one map-side-combining aggregate carrying four power sums
    — COUNT(*)-shaped shuffle; nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
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
    return m.select(
        "grp",
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


@register(
    "q_evt_reactivation",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate,
               date_trunc('month', o_orderdate) AS m,
               date_diff('day',
                         LAG(o_orderdate) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders)
    SELECT m AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reactivated,
           ROUND(SUM(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS reactivation_rate
    FROM o GROUP BY m
    """,
)
def q_evt_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reactivation (win-back) analysis: per month, how many orders
    came from customers returning after a >180-day silence — the
    resurrection segment that acquisition/retention splits
    (q_fin_new_vs_returning) lump into 'returning', yet which
    win-back campaigns are judged by. Per-customer LAG with a
    deterministic (date, key) order; exact integer day gaps.

    Scale: one keyed window at customer grain (the same shuffle a
    sessionizer pays) then a month-grain rollup — no self-join of
    the order history against itself."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t = o.select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )
    react = F.when(F.col("gap_days") > 180, 1).otherwise(0)
    return t.groupBy("month").agg(
        F.count("*").alias("n_orders"),
        F.sum(react).alias("n_reactivated"),
        F.round(F.sum(react) / F.count("*").cast("double"), 6).alias(
            "reactivation_rate"
        ),
    )


@register(
    "q_ml_pr_curve",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS y,
               NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS decile
        FROM orders),
    per AS (
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY decile),
    cum AS (
        SELECT decile,
               SUM(n) OVER (ORDER BY decile
                            ROWS UNBOUNDED PRECEDING) AS cn,
               SUM(pos) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING) AS cpos,
               SUM(pos) OVER () AS total_pos
        FROM per)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(cn AS BIGINT) AS n_predicted_pos,
           CAST(cpos AS BIGINT) AS true_pos,
           ROUND(cpos / CAST(cn AS DOUBLE), 6) AS precision,
           ROUND(cpos / CAST(total_pos AS DOUBLE), 6) AS recall
    FROM cum
    """,
)
def q_ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve at decile score cutoffs: orders scored
    by total price (deterministic decile banding, key tie-break)
    against the URGENT-priority label — at each 'predict positive
    above this decile' threshold, cumulative precision and recall.
    The imbalance-robust companion to ROC (q_ml_roc_auc): with rare
    positives, precision collapses where ROC still looks healthy.
    Exact integer counts until the two final ratios per row.

    Scale: banding at fact grain is the only global rank — replace
    with histogram banding at 100 TB as elsewhere; everything after
    runs at decile grain (10 rows) under trivial windows."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
        F.ntile(10)
        .over(Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey"))
        .alias("decile"),
    )
    per = scored.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    cum = per.select(
        "decile",
        F.sum("n").over(wc).alias("cn"),
        F.sum("pos").over(wc).alias("cpos"),
        F.sum("pos").over(wa).alias("total_pos"),
    )
    return cum.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("cn").cast("long").alias("n_predicted_pos"),
        F.col("cpos").cast("long").alias("true_pos"),
        F.round(F.col("cpos") / F.col("cn").cast("double"), 6).alias(
            "precision"
        ),
        F.round(
            F.col("cpos") / F.col("total_pos").cast("double"), 6
        ).alias("recall"),
    )
