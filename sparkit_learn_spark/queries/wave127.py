"""Round-6 wave 127: two-sample Hodges-Lehmann shift estimate
(median of pairwise day-revenue differences between eras),
round-number bias screen (value-fabrication complement to Benford),
and the cost-optimal threshold search (cumulative-histogram sweep
under an asymmetric cost matrix). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_hl_shift",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               CASE WHEN o_orderdate < DATE '1998-04-01' THEN 0 ELSE 1 END
                   AS era,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1, 2),
    p AS (
        SELECT b.v - a.v AS diff
        FROM d a JOIN d b ON a.era = 0 AND b.era = 1),
    h AS (SELECT diff, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY diff),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    med AS (
        SELECT MIN(diff) AS hl
        FROM (SELECT diff, SUM(c) OVER (ORDER BY diff) AS cc FROM h)
             CROSS JOIN n
        WHERE cc >= (n.n + 1) // 2)
    SELECT n.n AS n_pairs,
           CAST(med.hl AS BIGINT) AS hl_shift,
           ROUND(CAST(med.hl AS DOUBLE)
                 / (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*)
                    FROM d WHERE era = 0), 6) AS relative_shift
    FROM n CROSS JOIN med
    """,
)
def q_stat_hl_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hodges-Lehmann shift estimate: the median of ALL
    pairwise differences between era-2 and era-1 daily revenues —
    the robust "how much did the level move?" estimator associated
    with the Mann-Whitney test (a mean difference answers the same
    question but one spike day drags it; the HL shift doesn't).
    Pairwise differences are exact integers; the median is the
    histogram cumulative-crossing order statistic.

    Scale: both sides collapse to day grain first, so the pairwise
    set is days₁×days₂ — dimension-sized, the standard pairwise-
    estimator contract (Theil-Sen, Hodges-Lehmann one-sample)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.col("o_orderdate").alias("day"),
        F.when(F.col("o_orderdate") < F.lit("1998-04-01").cast("date"), 0)
        .otherwise(1)
        .alias("era"),
    ).agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
    a = d.filter(F.col("era") == 0).select(F.col("v").alias("va"))
    b = d.filter(F.col("era") == 1).select(F.col("v").alias("vb"))
    p = a.crossJoin(b).select((F.col("vb") - F.col("va")).alias("diff"))
    h = p.groupBy("diff").agg(F.count(F.lit(1)).alias("c"))
    n = h.agg(F.sum("c").alias("n"))
    cum = h.select("diff", F.sum("c").over(Window.orderBy("diff")).alias("cc"))
    med = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .agg(F.min("diff").alias("hl"))
    )
    base = d.filter(F.col("era") == 0).agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean0")
    )
    return (
        n.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("n").alias("n_pairs"),
            F.col("hl").cast("long").alias("hl_shift"),
            F.round(F.col("hl").cast("double") / F.col("mean0"), 6).alias("relative_shift"),
        )
    )


@register(
    "q_dq_round_number_bias",
    oracle="""
    WITH x AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS whole_dollar,
               CAST(SUM(CASE WHEN cents % 10000 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS whole_hundred,
               CAST(SUM(CASE WHEN cents % 100 IN (99, 95) THEN 1 ELSE 0 END)
                    AS BIGINT) AS charm_prices
        FROM x)
    SELECT n AS n_orders, whole_dollar, whole_hundred, charm_prices,
           ROUND(CAST(whole_dollar AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS whole_dollar_share,
           ROUND(CAST(whole_dollar AS DOUBLE) / CAST(n AS DOUBLE) / 0.01,
                 6) AS whole_dollar_lift_vs_uniform
    FROM c
    """,
)
def q_dq_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias screen: the share of order totals landing on
    whole dollars, whole hundreds, and charm endings (.99/.95),
    against the 1% a uniform cent distribution predicts — manual
    entries and fabricated figures cluster on round numbers even when
    their leading digits pass Benford (q_dq_benford's complement at
    the OTHER end of the number). Exact integer cent classes.

    Scale: one conditional-count pass, constant output."""
    o = load_table(spark, sf_dir, "orders")
    x = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    c = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("cents") % 100 == 0, 1).otherwise(0)).alias("whole_dollar"),
        F.sum(F.when(F.col("cents") % 10000 == 0, 1).otherwise(0)).alias("whole_hundred"),
        F.sum(F.when((F.col("cents") % 100).isin(99, 95), 1).otherwise(0)).alias(
            "charm_prices"
        ),
    )
    share = F.col("whole_dollar").cast("double") / F.col("n").cast("double")
    return c.select(
        F.col("n").alias("n_orders"),
        "whole_dollar",
        "whole_hundred",
        "charm_prices",
        F.round(share, 6).alias("whole_dollar_share"),
        F.round(share / 0.01, 6).alias("whole_dollar_lift_vs_uniform"),
    )


@register(
    "q_ml_cost_optimal_threshold",
    oracle="""
    WITH h AS (
        SELECT CAST(n_chars AS BIGINT) AS s,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS pos,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS neg
        FROM documents GROUP BY 1),
    t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p,
                 CAST(SUM(neg) AS BIGINT) AS q FROM h),
    cum AS (
        SELECT s,
               COALESCE(SUM(pos) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS fn_at_t,
               COALESCE(SUM(neg) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS tn_at_t
        FROM h),
    cost AS (
        SELECT cum.s AS threshold,
               1 * (t.q - cum.tn_at_t) + 5 * cum.fn_at_t AS total_cost,
               ROW_NUMBER() OVER (
                   ORDER BY 1 * (t.q - cum.tn_at_t) + 5 * cum.fn_at_t,
                            cum.s) AS rn
        FROM cum CROSS JOIN t)
    SELECT CAST(cost.threshold AS BIGINT) AS optimal_threshold,
           CAST(cost.total_cost AS BIGINT) AS total_cost,
           ROUND(CAST(cost.total_cost AS DOUBLE)
                 / CAST(t.p + t.q AS DOUBLE), 6) AS cost_per_doc
    FROM cost CROSS JOIN t WHERE cost.rn = 1
    """,
)
def q_ml_cost_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-optimal threshold search: sweep EVERY candidate length
    threshold (predict English when n_chars ≥ t) and pick the one
    minimizing total cost under FP=1 / FN=5 — the cumulative-
    histogram sweep evaluates ALL thresholds in one window pass
    (FN(t) and TN(t) are prefix sums), so the search is exact rather
    than grid-sampled; q_ml_expected_cost grades the fixed 300-char
    rule, this finds what the threshold SHOULD be. Exact integer
    costs with deterministic tie-break to the smaller threshold.

    Scale: score-domain histogram + one cumulative window + top-1 —
    threshold optimization at the cost of one aggregate, the
    histogram-sweep pattern shared with the decision stump."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy(F.col("n_chars").cast("long").alias("s")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("neg"),
    )
    t = h.agg(F.sum("pos").alias("p"), F.sum("neg").alias("q"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "s",
        F.coalesce(F.sum("pos").over(w), F.lit(0)).alias("fn_at_t"),
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("tn_at_t"),
    )
    cost = cum.crossJoin(F.broadcast(t)).select(
        F.col("s").alias("threshold"),
        (1 * (F.col("q") - F.col("tn_at_t")) + 5 * F.col("fn_at_t")).alias("total_cost"),
        (F.col("p") + F.col("q")).alias("n"),
    )
    rn = F.row_number().over(Window.orderBy("total_cost", "threshold"))
    return (
        cost.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            F.col("threshold").cast("long").alias("optimal_threshold"),
            F.col("total_cost").cast("long").alias("total_cost"),
            F.round(F.col("total_cost").cast("double") / F.col("n").cast("double"), 6).alias(
                "cost_per_doc"
            ),
        )
    )
