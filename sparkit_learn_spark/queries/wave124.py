"""Round-6 wave 124: unit-price dispersion (same part, different
realized price), single-source supply risk (parts shipped by one
supplier / one nation), and pinball-loss evaluation of quantile
predictors. All exactly DuckDB-oracled; the first two exercise the
procurement axis from observed shipments (this fixture has no
partsupp table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_fin_price_dispersion",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey,
               CAST(ROUND(l_extendedprice * 100 / l_quantity) AS BIGINT)
                   AS cost
        FROM lineitem),
    g AS (
        SELECT ps_partkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               SUM(cost) AS s,
               SUM(CAST(cost * cost AS DECIMAL(38, 0))) AS q
        FROM ps GROUP BY ps_partkey HAVING COUNT(*) >= 2),
    cv AS (
        SELECT ps_partkey, n_suppliers,
               SQRT((CAST(n_suppliers AS DOUBLE) * CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / (CAST(n_suppliers AS DOUBLE)
                       * (CAST(n_suppliers AS DOUBLE) - 1)))
               / (CAST(s AS DOUBLE) / CAST(n_suppliers AS DOUBLE)) AS cv
        FROM g),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(AVG(cv), 6) AS mean_cv,
               CAST(SUM(CASE WHEN cv > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_dispersion_parts
        FROM cv),
    top AS (
        SELECT ps_partkey, n_suppliers, cv,
               ROW_NUMBER() OVER (ORDER BY cv DESC, ps_partkey) AS rn
        FROM cv)
    SELECT top.ps_partkey AS worst_part, top.n_suppliers,
           ROUND(top.cv, 6) AS worst_cv,
           agg.n_parts, agg.mean_cv, agg.high_dispersion_parts
    FROM top CROSS JOIN agg WHERE top.rn = 1
    """,
)
def q_fin_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price dispersion: per part sold ≥2 times, the
    coefficient of variation of the OBSERVED unit price
    (extendedprice/quantity cents) across its line items — high CV
    means the same part transacts at wildly different prices (the
    law-of-one-price audit on realized sales). Reports the corpus
    mean CV, the count of parts breaching 20%, and the single worst
    part. Unit prices quantize to integer cents identically in both
    engines before the exact moment sums.

    Scale: one lineitem pass to part-grain moments (map-side
    combine), constant-size rollup + top-1."""
    ps = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"))
        .cast("long")
        .alias("cost"),
    )
    g = (
        ps.groupBy("ps_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("cost").alias("s"),
            F.sum((F.col("cost") * F.col("cost")).cast("decimal(38,0)")).alias("q"),
        )
        .filter(F.col("n_suppliers") >= 2)
    )
    nd = F.col("n_suppliers").cast("double")
    cv = g.select(
        "ps_partkey",
        "n_suppliers",
        (
            F.sqrt(
                (nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
                / (nd * (nd - 1))
            )
            / (F.col("s").cast("double") / nd)
        ).alias("cv"),
    )
    agg = cv.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("cv"), 6).alias("mean_cv"),
        F.sum(F.when(F.col("cv") > 0.2, 1).otherwise(0)).alias("high_dispersion_parts"),
    )
    top = cv.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("cv"), "ps_partkey"))
    ).filter(F.col("rn") == 1)
    return (
        top.crossJoin(F.broadcast(agg))
        .select(
            F.col("ps_partkey").alias("worst_part"),
            "n_suppliers",
            F.round("cv", 6).alias("worst_cv"),
            "n_parts",
            "mean_cv",
            "high_dispersion_parts",
        )
    )


@register(
    "q_fin_single_source_risk",
    oracle="""
    WITH j AS (
        SELECT l.l_partkey AS ps_partkey,
               s.s_suppkey, s.s_nationkey
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey),
    g AS (
        SELECT ps_partkey,
               CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
               CAST(COUNT(DISTINCT s_nationkey) AS BIGINT) AS n_nations
        FROM j GROUP BY ps_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS single_supplier_parts,
           CAST(SUM(CASE WHEN n_nations = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS single_nation_parts,
           ROUND(CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS single_supplier_share,
           ROUND(AVG(CAST(n_suppliers AS DOUBLE)), 6) AS mean_suppliers
    FROM g
    """,
)
def q_fin_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk from OBSERVED shipments: parts whose
    entire shipped volume came from one supplier, and parts whose
    supplier base sits in ONE nation — the two classic supply-chain
    fragility screens (a part can have five suppliers and still be
    one embargo from stock-out). Distinct counts per part are exact;
    the supplier dimension broadcasts.

    Scale: one lineitem-supplier join (dimension broadcast), part-
    grain distinct counts, constant rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    j = li.join(
        F.broadcast(s.select("s_suppkey", "s_nationkey")),
        li["l_suppkey"] == s["s_suppkey"],
    ).select(F.col("l_partkey").alias("ps_partkey"), "s_suppkey", "s_nationkey")
    g = j.groupBy("ps_partkey").agg(
        F.countDistinct("s_suppkey").alias("n_suppliers"),
        F.countDistinct("s_nationkey").alias("n_nations"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(F.col("n_suppliers") == 1, 1).otherwise(0)).alias(
            "single_supplier_parts"
        ),
        F.sum(F.when(F.col("n_nations") == 1, 1).otherwise(0)).alias(
            "single_nation_parts"
        ),
        F.round(
            F.sum(F.when(F.col("n_suppliers") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("single_supplier_share"),
        F.round(F.avg(F.col("n_suppliers").cast("double")), 6).alias("mean_suppliers"),
    )


@register(
    "q_ml_pinball_loss",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY v),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM h),
    q50 AS (SELECT MIN(v) AS p FROM cum CROSS JOIN n
            WHERE cc >= (n.n + 1) // 2),
    q90 AS (SELECT MIN(v) AS p FROM cum CROSS JOIN n
            WHERE cc >= (n.n * 9 + 9) // 10),
    loss AS (
        SELECT
          SUM(CASE WHEN d.v >= q50.p THEN 5 * (d.v - q50.p)
                   ELSE 5 * (q50.p - d.v) END) AS l50x10,
          SUM(CASE WHEN d.v >= q90.p THEN 9 * (d.v - q90.p)
                   ELSE 1 * (q90.p - d.v) END) AS l90x10,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM d CROSS JOIN q50 CROSS JOIN q90)
    SELECT loss.n AS n_days,
           CAST(q50.p AS BIGINT) AS p50_predictor,
           CAST(q90.p AS BIGINT) AS p90_predictor,
           ROUND(CAST(loss.l50x10 AS DOUBLE) / 10
                 / CAST(loss.n AS DOUBLE), 6) AS pinball_p50,
           ROUND(CAST(loss.l90x10 AS DOUBLE) / 10
                 / CAST(loss.n AS DOUBLE), 6) AS pinball_p90
    FROM loss CROSS JOIN q50 CROSS JOIN q90
    """,
)
def q_ml_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the constant P50 and P90 predictors
    on daily revenue: L_q(y, ŷ) = q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺ — the
    proper scoring rule for quantile forecasts (capacity planning
    lives on P90s; RMSE cannot grade a P90). Predictors are the exact
    in-sample order statistics; losses accumulate as exact integers
    scaled ×10 (q = 0.5, 0.9 → weights 5/5 and 9/1) and divide once.

    Scale: histogram order statistics + one broadcast pass — the
    baseline every learned quantile forecaster must beat, measured
    with its own metric."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    h = d.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    n = h.agg(F.sum("c").alias("n"))
    cum = h.select("v", F.sum("c").over(Window.orderBy("v")).alias("cc"))
    q50 = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .agg(F.min("v").alias("p50"))
    )
    q90 = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cc") >= F.expr("(n * 9 + 9) div 10"))
        .agg(F.min("v").alias("p90"))
    )
    loss = (
        d.crossJoin(F.broadcast(q50))
        .crossJoin(F.broadcast(q90))
        .agg(
            F.sum(
                F.when(F.col("v") >= F.col("p50"), 5 * (F.col("v") - F.col("p50"))).otherwise(
                    5 * (F.col("p50") - F.col("v"))
                )
            ).alias("l50x10"),
            F.sum(
                F.when(F.col("v") >= F.col("p90"), 9 * (F.col("v") - F.col("p90"))).otherwise(
                    F.col("p90") - F.col("v")
                )
            ).alias("l90x10"),
            F.count(F.lit(1)).alias("n"),
            F.max("p50").alias("p50"),
            F.max("p90").alias("p90"),
        )
    )
    return loss.select(
        F.col("n").alias("n_days"),
        F.col("p50").cast("long").alias("p50_predictor"),
        F.col("p90").cast("long").alias("p90_predictor"),
        F.round(F.col("l50x10").cast("double") / 10 / F.col("n").cast("double"), 6).alias(
            "pinball_p50"
        ),
        F.round(F.col("l90x10").cast("double") / 10 / F.col("n").cast("double"), 6).alias(
            "pinball_p90"
        ),
    )
