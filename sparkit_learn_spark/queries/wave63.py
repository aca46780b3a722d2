"""Round-6 wave 63: price-point (ending-digit) analysis with a
chi-square uniformity test, and classifier threshold tuning (best-F1
cutoff over the decile sweep). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_fin_price_points",
    oracle="""
    WITH d AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100
            AS cents_ending
        FROM orders),
    b AS (
        SELECT cents_ending // 10 AS dime_bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM b),
    chi AS (
        SELECT CAST(SUM(CAST(ROUND(1e6 * (b.n - t.total / 10.0)
                         * (b.n - t.total / 10.0)
                         / (t.total / 10.0)) AS BIGINT)) AS BIGINT)
            AS chi_u
        FROM b CROSS JOIN tot t)
    SELECT CAST(b.dime_bucket AS BIGINT) AS dime_bucket, b.n,
           ROUND(b.n / CAST(t.total AS DOUBLE), 6) AS share,
           ROUND(c.chi_u / 1e6, 6) AS chi2_vs_uniform
    FROM b CROSS JOIN tot t CROSS JOIN chi c
    """,
)
def q_fin_price_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-point analysis: the distribution of order totals' cents
    endings (bucketed by dime) with a chi-square test against
    uniformity — real pricing shows mass at .99/.95 endings
    (psychological price points), synthetic or machine-generated
    amounts don't; the digit-analysis sibling of the Benford audit
    one decimal place further in. Exact integer counts; chi-square
    terms micro-quantized before the order-free sum.

    Scale: one 10-bucket aggregate with map-side combining — the
    cheapest possible full-table forensic scan."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100).alias(
            "cents_ending"
        )
    )
    b = d.groupBy(F.expr("cents_ending div 10").alias("dime_bucket")).agg(
        F.count("*").alias("n")
    )
    tot = b.agg(F.sum("n").alias("total"))
    e = F.col("total") / 10.0
    chi = (
        b.crossJoin(F.broadcast(tot))
        .select(
            F.round(1e6 * (F.col("n") - e) * (F.col("n") - e) / e)
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").alias("chi_u"))
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("dime_bucket").cast("long").alias("dime_bucket"),
            "n",
            F.round(F.col("n") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
            F.round(F.col("chi_u") / 1e6, 6).alias("chi2_vs_uniform"),
        )
    )


@register(
    "q_ml_threshold_tuning",
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
               SUM(n) OVER (ORDER BY decile) AS cn,
               SUM(pos) OVER (ORDER BY decile) AS cpos,
               SUM(pos) OVER () AS total_pos
        FROM per),
    f1 AS (
        SELECT decile,
               CAST(ROUND(1e6 * 2.0 * cpos
                    / (cn + total_pos)) AS BIGINT) AS f1_u
        FROM cum),
    best AS (
        SELECT decile, f1_u,
               ROW_NUMBER() OVER (ORDER BY f1_u DESC, decile) AS rn
        FROM f1)
    SELECT CAST(f.decile AS BIGINT) AS decile,
           ROUND(f.f1_u / 1e6, 6) AS f1,
           CASE WHEN f.decile = b.decile THEN 1 ELSE 0 END AS is_best
    FROM f1 f CROSS JOIN (SELECT decile FROM best WHERE rn = 1) b
    """,
)
def q_ml_threshold_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier threshold tuning: F1 at every decile cutoff of the
    score sweep (F1 = 2·TP/(pred_pos + actual_pos) — the
    harmonic-mean identity that needs no separate precision/recall
    columns), with the argmax cutoff flagged — the operating-point
    selection step between q_ml_pr_curve's curve and a deployed
    threshold. F1 values micro-quantized before the deterministic
    argmax (decile tie-break).

    Scale: identical shuffle profile to the PR curve — one decile
    banding, decile-grain cumulative windows, 10-row argmax."""
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
    f1 = cum.select(
        "decile",
        F.round(
            1e6 * 2.0 * F.col("cpos") / (F.col("cn") + F.col("total_pos"))
        )
        .cast("long")
        .alias("f1_u"),
    )
    wbest = Window.orderBy(F.col("f1_u").desc(), "decile")
    best = (
        f1.select("decile", F.row_number().over(wbest).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(F.col("decile").alias("best_decile"))
    )
    return f1.crossJoin(F.broadcast(best)).select(
        F.col("decile").cast("long").alias("decile"),
        F.round(F.col("f1_u") / 1e6, 6).alias("f1"),
        F.when(F.col("decile") == F.col("best_decile"), 1)
        .otherwise(0)
        .alias("is_best"),
    )
