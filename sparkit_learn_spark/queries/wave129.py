"""Round-6 wave 129: the Brunner-Munzel test (the
unequal-variance-safe modern replacement for Mann-Whitney, computed
entirely on integerized mid-rank histograms) and classical price
indices (Laspeyres / Paasche / Fisher between eras). Exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_brunner_munzel",
    oracle="""
    WITH x AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v,
               CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS g
        FROM orders WHERE o_orderstatus IN ('F', 'O')),
    h AS (
        SELECT v,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM x GROUP BY v),
    r AS (
        SELECT v, c0, c1,
               2 * COALESCE(SUM(c0 + c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c0 + c1) + 1 AS a2,
               2 * COALESCE(SUM(c0) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c0 + 1 AS w20,
               2 * COALESCE(SUM(c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c1 + 1 AS w21
        FROM h),
    t AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0,
               CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0 * a2) AS BIGINT) AS s0,
               CAST(SUM(c1 * a2) AS BIGINT) AS s1
        FROM r),
    s AS (
        SELECT t.n0, t.n1, t.s0, t.s1,
               SUM(CAST(r.c0 AS DOUBLE)
                   * POW(CAST(t.n0 * (r.a2 - r.w20)
                              - (t.s0 - t.n0 * (t.n0 + 1)) AS DOUBLE), 2))
                   / (4.0 * t.n0 * t.n0 * (t.n0 - 1)) AS var0,
               SUM(CAST(r.c1 AS DOUBLE)
                   * POW(CAST(t.n1 * (r.a2 - r.w21)
                              - (t.s1 - t.n1 * (t.n1 + 1)) AS DOUBLE), 2))
                   / (4.0 * t.n1 * t.n1 * (t.n1 - 1)) AS var1
        FROM r CROSS JOIN t GROUP BY t.n0, t.n1, t.s0, t.s1)
    SELECT n0 AS n_f, n1 AS n_o,
           ROUND((CAST(s1 AS DOUBLE) / (2 * n1)
                  - (CAST(n1 AS DOUBLE) + 1) / 2) / CAST(n0 AS DOUBLE), 6)
               AS p_hat,
           ROUND(CAST(n0 AS DOUBLE) * n1
                 * (CAST(s1 AS DOUBLE) / (2 * n1)
                    - CAST(s0 AS DOUBLE) / (2 * n0))
                 / ((CAST(n0 AS DOUBLE) + n1)
                    * SQRT(n0 * var0 + n1 * var1)), 6) AS bm_w
    FROM s
    """,
)
def q_stat_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel test between finished and open order values:
    the rank test that stays valid when the two groups have DIFFERENT
    variances/shapes (where Mann-Whitney's null silently assumes
    exchangeability), plus the common-language effect p̂ = P(F < O) +
    ½P(=). Every rank quantity — combined mid-ranks, within-group
    mid-ranks, and the rank-variance deviations — is integerized by
    the ×2 / ×2n scaling tricks on the value histogram, so both
    engines derive the W statistic (the scipy `brunnermunzel`
    formula: n₀n₁(R̄₁−R̄₀)/((n₀+n₁)√(n₀S₀²+n₁S₁²))) from exact
    integers.

    Scale: one value-domain histogram, three cumulative windows, one
    fold — the whole modern rank-test family on the same bounded
    machinery."""
    o = load_table(spark, sf_dir, "orders")
    x = o.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.round("o_totalprice").cast("long").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 0).otherwise(1).alias("g"),
    )
    h = x.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "c0",
        "c1",
        (
            2 * F.coalesce(F.sum(F.col("c0") + F.col("c1")).over(w), F.lit(0))
            + (F.col("c0") + F.col("c1"))
            + 1
        ).alias("a2"),
        (2 * F.coalesce(F.sum("c0").over(w), F.lit(0)) + F.col("c0") + 1).alias("w20"),
        (2 * F.coalesce(F.sum("c1").over(w), F.lit(0)) + F.col("c1") + 1).alias("w21"),
    )
    t = r.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("c0") * F.col("a2")).alias("s0"),
        F.sum(F.col("c1") * F.col("a2")).alias("s1"),
    )
    j = r.crossJoin(F.broadcast(t))
    t0 = (
        F.col("n0") * (F.col("a2") - F.col("w20"))
        - (F.col("s0") - F.col("n0") * (F.col("n0") + 1))
    ).cast("double")
    t1 = (
        F.col("n1") * (F.col("a2") - F.col("w21"))
        - (F.col("s1") - F.col("n1") * (F.col("n1") + 1))
    ).cast("double")
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    s = j.groupBy("n0", "n1", "s0", "s1").agg(
        (F.sum(F.col("c0").cast("double") * F.pow(t0, F.lit(2))) / (4.0 * n0d * n0d * (n0d - 1))).alias(
            "var0"
        ),
        (F.sum(F.col("c1").cast("double") * F.pow(t1, F.lit(2))) / (4.0 * n1d * n1d * (n1d - 1))).alias(
            "var1"
        ),
    )
    rbar0 = F.col("s0").cast("double") / (2 * F.col("n0"))
    rbar1 = F.col("s1").cast("double") / (2 * F.col("n1"))
    return s.select(
        F.col("n0").alias("n_f"),
        F.col("n1").alias("n_o"),
        F.round((rbar1 - (n1d + 1) / 2) / n0d, 6).alias("p_hat"),
        F.round(
            n0d * n1d * (rbar1 - rbar0)
            / ((n0d + n1d) * F.sqrt(n0d * F.col("var0") + n1d * F.col("var1"))),
            6,
        ).alias("bm_w"),
    )


@register(
    "q_fin_price_index",
    oracle="""
    WITH era AS (
        SELECT l_partkey AS pk,
               CASE WHEN l_shipdate < DATE '1998-04-01' THEN 0 ELSE 1 END
                   AS era,
               CAST(SUM(l_quantity) AS BIGINT) AS q,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS spend
        FROM lineitem GROUP BY 1, 2),
    p AS (
        SELECT a.pk, a.q AS q1, b.q AS q2,
               CAST(a.spend AS DOUBLE) / CAST(a.q AS DOUBLE) AS p1,
               CAST(b.spend AS DOUBLE) / CAST(b.q AS DOUBLE) AS p2
        FROM era a JOIN era b ON b.pk = a.pk AND a.era = 0 AND b.era = 1),
    ix AS (
        SELECT SUM(p2 * q1) / SUM(p1 * q1) AS laspeyres,
               SUM(p2 * q2) / SUM(p1 * q2) AS paasche,
               CAST(COUNT(*) AS BIGINT) AS n_common_parts
        FROM p)
    SELECT n_common_parts,
           ROUND(laspeyres, 6) AS laspeyres,
           ROUND(paasche, 6) AS paasche,
           ROUND(SQRT(laspeyres * paasche), 6) AS fisher
    FROM ix
    """,
)
def q_fin_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical price indices between eras over the common-part
    basket: Laspeyres (base-period quantities), Paasche (current
    quantities), and their geometric mean Fisher ideal — the CPI
    construction that separates price inflation from basket-mix
    change (revenue/quantity alone confounds them; Laspeyres > 1 with
    Paasche < 1 means buyers substituted away from what got
    expensive). Unit prices derive from exact integer cent spends and
    quantities; only parts traded in BOTH eras enter.

    Scale: one fact pass to (part × era) grain, a part-grain
    self-join, three weighted folds — index numbers at warehouse
    scale for two scans."""
    li = load_table(spark, sf_dir, "lineitem")
    era = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.when(F.col("l_shipdate") < F.lit("1998-04-01").cast("date"), 0)
        .otherwise(1)
        .alias("era"),
    ).agg(
        F.sum("l_quantity").cast("long").alias("q"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("spend"),
    )
    a = era.filter(F.col("era") == 0).select(
        "pk",
        F.col("q").alias("q1"),
        (F.col("spend").cast("double") / F.col("q").cast("double")).alias("p1"),
    )
    b = era.filter(F.col("era") == 1).select(
        F.col("pk").alias("pk2"),
        F.col("q").alias("q2"),
        (F.col("spend").cast("double") / F.col("q").cast("double")).alias("p2"),
    )
    p = a.join(b, F.col("pk2") == F.col("pk"))
    ix = p.agg(
        (F.sum(F.col("p2") * F.col("q1")) / F.sum(F.col("p1") * F.col("q1"))).alias("laspeyres"),
        (F.sum(F.col("p2") * F.col("q2")) / F.sum(F.col("p1") * F.col("q2"))).alias("paasche"),
        F.count(F.lit(1)).alias("n_common_parts"),
    )
    return ix.select(
        "n_common_parts",
        F.round("laspeyres", 6).alias("laspeyres"),
        F.round("paasche", 6).alias("paasche"),
        F.round(F.sqrt(F.col("laspeyres") * F.col("paasche")), 6).alias("fisher"),
    )
