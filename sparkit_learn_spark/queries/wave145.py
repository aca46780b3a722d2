"""Round-8 wave 145: the effect sizes the stat battery reports its
tests WITHOUT — Cohen's d (standardized mean difference) and Cliff's
delta (the nonparametric dominance probability, exact from integer
pair counts). Every q_stat_* significance test answers 'is there an
effect?'; these answer 'how big?' — the number a decision actually
turns on. Both exactly DuckDB-oracled: d from integer sufficient
statistics, delta from an integer value-histogram dominance count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: the two arms: urgent-ish vs relaxed order priorities.
_ARM = "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"


@register(
    "q_stat_cohens_d",
    oracle=f"""
    WITH t AS (
        SELECT {_ARM} AS arm,
               CAST(ROUND(o_totalprice) AS BIGINT) AS x
        FROM orders),
    s AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM t GROUP BY arm),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 1 THEN n END) AS n1,
            MAX(CASE WHEN arm = 0 THEN n END) AS n0,
            MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
            MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
            MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1,
            MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0
        FROM s),
    calc AS (
        SELECT n1, n0,
               CAST(sx1 AS DOUBLE) / n1 AS m1,
               CAST(sx0 AS DOUBLE) / n0 AS m0,
               (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n1)
                   AS ss1,
               (CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * sx0 / n0)
                   AS ss0
        FROM wide)
    SELECT n1 AS n_treat, n0 AS n_control,
           ROUND(m1 - m0, 6) AS mean_diff,
           ROUND(SQRT((ss1 + ss0) / (n1 + n0 - 2)), 6) AS pooled_sd,
           ROUND((m1 - m0) / SQRT((ss1 + ss0) / (n1 + n0 - 2)), 6)
               AS cohens_d
    FROM calc
    """,
)
def q_stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d: the standardized mean difference in order value
    between urgent and relaxed priorities — the effect size every
    t-test result should ship with (q_stat_welch_ttest says whether
    the gap is distinguishable from noise; d says whether anyone
    should care). Means and pooled variance come from integer
    (n, Σx, Σx²) in whole dollars (cents² would overflow BIGINT past
    sf0.1), so the only float steps are the final
    divisions — 6dp-rounded, hash-exact.

    Scale: one map-side-combinable pass to 2 rows."""
    t = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0).alias("arm"),
        F.round("o_totalprice").cast("long").alias("x"),
    )
    s = t.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    wide = s.agg(
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("arm") == 1, F.col("sxx"))).alias("sxx1"),
        F.max(F.when(F.col("arm") == 0, F.col("sxx"))).alias("sxx0"),
    )
    m1 = F.col("sx1").cast("double") / F.col("n1")
    m0 = F.col("sx0").cast("double") / F.col("n0")
    ss1 = (F.col("sxx1").cast("double")
           - F.col("sx1").cast("double") * F.col("sx1") / F.col("n1"))
    ss0 = (F.col("sxx0").cast("double")
           - F.col("sx0").cast("double") * F.col("sx0") / F.col("n0"))
    pooled = F.sqrt((ss1 + ss0) / (F.col("n1") + F.col("n0") - 2))
    return wide.select(
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_control"),
        F.round(m1 - m0, 6).alias("mean_diff"),
        F.round(pooled, 6).alias("pooled_sd"),
        F.round((m1 - m0) / pooled, 6).alias("cohens_d"),
    )


@register(
    "q_stat_cliffs_delta",
    oracle=f"""
    WITH t AS (
        SELECT {_ARM} AS arm,
               CAST(ROUND(o_totalprice) AS BIGINT) AS v
        FROM orders),
    h1 AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c1 FROM t
           WHERE arm = 1 GROUP BY v),
    h0 AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c0 FROM t
           WHERE arm = 0 GROUP BY v),
    n AS (
        SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM h1) AS n1,
               (SELECT CAST(SUM(c0) AS BIGINT) FROM h0) AS n0),
    -- dominance via the control histogram's cumulative counts over
    -- the UNION of values: for each treated value v, #control < v
    -- and #control > v — integer exact, no pair enumeration
    allv AS (SELECT v FROM h1 UNION SELECT v FROM h0),
    c0f AS (
        SELECT a.v, COALESCE(h0.c0, 0) AS c0
        FROM allv a LEFT JOIN h0 ON h0.v = a.v),
    cum AS (
        SELECT v,
               COALESCE(SUM(c0) OVER (ORDER BY v ROWS BETWEEN
                        UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below,
               (SELECT SUM(c0) FROM c0f)
                 - SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS above
        FROM c0f),
    dom AS (
        SELECT CAST(SUM(h1.c1 * cum.below) AS BIGINT) AS gt,
               CAST(SUM(h1.c1 * cum.above) AS BIGINT) AS lt
        FROM h1 JOIN cum ON cum.v = h1.v)
    SELECT n.n1, n.n0,
           dom.gt AS pairs_treat_greater,
           dom.lt AS pairs_treat_less,
           ROUND((CAST(dom.gt AS DOUBLE) - dom.lt)
                 / (CAST(n.n1 AS DOUBLE) * n.n0), 6) AS cliffs_delta
    FROM dom CROSS JOIN n
    """,
)
def q_stat_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta: P(treated > control) − P(treated < control)
    over whole-dollar order values — the nonparametric effect size
    that pairs with q_stat_mannwhitney the way Cohen's d pairs with
    the t-test (robust to the skew that invalidates d). Computed
    EXACTLY from the two value histograms: each treated value
    contributes count × (#control strictly below / above) via the
    control histogram's cumulative sums — integer pair counts, never
    pair enumeration.

    Scale: two value-grain histograms + one cumulative window over
    the (bounded) distinct-value domain; the dominance join is
    histogram×histogram, not rows×rows."""
    t = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0).alias("arm"),
        F.round("o_totalprice").cast("long").alias("v"),
    )
    h1 = t.where(F.col("arm") == 1).groupBy("v").agg(
        F.count(F.lit(1)).alias("c1"))
    h0 = t.where(F.col("arm") == 0).groupBy("v").agg(
        F.count(F.lit(1)).alias("c0"))
    from pyspark.sql import Window

    w_below = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0)
    n0_total = h0.agg(F.sum("c0")).collect()[0][0]
    # treated values absent from the control histogram need their own
    # below/above — align the cumulative sums on the union of values
    allv = h1.select("v").unionAll(h0.select("v")).distinct()
    c0full = (
        allv.join(h0, "v", "left")
        .select("v", F.coalesce("c0", F.lit(0)).alias("c0"))
        .select(
            "v",
            F.coalesce(F.sum("c0").over(w_below), F.lit(0)).alias("below"),
            (F.lit(n0_total) - F.sum("c0").over(w_upto)).alias("above"),
        )
    )
    dom = (
        h1.join(c0full, "v")
        .agg(
            F.sum(F.col("c1") * F.col("below")).alias("gt"),
            F.sum(F.col("c1") * F.col("above")).alias("lt"),
        )
    )
    n1_total = h1.agg(F.sum("c1")).collect()[0][0]
    return dom.select(
        F.lit(n1_total).cast("long").alias("n1"),
        F.lit(n0_total).cast("long").alias("n0"),
        F.col("gt").alias("pairs_treat_greater"),
        F.col("lt").alias("pairs_treat_less"),
        F.round(
            (F.col("gt").cast("double") - F.col("lt"))
            / (float(n1_total) * n0_total),
            6,
        ).alias("cliffs_delta"),
    )
