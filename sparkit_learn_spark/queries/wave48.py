"""Round-6 wave 48: M4 time-series downsampling (the lossless-per-
pixel charting reduction), a cross-table consistency audit (order
totals recomputed from line items), and a Simpson's-paradox detector
(aggregate vs within-group ratio direction flips). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_m4_downsample",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    s AS (
        SELECT d, rev,
               ROW_NUMBER() OVER (ORDER BY d) - 1 AS i,
               COUNT(*) OVER () AS n
        FROM day),
    b AS (
        SELECT d, rev, i * 100 // n AS bucket FROM s)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           arg_min(rev, d) AS first_rev,
           arg_max(rev, d) AS last_rev,
           CAST(MIN(rev) AS BIGINT) AS min_rev,
           CAST(MAX(rev) AS BIGINT) AS max_rev
    FROM b GROUP BY bucket
    """,
)
def q_ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling: the daily-revenue series reduced to 100 pixel
    buckets keeping each bucket's FIRST, LAST, MIN, and MAX — the
    four values that make a line chart rendered from the reduced
    series pixel-identical to one rendered from the full series (the
    M4 guarantee), the standard dashboard-backend reduction.
    Equal-count buckets via pure integer rank arithmetic; first/last
    select by date through arg_min/arg_max (MIN_BY/MAX_BY) — one
    aggregate, no per-bucket sort.

    Scale: the series aggregates map-side to day grain; bucketing is
    one global rank over the tiny series (at 100 TB assign buckets
    by time range instead — no rank needed) and the M4 reduction is
    a single combining aggregate at bucket grain."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    s = day.select(
        "d",
        "rev",
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    b = s.select("d", "rev", F.expr("i * 100 div n").alias("bucket"))
    return b.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("n_days"),
        F.min_by("rev", "d").alias("first_rev"),
        F.max_by("rev", "d").alias("last_rev"),
        F.min("rev").alias("min_rev"),
        F.max("rev").alias("max_rev"),
    )


@register(
    "q_dq_cross_table_audit",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100) AS BIGINT))
                    AS BIGINT) AS computed_cents
        FROM lineitem GROUP BY 1),
    j AS (
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS stated,
               li.computed_cents AS computed
        FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey),
    d AS (
        SELECT stated - computed AS delta FROM j)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           CAST(SUM(CASE WHEN ABS(delta) <= 100 AND delta <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dollar,
           CAST(SUM(CASE WHEN ABS(delta) > 100 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_divergent,
           CAST(MAX(ABS(delta)) AS BIGINT) AS max_abs_delta_cents
    FROM d
    """,
)
def q_dq_cross_table_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table consistency audit: each order's stated total
    recomputed from its line items (Σ extended·(1−disc)·(1+tax), in
    per-line rounded cents) and diffed — the fact-vs-detail
    reconciliation every warehouse runs after a load, reporting the
    exact/near/divergent split and the worst absolute gap. The
    per-line cent rounding is applied identically in both engines, so
    the delta distribution is engine-exact even where the source data
    itself doesn't reconcile.

    Scale: one line-grain aggregate (map-side combining on orderkey)
    joined to orders on the key both tables are naturally clustered
    by, then a scalar rollup — the same shuffle as TPC-H Q18."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    computed = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        ).alias("computed")
    )
    delta = (
        o.join(computed, o.o_orderkey == computed.l_orderkey)
        .select(
            (
                F.round(F.col("o_totalprice") * 100).cast("long")
                - F.col("computed")
            ).alias("delta")
        )
    )
    return delta.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("delta") == 0, 1).otherwise(0)).alias("n_exact"),
        F.sum(
            F.when(
                (F.abs("delta") <= 100) & (F.col("delta") != 0), 1
            ).otherwise(0)
        ).alias("n_within_dollar"),
        F.sum(F.when(F.abs("delta") > 100, 1).otherwise(0)).alias(
            "n_divergent"
        ),
        F.max(F.abs("delta")).alias("max_abs_delta_cents"),
    )


@register(
    "q_stat_simpsons_detector",
    oracle="""
    WITH base AS (
        SELECT c.c_nationkey AS nation,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS urgent,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    overall AS (
        SELECT SUM(CASE WHEN urgent = 1 THEN cents ELSE 0 END)
                 * CAST(SUM(CASE WHEN urgent = 0 THEN 1 ELSE 0 END)
                        AS HUGEINT)
               - SUM(CASE WHEN urgent = 0 THEN cents ELSE 0 END)
                 * CAST(SUM(CASE WHEN urgent = 1 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS diff_sign_num
        FROM base),
    grp AS (
        SELECT nation,
               SUM(CASE WHEN urgent = 1 THEN cents ELSE 0 END)
                 * CAST(SUM(CASE WHEN urgent = 0 THEN 1 ELSE 0 END)
                        AS HUGEINT)
               - SUM(CASE WHEN urgent = 0 THEN cents ELSE 0 END)
                 * CAST(SUM(CASE WHEN urgent = 1 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS diff_sign_num,
               CAST(SUM(urgent) AS BIGINT) AS n_urgent,
               CAST(SUM(1 - urgent) AS BIGINT) AS n_other
        FROM base GROUP BY nation)
    SELECT CAST(SIGN(o.diff_sign_num) AS BIGINT) AS overall_direction,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN SIGN(g.diff_sign_num)
                              = SIGN(o.diff_sign_num)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           CAST(SUM(CASE WHEN SIGN(g.diff_sign_num)
                              = -SIGN(o.diff_sign_num)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed
    FROM grp g CROSS JOIN overall o
    WHERE g.n_urgent > 0 AND g.n_other > 0
    GROUP BY o.diff_sign_num
    """,
)
def q_stat_simpsons_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: does 'URGENT orders average more
    than non-urgent' hold overall yet REVERSE inside nations? The
    mean comparison is evaluated as the cross-multiplied EXACT
    integer sign (Σ_u·n_o − Σ_o·n_u, 128-bit), overall and per group,
    and groups are counted by agreement vs reversal — the aggregation
    pitfall audit that should precede any segment-level claim.
    No division anywhere; pure integer signs.

    Scale: two aggregates over the same joined base (one global, one
    at nation grain) and a broadcast of the one-row overall sign —
    COUNT(*)-shaped shuffles only."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("urgent"),
        F.round(F.col("o_totalprice") * 100)
        .cast("decimal(19,0)")
        .alias("cents"),
    )

    def diff_num(df):
        return df.agg(
            (
                F.sum(F.when(F.col("urgent") == 1, F.col("cents")).otherwise(0))
                * F.sum(F.when(F.col("urgent") == 0, 1).otherwise(0)).cast(
                    "decimal(19,0)"
                )
                - F.sum(
                    F.when(F.col("urgent") == 0, F.col("cents")).otherwise(0)
                )
                * F.sum(F.when(F.col("urgent") == 1, 1).otherwise(0)).cast(
                    "decimal(19,0)"
                )
            ).alias("diff_sign_num"),
            F.sum("urgent").alias("n_urgent"),
            F.sum(1 - F.col("urgent")).alias("n_other"),
        )

    overall = diff_num(base).select(
        F.col("diff_sign_num").alias("o_num")
    )
    grp = base.groupBy("nation").agg(
        (
            F.sum(F.when(F.col("urgent") == 1, F.col("cents")).otherwise(0))
            * F.sum(F.when(F.col("urgent") == 0, 1).otherwise(0)).cast(
                "decimal(19,0)"
            )
            - F.sum(F.when(F.col("urgent") == 0, F.col("cents")).otherwise(0))
            * F.sum(F.when(F.col("urgent") == 1, 1).otherwise(0)).cast(
                "decimal(19,0)"
            )
        ).alias("diff_sign_num"),
        F.sum("urgent").alias("n_urgent"),
        F.sum(1 - F.col("urgent")).alias("n_other"),
    )
    sign = F.signum(F.col("diff_sign_num").cast("double")).cast("long")
    osign = F.signum(F.col("o_num").cast("double")).cast("long")
    return (
        grp.filter((F.col("n_urgent") > 0) & (F.col("n_other") > 0))
        .crossJoin(F.broadcast(overall))
        .groupBy(osign.alias("overall_direction"))
        .agg(
            F.count("*").alias("n_groups"),
            F.sum(F.when(sign == osign, 1).otherwise(0)).alias("n_agree"),
            F.sum(F.when(sign == -osign, 1).otherwise(0)).alias(
                "n_reversed"
            ),
        )
    )
