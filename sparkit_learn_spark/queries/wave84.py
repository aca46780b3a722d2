"""Round-6 wave 84: the QUALIFY clause rewrite (window filter
without a subquery — oracle uses DuckDB's native QUALIFY, Spark the
canonical window+filter rewrite it desugars to), schema-aligning
UNION BY NAME (Spark unionByName vs DuckDB UNION ALL BY NAME), and
a TOST equivalence test (the two one-sided tests that prove "no
meaningful difference", completing the A/B family). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_sql_qualify_rewrite",
    oracle="""
    SELECT c_mktsegment,
           c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    ORDER BY c_mktsegment, bal_cents DESC, c_custkey
    """,
)
def q_sql_qualify_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-clause semantics (filter on a window function without
    a subquery): top-3 customers by balance per market segment. The
    oracle uses DuckDB's native QUALIFY; Spark has no QUALIFY, so
    this is the canonical window + filter rewrite every engine
    desugars QUALIFY into — registered to pin that the rewrite is
    exactly equivalent, ties broken deterministically by key.

    Scale: one window partitioned by segment (hash-shuffled once) +
    an early rank filter — at 100 TB the per-group top-k histogram
    rewrite (q_win_topk_group's note) applies when groups are huge.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
        .orderBy("c_mktsegment", F.col("bal_cents").desc(), "c_custkey")
    )


@register(
    "q_set_union_by_name",
    oracle="""
    WITH a AS (
        SELECT o_orderpriority AS seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST('orders' AS VARCHAR) AS src
        FROM orders GROUP BY 1),
    b AS (
        SELECT CAST('customers' AS VARCHAR) AS src,
               c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 2),
    u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
    SELECT src, seg, n FROM u ORDER BY src, seg
    """,
)
def q_set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligning union: two aggregates whose columns appear in
    DIFFERENT orders combine by column NAME, not position — Spark's
    unionByName / DuckDB's UNION ALL BY NAME. Positional UNION here
    would silently put counts into the segment column; by-name union
    is the safe default for evolving multi-source pipelines.

    Scale: two independent hash aggregates, a dimension-sized union —
    the alignment is purely an analysis-time rename, zero runtime
    cost.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.groupBy(F.col("o_orderpriority").alias("seg")).agg(
        F.count(F.lit(1)).alias("n")
    ).select("seg", "n", F.lit("orders").alias("src"))
    b = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("customers").alias("src"), "seg", "n")
    return a.unionByName(b).select("src", "seg", "n").orderBy("src", "seg")


@register(
    "q_stat_equivalence_tost",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY user_id),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               SUM(CAST(x AS DECIMAL(38, 0)) * CAST(x AS DECIMAL(38, 0)))
                   AS s2
        FROM per_user GROUP BY grp),
    w AS (
        SELECT a.n AS n1, a.s AS s1, a.s2 AS s21,
               b.n AS n0, b.s AS s0, b.s2 AS s20
        FROM g a JOIN g b ON a.grp = 1 AND b.grp = 0),
    c AS (
        SELECT n1, n0,
               CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS d,
               (CAST(s1 AS DOUBLE) + CAST(s0 AS DOUBLE))
                   / (n1 + n0) AS mean_all,
               SQRT((CAST(s21 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                    / (n1 - 1) / n1
                    + (CAST(s20 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
                    / (n0 - 1) / n0) AS se
        FROM w)
    SELECT n1 + n0 AS n_users,
           ROUND(d / 100.0 + 0.0, 6) AS diff_dollars,
           ROUND(0.05 * mean_all / 100.0, 6) AS margin_dollars,
           ROUND((d + 0.05 * mean_all) / se + 0.0, 6) AS t_lower,
           ROUND((0.05 * mean_all - d) / se + 0.0, 6) AS t_upper,
           CAST((d + 0.05 * mean_all) / se > 1.644854
                AND (0.05 * mean_all - d) / se > 1.644854 AS BIGINT)
               AS equivalent_90
    FROM c
    """,
)
def q_stat_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test: is per-user purchase spend EQUIVALENT
    between odd/even user groups within ±5% of the overall mean? Two
    one-sided Welch t-tests against the margins — both must reject
    (t > z₀.₉₅ = 1.644854, normal approximation at these n) to claim
    equivalence. The test every "this refactor didn't change
    anything" A/B readout should use instead of a failed-to-reject
    t-test. All moments exact integers (squares in DECIMAL(38,0)).

    Scale: one fact pass to user grain, one 2-row group aggregate,
    closed-form doubles after — same contract as the Welch t-test it
    extends.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("long").alias("grp"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("x"),
    )
    g = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("s2"),
    )
    a = g.filter(F.col("grp") == 1).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("s2").alias("s21")
    )
    b = g.filter(F.col("grp") == 0).select(
        F.col("n").alias("n0"), F.col("s").alias("s0"), F.col("s2").alias("s20")
    )
    w = a.crossJoin(F.broadcast(b))
    d = F.col("s1").cast("double") / F.col("n1") - F.col("s0").cast(
        "double"
    ) / F.col("n0")
    mean_all = (F.col("s1").cast("double") + F.col("s0").cast("double")) / (
        F.col("n1") + F.col("n0")
    )
    se = F.sqrt(
        (
            F.col("s21").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
        )
        / (F.col("n1") - 1)
        / F.col("n1")
        + (
            F.col("s20").cast("double")
            - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
        )
        / (F.col("n0") - 1)
        / F.col("n0")
    )
    margin = 0.05 * mean_all
    t_lo = (d + margin) / se
    t_hi = (margin - d) / se
    z = 1.644854
    return w.select(
        (F.col("n1") + F.col("n0")).alias("n_users"),
        F.round(d / 100.0, 6).alias("diff_dollars"),
        F.round(margin / 100.0, 6).alias("margin_dollars"),
        F.round(t_lo, 6).alias("t_lower"),
        F.round(t_hi, 6).alias("t_upper"),
        ((t_lo > z) & (t_hi > z)).cast("long").alias("equivalent_90"),
    )
