"""Data-quality surface (round 6): constraint validation and column
profiling — the dbt-test / expectations layer a production pipeline
runs before trusting a table. Both queries return REPORTS (one row
per check / column), so they compose into circuit-breakers: a
non-zero violation count gates the downstream job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_dq_checks",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) FROM
                  (SELECT o_orderkey FROM orders
                   GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT)
             AS violations
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_status_domain',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    UNION ALL
    SELECT 'orders_date_not_null',
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
                AS BIGINT)
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation report: primary-key uniqueness, foreign-
    key integrity (anti join, NOT a correlated probe), value-domain
    membership, numeric range, and non-null — one row per check with
    its violation count. Zero rows violated = table trusted.

    Scale: each check is one scan + aggregate; the FK check is a
    broadcast/shuffle anti join (Spark picks by size). Checks over the
    SAME table could share one scan via conditional aggregation —
    kept separate here because each check names its own contract."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    pk_dup = (
        o.groupBy("o_orderkey").count().filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
    )
    fk_orphan = (
        li.join(o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").alias("violations"))
    )
    domain = (
        o.filter(~F.col("o_orderstatus").isin("F", "O", "P"))
        .agg(F.count("*").alias("violations"))
    )
    rng = (
        li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .agg(F.count("*").alias("violations"))
    )
    notnull = (
        o.filter(F.col("o_orderdate").isNull())
        .agg(F.count("*").alias("violations"))
    )

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"),
                         F.coalesce("violations", F.lit(0)).cast("long")
                          .alias("violations"))

    return (
        tag(pk_dup, "orders_pk_unique")
        .unionAll(tag(fk_orphan, "lineitem_fk_orders"))
        .unionAll(tag(domain, "orders_status_domain"))
        .unionAll(tag(rng, "lineitem_qty_range"))
        .unionAll(tag(notnull, "orders_date_not_null"))
    )


@register(
    "q_dq_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(COUNT(*) AS BIGINT)                       AS n,
           CAST(COUNT(o_totalprice) AS BIGINT)            AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)   AS n_distinct,
           ROUND(MIN(o_totalprice), 6)                    AS min_v,
           ROUND(MAX(o_totalprice), 6)                    AS max_v,
           ROUND(AVG(o_totalprice), 6)                    AS mean_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(MIN(o_custkey), 6), ROUND(MAX(o_custkey), 6),
           ROUND(AVG(o_custkey), 6)
    FROM orders
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling report (count / non-null / distinct / min /
    max / mean per column) — the table-health summary a catalog
    surfaces. Both profiled columns aggregate in ONE scan each via
    stacked aggregates; a wide-table profiler would do all columns in
    one pass the same way.

    Scale: aggregation-only; COUNT(DISTINCT) is the expensive term —
    swap in approx_count_distinct (or the HLL sketches of
    q_agg_hll_sketch) past ~10⁹ distinct values."""
    o = load_table(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col), 6).cast("double").alias("min_v"),
            F.round(F.max(col), 6).cast("double").alias("max_v"),
            F.round(F.avg(col), 6).alias("mean_v"),
        )

    return profile("o_totalprice").unionAll(profile("o_custkey"))
