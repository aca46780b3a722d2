"""Subquery operators (q_sub_*) — correlated scalar and IN/EXISTS
subqueries via Spark SQL.

The interesting part is what Catalyst does underneath: correlated
subqueries are DECORRELATED into joins (scalar -> left outer
aggregate join, IN -> left semi), so the executed plan scales like
the equivalent join — no per-row subquery execution ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "q_sub_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey) AS BIGINT) AS n_items
    FROM orders o
    WHERE o_totalprice > 400000
    """,
)
def q_sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-order lineitem count) —
    decorrelated by Catalyst into an aggregate + left outer join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey) AS BIGINT) AS n_items
        FROM orders o
        WHERE o_totalprice > 400000
        """
    )


@register(
    "q_sub_in",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
    """,
)
def q_sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (parts ever shipped at max quantity) — planned as a
    left semi join after rewrite."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
        """
    )


@register(
    "q_sub_exists",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      AND c_acctbal > 0
    """,
)
def q_sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (customers in good standing with no 2001
    order) — Catalyst decorrelates to a left ANTI join on custkey:
    one shuffle each side, no per-row subquery execution. (r7: the
    "never ordered" form was empty below sf0.1 — every fixture
    customer buys eventually — so the driver's sf0.01 check was
    trivially green; the recency window keeps it value-exercised.)"""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01')
          AND c_acctbal > 0
        """
    )


@register(
    "q_sub_correlated_agg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_sub_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery (orders more than twice
    their customer's own average) — Catalyst decorrelates to a
    per-custkey aggregate joined back on the correlation key: two
    scans, one shuffle each, no per-row subquery loop.

    Scale: the decorrelated form is exactly what you would hand-write
    (pre-aggregate then equi-join on o_custkey, both sides
    co-partitioned); at 100 TB the aggregate side has one row per
    customer and joins shuffle-to-shuffle, never broadcast."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                                    FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q_sub_any_all",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal > ALL (
            SELECT c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY'
              AND c_acctbal < 0
          )
      AND s_acctbal < ANY (
            SELECT c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY'
          )
    ORDER BY s_suppkey
    """,
)
def q_sub_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (> ALL, < ANY): suppliers whose balance
    beats every negative MACHINERY-customer balance and trails at
    least one MACHINERY balance. ALL/ANY decorrelate to MAX/MIN
    scalar aggregates (with the empty-subquery edge: > ALL of an
    empty set is TRUE — both engines agree; the Spark side keeps the
    same NULL-safe guard the SQL form implies).

    Scale: both subqueries reduce to a 1-row (max, min) aggregate
    broadcast into the supplier scan's filter — no join of any fact
    size; this is how quantified predicates should always land at
    100 TB (never as the naive per-row rescan)."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY")
    bounds = c.agg(
        F.max(F.when(F.col("c_acctbal") < 0, F.col("c_acctbal")))
        .alias("max_neg"),
        F.min("c_acctbal").alias("min_any"),
        F.max("c_acctbal").alias("max_any"),
    )
    return (
        s.join(F.broadcast(bounds))
        # > ALL(empty) is TRUE: max_neg IS NULL passes
        .filter(F.col("max_neg").isNull()
                | (F.col("s_acctbal") > F.col("max_neg")))
        # < ANY(S) means < max(S); empty set -> FALSE (max_any NULL
        # makes the comparison NULL -> filtered, matching SQL)
        .filter(F.col("s_acctbal") < F.col("max_any"))
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )
