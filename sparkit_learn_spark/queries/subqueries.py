"""Subquery operators (q_sub_*) — correlated scalar and IN/EXISTS
subqueries via Spark SQL.

The interesting part is what Catalyst does underneath: correlated
subqueries are DECORRELATED into joins (scalar -> left outer
aggregate join, IN -> left semi), so the executed plan scales like
the equivalent join — no per-row subquery execution ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
                      WHERE o.o_custkey = c.c_custkey)
      AND c_acctbal > 0
    """,
)
def q_sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (customers in good standing who never
    ordered) — Catalyst decorrelates to a left ANTI join on custkey:
    one shuffle each side, no per-row subquery execution."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
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
