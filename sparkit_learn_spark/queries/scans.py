"""Scan / source operators (SURVEY.md §2B — q_scan_*).

The reference has no file-format sources at all [SURVEY §2A: C:H —
RDDs arrive via sc.parallelize]; these are pure extensions. The value
at 100 TB is what Catalyst pushes INTO the scan: column pruning
(ReadSchema) and predicate pushdown (PushedFilters) — asserted in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register("q_scan_parquet", oracle="SELECT * FROM lineitem")
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-width parquet scan of the fact table."""
    return load_table(spark, sf_dir, "lineitem")


@register(
    "q_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned + filtered scan: 4 of 11 columns, shipdate range.

    Catalyst pushes both into the parquet reader: ReadSchema lists only
    these columns, PushedFilters carries the timestamp range — at
    100 TB this is the difference between reading 4/11 of the bytes of
    the matching row groups and reading everything.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    return (
        li.select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    )


@register(
    "q_scan_union_sf",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def q_scan_union_sf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-scan union (dup-preserving), each branch independently
    pushed down; Spark unions partitions without a shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.filter(F.col("o_orderstatus") == "O").unionByName(
        o.filter(F.col("o_orderstatus") == "F")
    )
