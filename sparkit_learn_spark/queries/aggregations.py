"""Aggregation operators (SURVEY.md §2B — q_agg_*).

Spark's hash aggregate does partial (map-side) + final aggregation
automatically — the declarative form of the reference's per-block
partial_fit + reduce(add) pattern [ref: splearn/naive_bayes.py · C:H].
Shuffle count: 1 per groupBy (partials cross the wire pre-combined);
survives 100× scale because state per grouping key is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_R6 = 6  # float aggregates rounded to 6dp in BOTH engines (SURVEY §5.2)


@register(
    "q_agg_q1",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 6)                                   AS sum_qty,
      ROUND(SUM(l_extendedprice), 6)                              AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)           AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
      ROUND(AVG(l_quantity), 6)                                   AS avg_qty,
      ROUND(AVG(l_extendedprice), 6)                              AS avg_price,
      ROUND(AVG(l_discount), 6)                                   AS avg_disc,
      CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary over lineitem.

    Plan shape: parquet scan (shipdate filter pushed) -> partial hash
    agg -> exchange on (returnflag, linestatus) [2 groups x 3 — tiny]
    -> final hash agg -> sort. One shuffle; whole-stage codegen
    end-to-end; no Python.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), _R6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), _R6).alias("sum_base_price"),
            F.round(F.sum(disc_price), _R6).alias("sum_disc_price"),
            F.round(F.sum(charge), _R6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), _R6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), _R6).alias("avg_price"),
            F.round(F.avg("l_discount"), _R6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
