"""global_row_number (operators/ranking.py) must equal the
single-partition Window row_number on a total order — same values,
no SinglePartition stage in the plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.operators.ranking import global_row_number


def test_global_row_number_matches_window(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    got = global_row_number(
        o, ["o_custkey", "o_orderkey"], name="rn", num_partitions=7
    ).toPandas().sort_values("o_orderkey").reset_index(drop=True)
    exp = o.withColumn(
        "rn",
        F.row_number().over(Window.orderBy("o_custkey", "o_orderkey")),
    ).toPandas().sort_values("o_orderkey").reset_index(drop=True)
    assert (got["rn"] == exp["rn"]).all()
    assert got["rn"].min() == 1 and got["rn"].max() == len(got)


def test_global_row_number_plan_has_no_singlepartition_window(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    df = global_row_number(o, ["o_orderkey"], num_partitions=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" not in plan
