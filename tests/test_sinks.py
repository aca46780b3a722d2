"""Parquet sink roundtrips (SURVEY §2B sink_parquet — pytest-only) and
partitioned layout pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.plans.inspect import explain_str
from sparkit_learn_spark.sources.parquet_io import write_parquet


def test_roundtrip_preserves_rows_and_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_out")
    df = load_table(spark, sf_dir, "orders")
    write_parquet(df, out)
    back = spark.read.parquet(out)
    assert back.schema == df.schema
    assert back.count() == df.count()
    assert back.agg(F.sum("o_totalprice")).first()[0] == df.agg(
        F.sum("o_totalprice")
    ).first()[0]


def test_partitioned_write_enables_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_part")
    df = load_table(spark, sf_dir, "orders")
    write_parquet(df, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(back)
    # partition filter appears as PartitionFilters on the scan, and
    # only the matching directory is read
    assert "PartitionFilters" in plan
    assert back.count() == df.filter(F.col("o_orderstatus") == "F").count()
