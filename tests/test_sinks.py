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


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC source/sink parity with parquet: same rows, schema, and
    predicate pushdown (Spark's native ORC reader supports the same
    PushedFilters surface)."""
    out = str(tmp_path / "orders_orc")
    df = load_table(spark, sf_dir, "orders")
    df.write.format("orc").mode("overwrite").save(out)
    back = spark.read.orc(out)
    assert back.count() == df.count()
    assert {f.name for f in back.schema.fields} == {f.name for f in df.schema.fields}
    plan = explain_str(back.filter(F.col("o_totalprice") > 1000.0))
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_csv_json_orc_row_parity(spark, sf_dir, tmp_path):
    """All three non-parquet formats round-trip the same 100-row
    sample to identical sorted values (type fidelity differences —
    CSV stringly-typed timestamps — are normalized by the schema-on
    read)."""
    df = load_table(spark, sf_dir, "nation")
    expect = sorted(tuple(r) for r in df.collect())
    for fmt in ("csv", "json", "orc"):
        out = str(tmp_path / f"nation_{fmt}")
        w = df.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        w.save(out)
        r = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            r = r.schema(df.schema)
        if fmt == "csv":
            r = r.option("header", True)
        got = sorted(tuple(x) for x in r.load(out).collect())
        assert got == expect, fmt
