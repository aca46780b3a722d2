"""Every ORACLED query must emit a driver-hashable result schema.

The driver's canonicalizer pandas-sorts raw result columns before
hashing; array/map/struct cells crash it (``TypeError: unhashable
type: 'numpy.ndarray'`` — the r5 q_agg_collect_sorted ERR). This test
walks the (lazy) schema of every oracled query and fails on any
complex-typed column, so that class of driver-only failure can never
ship again without a local red. Rows-only queries (no oracle) are
exempt — the driver only row-counts them.

Schema construction is lazy (no job runs), so this is cheap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sparkit_learn_spark.registry import all_oracles, all_queries

ORACLED = sorted(all_oracles())
ALL_REGISTERED = sorted(all_queries())

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", ORACLED)
def test_primitive_only_schema(spark, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    bad = [f"{f.name}:{f.dataType.simpleString()}"
           for f in df.schema.fields if isinstance(f.dataType, COMPLEX)]
    assert not bad, (
        f"{name} returns non-driver-hashable column(s) {bad}; "
        "serialize (array_join / to_json) before returning"
    )


@pytest.mark.parametrize("name", ALL_REGISTERED)
def test_no_decimal_schema(spark, sf_dir, name):
    """DecimalType result columns are forbidden in oracled queries —
    the r7 q_sql_group_by_all driver-red: Spark-4 ANSI promotes
    ``BIGINT / 1000.0`` to DECIMAL(28,6) while DuckDB returns DOUBLE,
    and the driver's hash distinguishes ``Decimal('x.181000')`` from
    float ``x.181`` exactly when trailing zeros land at 6dp. Values
    that pass today can flip red on any data/SF change. CAST to
    DOUBLE in BOTH engines instead."""
    df = all_queries()[name](spark, sf_dir)
    bad = [f"{f.name}:{f.dataType.simpleString()}"
           for f in df.schema.fields
           if isinstance(f.dataType, T.DecimalType)]
    assert not bad, (
        f"{name} returns DECIMAL column(s) {bad} — data-dependent "
        "driver hash hazard (ANSI int/decimal-literal promotion); "
        "CAST(... AS DOUBLE) in both the Spark SQL and the oracle"
    )
