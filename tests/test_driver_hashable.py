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
