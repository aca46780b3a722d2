"""Every registered query with a DuckDB oracle must match it —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from sparkit_learn_spark.registry import all_oracles, all_queries
from sparkit_learn_spark.testing import check_query

ORACLED = sorted(all_oracles())
ROWS_ONLY = sorted(set(all_queries()) - set(all_oracles()))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, sf_dir, name):
    check_query(spark, duck, name, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    assert df.count() >= 0
