"""sf0.01 oracle parity for every float-rounding query — the scale the
DRIVER actually samples at.

The r4 q_agg_corr escape proved sf0.001-only local parity is strictly
weaker than the driver's sf0.01 check: the -0.0-producing group only
exists at sf0.01. Queries whose oracle rounds floats (ROUND(...)) are
exactly the ones whose hash can flip with scale (a rounded statistic
crossing zero / a .5 boundary), so they re-run here against the
driver's SF. Non-rounding queries are scale-robust by value identity
(ints, strings, exact sums) and stay on the fast sf0.001 gate.
"""

from __future__ import annotations

import pytest

from sparkit_learn_spark.registry import all_oracles
from sparkit_learn_spark.testing import check_query, duck_connect

SF_001 = "/root/testdata/sf0.01"

ROUNDING = sorted(
    name for name, sql in all_oracles().items() if "ROUND" in sql.upper()
)


@pytest.fixture(scope="module")
def duck_sf01():
    con = duck_connect(SF_001)
    yield con
    con.close()


@pytest.mark.parametrize("name", ROUNDING)
def test_oracle_match_sf01(spark, duck_sf01, name):
    check_query(spark, duck_sf01, name, SF_001)
