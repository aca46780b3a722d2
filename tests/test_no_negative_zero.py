"""No oracled query may emit IEEE -0.0 at any fixture scale.

Why this gate exists: the r4 driver failure (q_agg_corr) was DuckDB
ROUND(covar_pop(...), 6) landing on -0.0 at sf0.01 while Spark's
BigDecimal HALF_UP round (no signed zero) produced +0.0 — the value
hash formats these differently, so rows/schema matched and the hash
did not. The local gate at the time (a) normalized -0.0 away and
(b) only ran sf0.001, where no group rounds to zero. Both gaps are
closed: testing._cell no longer normalizes, and this sweep runs EVERY
oracle at EVERY fixture SF in DuckDB (cheap — no Spark needed) and
fails on any cell that would format as negative zero at the hash's
6dp precision. A query that trips this must scale the tiny statistic
before rounding (q_agg_stats / q_agg_corr precedent) or +0.0-guard
the expression in BOTH engines.
"""

from __future__ import annotations

import pytest

from sparkit_learn_spark.registry import all_oracles
from sparkit_learn_spark.testing import duck_connect, normalize

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_oracles_emit_no_negative_zero(sf_dir):
    con = duck_connect(sf_dir)
    try:
        offenders: list[str] = []
        for name, sql in sorted(all_oracles().items()):
            rows = normalize(con.sql(sql).df())
            for row in rows:
                # covers bare floats AND floats inside array cells,
                # which normalize to "[..,-0.000000,..]"
                if any("-0.000000" in cell for cell in row):
                    offenders.append(f"{name}: {row}")
                    break
        assert not offenders, (
            "oracle results that hash as negative zero "
            f"at {sf_dir}:\n" + "\n".join(offenders)
        )
    finally:
        con.close()
