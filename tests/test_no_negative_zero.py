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

import os

import pytest

from sparkit_learn_spark.registry import all_oracles
from sparkit_learn_spark.testing import duck_connect, normalize

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
# The sf0.1 sweep is ~20 min of DuckDB compute ALONE (616 oracles at
# 6M lineitem rows) — 25%+ of the whole suite's wall time, while the
# driver only ever hashes oracle results at the SMALL SFs above (it
# benches sf0.1 but samples correctness at sf0.01). Keep the sf0.1
# pass as builder-tier insurance against future-scale -0.0 drift
# (SPARK_GRAFT_TEST_FULL=1, same knob as the parity tier) so the
# driver-tier suite fits the driver's pytest time budget
# (VERDICT r11 #2); coverage at both driver-hashed SFs stays FULL.
if os.environ.get("SPARK_GRAFT_TEST_FULL", "0") == "1":
    SF_DIRS.append("/root/testdata/sf0.1")

# Recycle the DuckDB connection every N oracles (VERDICT r8 item #1):
# DuckDB's buffer pool and temp-spill blocks accumulate PER CONNECTION
# — the r8 single-connection sweep at sf0.1 reached ~110 GB RSS and
# spilled 68 GB to disk. Closing the connection releases both, so the
# peak envelope is bounded by the heaviest RECYCLE_EVERY-oracle chunk
# (plus duck_connect's own 16 GB memory_limit / 24 GB spill cap).
RECYCLE_EVERY = 25


def _temp_spill_bytes(temp_dir: str) -> int:
    total = 0
    if os.path.isdir(temp_dir):
        for root, _dirs, files in os.walk(temp_dir):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_oracles_emit_no_negative_zero(sf_dir, tmp_path):
    # per-test spill dir (r9 ADVICE): a shared /tmp dir + rmtree at
    # test start would delete a LIVE connection's spill blocks if the
    # three sf params ever run in parallel (pytest-xdist); and spill
    # must be SAMPLED inside the loop — DuckDB deletes its temp blocks
    # on connection close, so an end-of-test measurement is vacuous.
    spill_dir = str(tmp_path / "duck_spill")
    oracles = sorted(all_oracles().items())
    offenders: list[str] = []
    peak_spill = 0
    con = None
    try:
        for i, (name, sql) in enumerate(oracles):
            if i % RECYCLE_EVERY == 0:
                if con is not None:
                    con.close()
                con = duck_connect(sf_dir, temp_directory=spill_dir)
            rows = normalize(con.sql(sql).df())
            peak_spill = max(peak_spill, _temp_spill_bytes(spill_dir))
            for row in rows:
                # covers bare floats AND floats inside array cells,
                # which normalize to "[..,-0.000000,..]"
                if any("-0.000000" in cell for cell in row):
                    offenders.append(f"{name}: {row}")
                    break
    finally:
        if con is not None:
            con.close()
    # The resource envelope is part of the gate: spill must stay
    # bounded, or the sweep rots back into un-runnability.
    spill_gb = peak_spill / 2**30
    assert spill_gb < 24.5, f"duckdb spill peak {spill_gb:.1f} GB exceeds cap"
    assert not offenders, (
        "oracle results that hash as negative zero "
        f"at {sf_dir}:\n" + "\n".join(offenders)
    )
