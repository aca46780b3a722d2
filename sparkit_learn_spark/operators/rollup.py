"""Hypertable-style time rollup: multi-granularity continuous
aggregates over an event-time column in ONE pass.

rollup(coarse → fine) produces every prefix level — (day, hour),
(day), () — exactly the hierarchy a time-series store materializes
as cascaded continuous aggregates, computed here by Catalyst's
Expand + single shuffle instead of N separate jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: granularity name -> date_trunc unit, ordered coarse -> fine
_UNITS = {"year": "year", "month": "month", "week": "week",
          "day": "day", "hour": "hour", "minute": "minute"}


def time_rollup(df: DataFrame, *, ts_col: str,
                levels: Sequence[str] = ("day", "hour"),
                dims: Sequence[str] = (),
                aggs: Sequence[Column] | None = None) -> DataFrame:
    """Roll ``df`` up over the time hierarchy ``levels`` (coarse →
    fine) plus optional categorical ``dims``. Subtotal rows carry NULL
    in the finer levels (standard ROLLUP semantics)."""
    for lv in levels:
        if lv not in _UNITS:
            raise ValueError(f"unknown level {lv!r}; choose from {sorted(_UNITS)}")
    if aggs is None:
        aggs = [F.count("*").alias("n_rows")]
    buckets = [
        F.date_trunc(_UNITS[lv], F.col(ts_col)).alias(f"bucket_{lv}")
        for lv in levels
    ]
    prepared = df.select(*buckets, *dims, "*")
    keys = [f"bucket_{lv}" for lv in levels] + list(dims)
    return prepared.rollup(*keys).agg(*aggs)
