"""Distributed global row numbering.

``Window.orderBy`` without a PARTITION BY collapses the whole input
into ONE task (Spark plans it as ``Window [SinglePartition]``) — fine
at fixture SF, a guaranteed straggler at 100 TB. This operator
computes the same 1-based global row number with no single-partition
stage, using the classic two-pass construction every distributed
engine uses for dense ranking:

1. range-partition + sort by the (total) order key — a distributed
   sort, the same cost a global ORDER BY pays;
2. one metadata-sized pass collects per-partition row counts and
   turns them into cumulative offsets (#partitions scalars to the
   driver, nothing data-grain);
3. a per-partition Arrow pass assigns offset + local position.

The partitioned frame is pinned with an eager localCheckpoint between
the passes so both see the identical partitioning (range boundaries
come from sampling; re-running the lineage could re-draw them).

Determinism contract: the order key must be a TOTAL order (callers
append a unique tiebreak column) — with ties the assignment inside a
tie group would be partitioning-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_row_number(df: DataFrame, order_by: list[Column | str],
                      *, name: str = "rn",
                      num_partitions: int | None = None) -> DataFrame:
    """Add a 1-based global row number column ``name`` ordered by
    ``order_by`` (which must be a total order), without ever planning
    a SinglePartition window. Returns the input columns + ``name``.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    in_cols = df.columns
    if "_pid" in in_cols:
        raise ValueError(
            "global_row_number: input already has a '_pid' column "
            "(reserved internal name) — rename it first")
    if name in in_cols:
        raise ValueError(
            f"global_row_number: output column {name!r} already exists "
            "in the input — pass a different name=")
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    part = part.sortWithinPartitions(*cols).withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)

    counts = part.groupBy("_pid").count().collect()  # one row per partition
    sizes = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    schema = part.drop("_pid").schema.add(name, "long")

    def assign(batches):
        base = None
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out[name] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield out

    out = part.mapInPandas(assign, schema=schema)
    return out.select(*in_cols, name)
