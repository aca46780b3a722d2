"""Sequence packing: lay documents end-to-end in id order and chunk
the token stream into fixed-budget training sequences (the
concat-and-chunk packing every LLM data loader performs, computed
once at preprocessing time so the loader becomes a pure range read).

The core is a GLOBAL cumulative sum in sorted order — the classic
single-task trap: ``SUM() OVER (ORDER BY id)`` with no partition key
funnels the whole table through one window task. This module computes
it distributed, the same two-phase shape as operators/ids.py:

  1. range-repartition + sort-within-partitions on the id (range
     partition i holds ids strictly below partition i+1's);
  2. per-partition LOCAL cumulative sums (window partitioned by the
     physical partition id — parallel);
  3. one row per partition (its total weight) to the driver; the
     cumulative sum of THOSE (O(num_partitions) integers) becomes
     each partition's global offset;
  4. broadcast-join the offsets back: global offset = partition
     offset + local cumsum.

The sorted intermediate is persisted for the two consumers (range
boundaries are sampled, so re-evaluation could repartition
differently) and released before returning, with the result eagerly
checkpointed — the ids.py lifecycle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_offsets(df: DataFrame, id_col: str, weight_col: str,
                           *, num_partitions: int | None = None) -> DataFrame:
    """(id_col, weight_col, start_offset) where start_offset is the
    sum of ``weight_col`` over all rows with smaller ``id_col`` —
    an exclusive prefix sum in id order, computed without any
    single-partition window. Ids must be unique."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    d = (
        df.select(id_col, weight_col)
        .repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        part_rows = sorted(
            d.groupBy("_pid").agg(F.sum(weight_col).alias("_tot")).collect(),
            key=lambda r: r["_pid"],
        )
        offsets, running = [], 0
        for r in part_rows:
            offsets.append((r["_pid"], running))
            running += r["_tot"]
        off_df = spark.createDataFrame(offsets, schema="_pid int, _off long")
        w = Window.partitionBy("_pid").orderBy(id_col)
        local_excl = F.sum(weight_col).over(w) - F.col(weight_col)
        out = (
            d.join(F.broadcast(off_df), "_pid")
            .select(
                id_col,
                weight_col,
                (F.col("_off") + local_excl).cast("long").alias("start_offset"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        d.unpersist()
    return out


def pack_sequences(docs: DataFrame, *, id_col: str = "doc_id",
                   weight_col: str = "n_tokens",
                   budget: int = 512) -> DataFrame:
    """Assign each document its token range in the packed stream:
    (id, n_tokens, start_offset, bin_id, bin_end) with
    bin_id = start_offset // budget. A document whose tokens straddle
    a budget boundary spans bins [bin_id, bin_end] — exactly the
    concat-and-chunk semantics (loaders split it across sequences);
    filter bin_end == bin_id for whole-doc-per-sequence policies."""
    off = global_running_offsets(docs, id_col, weight_col)
    return off.select(
        id_col,
        weight_col,
        "start_offset",
        F.floor(F.col("start_offset") / budget).alias("bin_id"),
        F.floor((F.col("start_offset") + F.col(weight_col) - 1) / budget)
        .alias("bin_end"),
    )
