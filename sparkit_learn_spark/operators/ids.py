"""Distributed stable-id assignment (the zipWithIndex shape, in
DataFrame terms).

The naive ``row_number() OVER (ORDER BY col)`` funnels every distinct
value through ONE task — fine for a post-shrink vocabulary of 10⁴
terms, fatal for a 100 TB web corpus with 10⁸+ distinct terms. This
module keeps id assignment distributed:

  1. range-repartition + sort within partitions on the key — range
     partition i holds keys strictly below partition i+1's, so
     (partition, local rank) lexicographic order IS global sorted
     order;
  2. ``monotonically_increasing_id`` stamps a per-partition-consecutive
     counter in that sorted order;
  3. ONE tiny aggregate (one row per partition — bounded by cluster
     parallelism, never by data) yields per-partition counts, whose
     driver-side cumulative sum becomes the partition offset;
  4. a broadcast join repairs local counters into dense global ids.

The driver holds O(num_partitions) integers — the same contract as
RDD.zipWithIndex — and the output ids are exactly
``row_number() OVER (ORDER BY key) - 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stable_sorted_ids(df: DataFrame, col: str, *, id_col: str = "term_id",
                      num_partitions: int | None = None) -> DataFrame:
    """Assign dense ids 0..n-1 to the DISTINCT values of ``col`` in
    ascending sort order, without a single-partition window.

    Returns a DataFrame (col, id_col). Values must be unique (pass a
    distinct projection); ties would make local order non-deterministic.
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # persist: the lineage below is consumed twice (offset aggregate +
    # final join) and monotonically_increasing_id is nondeterministic —
    # both consumers MUST see one materialization, not two evaluations
    d = (
        df.select(col)
        .repartitionByRange(n_parts, F.col(col))
        .sortWithinPartitions(col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mono", F.monotonically_increasing_id())
        .persist()
    )
    # one row per partition: count + the partition's first counter value
    part_rows = sorted(
        d.groupBy("_pid").agg(
            F.count("*").alias("_cnt"), F.min("_mono").alias("_min")
        ).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, running = [], 0
    for r in part_rows:
        offsets.append((r["_pid"], running, r["_min"]))
        running += r["_cnt"]
    off_df = spark.createDataFrame(offsets, schema="_pid int, _off long, _min long")
    out = d.join(F.broadcast(off_df), "_pid").select(
        col,
        (F.col("_off") + F.col("_mono") - F.col("_min")).cast("long").alias(id_col),
    )
    # lifecycle: materialize the (col, id) result eagerly (it is the
    # id-assignment output — one narrow projection, vocab-sized in
    # practice), then RELEASE the persisted intermediate before
    # returning so repeated fits don't accumulate cached blocks. The
    # checkpointed result's storage is reclaimed by Spark's
    # ContextCleaner once the returned DataFrame is dropped.
    out = out.localCheckpoint(eager=True)
    d.unpersist()
    return out
