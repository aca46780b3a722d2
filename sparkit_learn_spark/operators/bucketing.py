"""Bucketed-table co-located joins — the pre-shuffled join strategy
(SURVEY §4.2).

At 100 TB the dominant cost of a fact-fact join is shuffling BOTH
sides on the key, every time the join runs. Spark's bucketed tables
pay that shuffle ONCE at write time: ``bucketBy(n, key)``
hash-partitions rows into a fixed number of bucket files, and a join
of two tables bucketed on the join key with the SAME bucket count
reads co-located buckets directly — the sort-merge join runs with
ZERO Exchange on either side (guarded in tests/test_plans.py). Any
downstream aggregation whose grouping keys include the bucket key
also inherits the partitioning and skips its shuffle.

This is the single biggest lever for a pipeline that joins the same
fact tables repeatedly (dedup pairs ⋈ documents, orders ⋈ customer):
amortize one write-side shuffle across every subsequent run.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 8,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed (and
    optionally sorted) by ``keys`` — the one-time shuffle that makes
    every later equi-join on ``keys`` exchange-free.

    ``sortBy`` on the bucket key additionally lets the sort-merge join
    skip its per-partition Sort. Idempotent (mode=overwrite), so a
    driver re-run at a different scale factor just rewrites the
    buckets.

    NOT re-entrant: DROP TABLE + overwrite mutates shared catalog
    state, so two concurrent writers of the SAME table name race.
    Callers that may run concurrently must namespace the table name
    (e.g. per-scale-factor suffix — see q_join_bucketed).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # The in-memory catalog dies with the session but the warehouse
    # directory survives; an orphaned location makes saveAsTable fail
    # with LOCATION_ALREADY_EXISTS, so clear it explicitly. Driver-side
    # rmtree is only meaningful (and only safe) for a LOCAL warehouse —
    # for hdfs:// / s3a:// warehouses urlparse().path is not a local
    # path, so leave cleanup to the filesystem-aware overwrite.
    uri = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if uri.scheme in ("", "file"):
        orphan = Path(uri.path) / table.lower()
        if orphan.exists():
            shutil.rmtree(orphan)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table; the scan reports the bucket spec so
    Catalyst plans bucket-local joins/aggregations over it."""
    return spark.table(table)
