"""Parquet source/sink helpers.

The batch sources live in catalog.py (fixture tables); this module
adds the write path (partitioned sinks) and the Structured-Streaming
file source over the same events data, including the ns-timestamp
normalization that catalog.load_table applies in batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_confs


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Write a DataFrame as parquet. ``partition_by`` produces
    hive-style directory partitioning — the layout that makes
    partition pruning work on re-read (at 100 TB, partition by the
    dominant filter column: date, lang, source...)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file source over events parquet (same schema &
    ns→µs ts normalization as the batch catalog loader), so
    batch≡stream parity tests run the same downstream code. The file
    source needs a directory; pathGlobFilter selects the events file."""
    ensure_runtime_confs(spark)
    # the fixtures have shipped events.ts as both TIMESTAMP(NANOS)
    # (reads as bigint under nanosAsLong) and TIMESTAMP(MICROS)
    # (reads as timestamp_ntz); probe the footer via a batch read —
    # a streaming schema cannot be inferred — and branch like the
    # batch loader does
    ts_type = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes).get("ts")
    cols = "event_id long, {ts}, user_id long, event_type string, value double, props string"
    if ts_type == "bigint":  # ns-precision file
        raw = (
            spark.readStream.schema(cols.format(ts="ts long"))
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        # LTZ (session tz = UTC), not NTZ: watermarks require TIMESTAMP;
        # wall-clock values are identical to the batch loader's NTZ.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(cols.format(ts="ts timestamp_ntz"))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # NTZ -> LTZ cast is wall-clock-identity under the UTC session tz
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file source over documents parquet with a synthetic,
    DETERMINISTIC ingest timestamp (epoch 2024-02-01 + doc_id seconds)
    so watermark/dedup state semantics are testable without a real
    ingest clock — the batch twin derives the identical column, so
    batch ≡ stream parity holds row-for-row."""
    ensure_runtime_confs(spark)
    raw = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ingest_ts", _synthetic_ingest_ts())


def _synthetic_ingest_ts():
    """2024-02-01T00:00:00Z + doc_id seconds (LTZ: watermarks require
    TIMESTAMP, and the session tz is UTC)."""
    return F.timestamp_micros(
        (F.lit(1706745600) + F.col("doc_id")) * F.lit(1_000_000)
    )


def documents_batch_with_ingest_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`read_documents_stream` (same synthetic
    ingest_ts), for stream-parity assertions."""
    from ..catalog import load_table

    return load_table(spark, sf_dir, "documents").withColumn(
        "ingest_ts", _synthetic_ingest_ts()
    )
