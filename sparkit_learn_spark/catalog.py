"""Table catalog: load the driver parquet fixtures as DataFrames.

Schemas per FIXTURES.md. One normalization happens at load time:
``events.ts`` has shipped as TIMESTAMP(NANOS) in some fixture
generations (Spark cannot represent ns: it reads as long under
``nanosAsLong`` and we truncate to microseconds — exactly what DuckDB
does with the same file) and TIMESTAMP(MICROS) in others (reads as
``timestamp_ntz`` directly, no conversion). Both paths yield the same
``timestamp_ntz`` column that hash-matches the oracle; the branch is
on the observed read dtype, never on an assumed file version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_confs

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalize event-time to timestamp_ntz."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-epoch long -> µs truncation (integer div: exact, no double
        # roundtrip — ns epochs exceed 2^53) -> naive timestamp.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread_scan(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Guarantee at least ``defaultParallelism`` partitions ahead of an
    expensive per-row map stage (tokenize/shingle/hash pipelines, blob
    synthesis, BLAS batches). A small parquet fixture is ONE row group,
    so it scans as a single partition and everything before the first
    exchange runs on one core — measured r11: the 8×md5 signature
    aggregate of q_llm_lsh_bucket_stats dropped 1.90 s → 0.89 s at
    sf0.1 from this repartition alone. At corpus scale the input
    already has ≥ parallelism partitions and this is a structural
    no-op; the repartition only fires when the data is small enough
    for its shuffle to be nearly free (the same guard
    operators/similarity._spread has always applied to embeddings).

    ``cap`` (r12) bounds the spread below defaultParallelism for
    stages where full fan-out LOSES: a many-consumer localCheckpoint
    (each consumer pays per-task overhead x partitions — the r11
    negative result on shingle_index at 32 partitions) or a tiny
    Python stage (32 forked workers re-importing numpy for ~100 rows
    each — the r11 q_llm_cosine_topk 32-core inversion). At cluster
    scale the input has >= parallelism partitions and the cap never
    engages."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if cap is not None:
        p = min(p, cap)
    return df.repartition(p) if df.rdd.getNumPartitions() < p else df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql queries)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """SQL entry point: run an arbitrary Spark SQL query against the
    fixture tables (all 10 registered as temp views first). Spark SQL
    *is* the engine's parser/planner — this is the thinnest possible
    facade over it."""
    register_views(spark, sf_dir)
    return spark.sql(query)
