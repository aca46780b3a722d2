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
