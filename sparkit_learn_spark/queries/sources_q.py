"""Source-surface queries, wave 2 (round 6): custom Python DataSource
and the VARIANT semi-structured type — the two Spark-4-native
extension points the earlier waves didn't exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_scan_pysource",
    oracle="""
    WITH t AS (
      SELECT i AS id,
             's' || CAST(i % 7 AS VARCHAR) AS sensor,
             (i * 37 % 1000) / 10.0        AS reading,
             i // 100                      AS window_id
      FROM unnest(generate_series(0, 1999)) AS u(i)
    )
    SELECT sensor,
           CAST(COUNT(*) AS BIGINT)    AS n,
           ROUND(AVG(reading), 6)      AS avg_reading,
           CAST(COUNT(DISTINCT window_id) AS BIGINT) AS n_windows
    FROM t GROUP BY sensor
    """,
)
def q_scan_pysource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource read (Spark 4 pyspark.sql.datasource):
    a partitioned deterministic generator source, aggregated — proves
    the full connector path (plan partitions on the driver, read each
    split in parallel Python workers, Arrow back to the JVM). The
    oracle regenerates the same arithmetic table in SQL, so the READ
    path itself is value-verified, not just row-counted.

    Scale: splits are independent row ranges — the same shape a real
    connector uses to parallelize a remote system; no driver data
    path. (sf_dir intentionally unused: the source IS the data.)"""
    from ..sources.pysource import register_telemetry_source

    register_telemetry_source(spark)
    t = (spark.read.format("telemetry")
         .option("rows", 2000).option("parts", 8).load())
    return t.groupBy("sensor").agg(
        F.count("*").alias("n"),
        F.round(F.avg("reading"), 6).alias("avg_reading"),
        F.countDistinct("window_id").alias("n_windows"),
    )


@register(
    "q_json_variant",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4): parse_json once into the binary
    VARIANT encoding, then typed variant_get extraction — the
    schema-on-read path for semi-structured columns that beats
    repeated get_json_object string re-parsing (VARIANT parses once,
    extracts many times; fields prune like columns).

    Scale: parse cost is paid once per row in the scan stage; the
    filter on the extracted field stays in the same codegen stage."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "long").alias("k"),
    )
    return (
        v.filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("sum_k"),
             F.count("*").alias("n"))
    )
