"""UDF surface, wave 2 (round 6): polymorphic Python UDTF — the
schema is computed at PLAN TIME by a static analyze() from the call's
literal arguments (Spark 4), completing the UDTF ladder
(mapInPandas-shaped → fixed-schema @udtf → analyze-polymorphic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_udtf_analyze",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS bucket_0,
             CAST(FLOOR(o_totalprice / 200000) AS BIGINT) AS bucket_1
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT bucket_0) AS BIGINT) AS n_b0,
           CAST(COUNT(DISTINCT bucket_1) AS BIGINT) AS n_b1,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY o_orderpriority
    """,
)
def q_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF: analyze() receives the call's literal
    arguments at plan time and RETURNS THE OUTPUT SCHEMA — here one
    bucket column per requested width, so `bucketize(price, 100000,
    200000)` and a 3-width call produce different shapes from one
    implementation. eval() then emits per-row bucket indices. The
    oracle recomputes the same FLOOR arithmetic in SQL.

    Scale: UDTFs run per-partition in Arrow-fed Python workers; the
    polymorphism is resolved ONCE at plan time (no per-row schema
    cost). Keep eval() row-light — heavy math belongs in mapInArrow."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import LongType, StructType

    class Bucketize:
        @staticmethod
        def analyze(price: AnalyzeArgument, *widths: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(len(widths)):
                schema = schema.add(f"bucket_{i}", LongType())
            return AnalyzeResult(schema=schema)

        def eval(self, price, *widths):
            yield tuple(int(price // w) for w in widths)

    spark.udtf.register("bucketize", udtf(Bucketize))
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_v")
    b = spark.sql("""
        SELECT o.o_orderpriority, t.bucket_0, t.bucket_1
        FROM orders_v o,
        LATERAL bucketize(o.o_totalprice, 100000, 200000) t
    """)
    return b.groupBy("o_orderpriority").agg(
        F.countDistinct("bucket_0").alias("n_b0"),
        F.countDistinct("bucket_1").alias("n_b1"),
        F.count("*").alias("n"),
    )
