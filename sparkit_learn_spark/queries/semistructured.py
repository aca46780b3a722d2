"""Array / map / JSON / explode operators (q_array_*, q_json_funcs,
q_map_funcs).

Higher-order array functions and from_json run JVM-side; explode is
Spark's UDTF-shaped generator (one output row per element, pipelined —
no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType, StructField, StructType

from ..catalog import load_table
from ..functions.vector import dot
from ..registry import register


@register(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)        AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
                                              AS sum_vals,
           ROUND(list_sum(list_transform(list_zip(embedding, embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)
                                              AS sum_squares
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / higher-order transform+aggregate over the
    embedding vector (sum, sum-of-squares ≈ 1.0 for unit vectors).
    All accumulation in double for cross-engine determinism."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    total = F.aggregate(
        F.transform(emb, lambda x: x.cast("double")), F.lit(0.0), lambda a, x: a + x
    )
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
        F.round(total, 6).alias("sum_vals"),
        F.round(dot(emb, emb), 6).alias("sum_squares"),
    )


@register(
    "q_array_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(text)) -> one row per token (generator, no
    shuffle; output pipelines into downstream aggregation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))


@register(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')       AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CAST(json_extract(props, '$.k') AS INT) * 2 AS k_doubled
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object (path extraction) + from_json (typed parse) on
    the events.props JSON column."""
    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    parsed = F.from_json(F.col("props"), schema)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed["k"].alias("k_int"),
        (parsed["k"] * 2).alias("k_doubled"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           json_keys(props)[1]                     AS first_key,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(len(json_keys(props)) AS INT)      AS n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json as MapType -> map_keys / element_at / size."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), MapType(StringType(), IntegerType()))
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )
