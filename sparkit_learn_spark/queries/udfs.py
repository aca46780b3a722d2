"""UDF / UDAF / UDTF surface (q_udf_*, q_udaf_*, q_udtf_*).

This family is the modern descendant of the reference's blocked-RDD
API: ``mapInPandas`` receives an iterator of Arrow record batches —
exactly `block()`'s ≤bsize local matrices [ref: splearn/rdd.py
block()/ArrayRDD.transform · C:H]; ``applyInPandas`` is
`DictRDD.transform(fn, column=...)` per group. Arrow batching keeps
the Python crossing amortized (SURVEY §4: pandas_udf ≫ row UDF).

Each query here is intentionally expressible in SQL so the oracle can
verify the UDF machinery end-to-end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..catalog import load_table
from ..registry import register


@register(
    "q_udf_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS tier
    FROM orders
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path — kept in the inventory
    to prove the surface; every hot-path use should be q_udf_pandas)."""

    @F.udf(returnType=StringType())
    def tier(price: float) -> str:
        if price >= 300000:
            return "high"
        if price >= 100000:
            return "mid"
        return "low"

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice", tier("o_totalprice").alias("tier"))


@register(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS discounted
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf over Arrow batches (numpy math on
    a whole batch per call — the reference's block vectorization)."""

    @F.pandas_udf(DoubleType())
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return (price * (1.0 - disc)).round(6)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    )


@register(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
             AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf: quantity-weighted mean price per flag."""

    @F.pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("weighted_avg_price")
    )


@register(
    "q_udtf_mapinpandas",
    oracle="""
    WITH stats AS (
      SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sigma FROM events
    )
    SELECT e.event_id, ROUND(e.value, 6) AS value,
           ROUND((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e, stats s
    """,
)
def q_udtf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas block transform — the literal ArrayRDD.transform
    equivalent: iterator of Arrow batches in, batches out, with
    driver-computed global stats closed over (the reference's
    broadcast-fitted-state pattern [ref: splearn/base.py
    SparkBroadcasterMixin · C:H]). Two scalars cross the driver —
    bounded state, scale-safe."""
    ev = load_table(spark, sf_dir, "events")
    mu, sigma = ev.agg(
        F.avg("value"), F.stddev_samp("value")
    ).first()

    def zscore_batches(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "value": pdf["value"].round(6),
                    "zscore": ((pdf["value"] - mu) / sigma).round(6),
                }
            )
            yield out

    return ev.select("event_id", "value").mapInPandas(
        zscore_batches, schema="event_id long, value double, zscore double"
    )


@register(
    "q_udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6)
             AS value_norm
    FROM events
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group standardization — DictRDD.transform per
    group [ref: splearn/rdd.py DictRDD.transform · C:H]. Each group
    arrives as one pandas DataFrame; pandas std() is ddof=1 =
    STDDEV_SAMP."""
    ev = load_table(spark, sf_dir, "events")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std()
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value_norm": ((pdf["value"] - mu) / sigma).round(6),
            }
        )

    return (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(normalize, schema="event_id long, event_type string, value_norm double")
    )


@register(
    "q_udtf_lateral",
    oracle="""
    SELECT o.o_orderkey, t.tier, t.threshold
    FROM orders o,
         (VALUES ('high', 300000.0), ('mid', 100000.0), ('low', 0.0))
           AS t(tier, threshold)
    WHERE o.o_totalprice >= t.threshold
    """,
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (Spark 4 @udtf): one input row -> N output
    rows (every price tier the order qualifies for), applied laterally
    in SQL. Completes the UDF family alongside scalar/pandas/grouped
    forms; row-at-a-time Python, so inventory coverage — a production
    explode would be the built-in generator (q_array_explode)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tier string, threshold double")
    class TierExplode:
        def eval(self, price: float):
            for tier, threshold in (("high", 300000.0), ("mid", 100000.0), ("low", 0.0)):
                if price >= threshold:
                    yield tier, threshold

    spark.udtf.register("tier_explode", TierExplode)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.tier, t.threshold
        FROM orders o, LATERAL tier_explode(o.o_totalprice) AS t
        """
    )


@register(
    "q_udf_mapinarrow",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                  AS n_cp,
           CAST(len(string_split(text, ' ')) AS BIGINT)  AS n_tokens
    FROM documents
    """,
)
def q_udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy end of the Python UDF spectrum: the
    function receives raw pyarrow RecordBatches (no pandas
    materialization at all) and computes with Arrow compute kernels
    (C++-vectorized). Complements q_udtf_mapinpandas, which pays the
    Arrow→pandas conversion this path skips.

    Scale: a pure map — no shuffle, one Arrow batch in flight per
    task, per-row Python never runs (the kernels execute in native
    code over whole batches). The cheapest possible shape for custom
    Python logic at 100 TB."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def features(batches):
        for b in batches:
            t = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                    pc.cast(pc.add(pc.count_substring(t, " "), 1),
                            pa.int64()),
                ],
                ["doc_id", "n_cp", "n_tokens"],
            )

    return d.mapInArrow(
        features, "doc_id long, n_cp long, n_tokens long")
