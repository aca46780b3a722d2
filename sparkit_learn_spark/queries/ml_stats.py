"""Statistical ML operators with exact SQL forms (q_ml_variance_threshold,
q_ml_standard_scale, q_ml_gaussian_nb_stats, q_ml_linreg_1d).

Reference parity: these are the estimators whose distributed math is
pure sufficient statistics — the reference reduced per-block
count/sum/sumsq to the driver [ref: splearn/feature_selection,
naive_bayes.py GaussianNB, linear_model/base.py · C:H/M]; here each
is ONE distributed aggregate, exactly expressible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form embedding matrix: (vec_id, label, dim, val-as-double)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    ).withColumn("val", F.col("val").cast("double"))


@register(
    "q_ml_variance_threshold",
    oracle="""
    WITH dims AS (
      SELECT u.i - 1 AS dim, CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    )
    SELECT CAST(dim AS INT) AS dim, ROUND(VAR_SAMP(val), 6) AS variance
    FROM dims GROUP BY dim
    HAVING VAR_SAMP(val) > 0.015
    """,
)
def q_ml_variance_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VarianceThreshold feature selection over embedding dims:
    posexplode -> per-dim var_samp -> keep > τ. One shuffle keyed by
    dim (64 keys; at larger dim counts still trivially parallel).
    [ref: splearn/feature_selection · C:M]; sklearn-checked in
    tests/test_ml.py."""
    dims = _dims(spark, sf_dir)
    return (
        dims.groupBy("dim")
        .agg(F.var_samp("val").alias("_v"))
        .filter(F.col("_v") > 0.015)
        .select("dim", F.round("_v", 6).alias("variance"))
    )


@register(
    "q_ml_standard_scale",
    oracle="""
    WITH stats AS (
      SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sigma FROM events
    )
    SELECT e.event_id,
           ROUND((e.value - s.mu) / s.sigma, 6) AS value_scaled
    FROM events e, stats s
    """,
)
def q_ml_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler: global mean/std via a 1-row aggregate broadcast
    back over the data (crossJoin with a broadcast single row — no
    window, no second scan of unaggregated data)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        ev.crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias(
                "value_scaled"
            ),
        )
    )


@register(
    "q_ml_gaussian_nb_stats",
    oracle="""
    WITH dims AS (
      SELECT label, u.i - 1 AS dim, CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    )
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT)   AS n,
           ROUND(AVG(val), 6)         AS mean_val,
           ROUND(VAR_POP(val), 6)     AS var_val
    FROM dims GROUP BY label, dim
    """,
)
def q_ml_gaussian_nb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GaussianNB sufficient statistics: per-(class, dim) count, mean,
    population variance — the exact inputs to sklearn GaussianNB's
    theta_/var_ (which uses ddof=0). The reference merged these with
    Chan et al. parallel-variance combine [ref: splearn/naive_bayes.py
    · C:H]; Spark's var_pop does the same merge internally."""
    dims = _dims(spark, sf_dir)
    return dims.groupBy("label", "dim").agg(
        F.count("*").alias("n"),
        F.round(F.avg("val"), 6).alias("mean_val"),
        F.round(F.var_pop("val"), 6).alias("var_val"),
    )


@register(
    "q_ml_linreg_1d",
    oracle="""
    SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(COUNT(*) AS BIGINT)                              AS n
    FROM lineitem
    """,
)
def q_ml_linreg_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-feature OLS (price ~ quantity) via the closed form —
    regr_slope/intercept/r2 are single-pass distributed aggregates in
    both engines. This replaces the reference's parameter-averaging
    approximation [ref: splearn/linear_model/base.py _spark_fit · C:H]
    with the exact solution (SURVEY §3.1 EP3 caveat)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.count("*").alias("n"),
    )
