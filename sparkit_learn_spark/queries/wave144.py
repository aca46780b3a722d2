"""Round-8 wave 144: the last two quasi-experimental designs —
regression discontinuity (local linear fit each side of a threshold,
jump = treatment effect) and the instrumental-variable Wald estimator
(effect ratio through an exogenous instrument). With DiD
(q_stat_diff_in_diff), the event study (q_evt_event_study), and
propensity weighting (q_evt_propensity_att) already in the registry,
this completes the standard causal toolkit. Both exactly
DuckDB-oracled: the RDD side fits are closed-form OLS from integer
sufficient statistics; the Wald estimator is a ratio of integer-mean
differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: RDD threshold on the running variable (customer account balance)
#: and the local-fit bandwidth either side.
CUTOFF = 5000
BANDWIDTH = 3000


@register(
    "q_evt_regression_discontinuity",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(ROUND(c.c_acctbal) AS BIGINT) - {CUTOFF} AS x,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y,
               CASE WHEN c.c_acctbal >= {CUTOFF} THEN 1 ELSE 0 END
                   AS side
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_acctbal >= {CUTOFF - BANDWIDTH}
          AND c.c_acctbal < {CUTOFF + BANDWIDTH}),
    s AS (
        SELECT side,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY side),
    fit AS (
        SELECT side, n,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   AS slope,
               (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sxy
                                      - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * sx) / n AS intercept
        FROM s)
    SELECT
        CAST((SELECT n FROM fit WHERE side = 0) AS BIGINT) AS n_below,
        CAST((SELECT n FROM fit WHERE side = 1) AS BIGINT) AS n_above,
        ROUND((SELECT intercept FROM fit WHERE side = 0) / 100, 6)
            AS fit_at_cutoff_below,
        ROUND((SELECT intercept FROM fit WHERE side = 1) / 100, 6)
            AS fit_at_cutoff_above,
        ROUND(((SELECT intercept FROM fit WHERE side = 1)
               - (SELECT intercept FROM fit WHERE side = 0)) / 100, 6)
            AS rdd_jump
    """,
)
def q_evt_regression_discontinuity(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity: customers cross a synthetic
    program threshold at acctbal {CUTOFF}; within ±{BANDWIDTH} of it,
    fit a local line to order value on each side (closed-form OLS
    from integer (n, Σx, Σy, Σxx, Σxy) — x centered at the cutoff, so
    each intercept IS the side's fit at the threshold) and report the
    jump. On this synthetic fixture the true jump is ≈0 — the query
    is the design's PLACEBO form, exactly the check run before
    trusting an RDD estimate elsewhere.

    Scale: one join + one 2-row sufficient-stat aggregate; the
    bandwidth filter pushes to the customer scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"))
    c = load_table(spark, sf_dir, "customer").where(
        (F.col("c_acctbal") >= CUTOFF - BANDWIDTH)
        & (F.col("c_acctbal") < CUTOFF + BANDWIDTH)
    ).select(
        "c_custkey",
        (F.round("c_acctbal").cast("long") - CUTOFF).alias("x"),
        F.when(F.col("c_acctbal") >= CUTOFF, 1).otherwise(0).alias("side"),
    )
    pts = o.join(c, o.o_custkey == c.c_custkey).select("x", "y", "side")
    s = pts.groupBy("side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
    fit = s.select(
        "side", "n",
        ((F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"))
        .alias("intercept"),
    )
    below = fit.where(F.col("side") == 0).select(
        F.col("n").alias("n_below"), F.col("intercept").alias("i0"))
    above = fit.where(F.col("side") == 1).select(
        F.col("n").alias("n_above"), F.col("intercept").alias("i1"))
    return below.crossJoin(above).select(
        "n_below", "n_above",
        F.round(F.col("i0") / 100, 6).alias("fit_at_cutoff_below"),
        F.round(F.col("i1") / 100, 6).alias("fit_at_cutoff_above"),
        F.round((F.col("i1") - F.col("i0")) / 100, 6).alias("rdd_jump"),
    )


@register(
    "q_stat_iv_wald",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_nationkey % 2 AS z FROM customer),
    agg AS (
        SELECT cust.z,
               CAST(COUNT(DISTINCT cust.c_custkey) AS BIGINT) AS n_cust,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100)
                                      AS BIGINT)), 0) AS BIGINT) AS cents
        FROM cust LEFT JOIN orders o ON o.o_custkey = cust.c_custkey
        GROUP BY cust.z),
    wide AS (
        SELECT
            MAX(CASE WHEN z = 1 THEN n_cust END) AS nc1,
            MAX(CASE WHEN z = 0 THEN n_cust END) AS nc0,
            MAX(CASE WHEN z = 1 THEN n_orders END) AS no1,
            MAX(CASE WHEN z = 0 THEN n_orders END) AS no0,
            MAX(CASE WHEN z = 1 THEN cents END) AS s1,
            MAX(CASE WHEN z = 0 THEN cents END) AS s0
        FROM agg)
    SELECT nc1 AS n_cust_z1, nc0 AS n_cust_z0,
           ROUND((CAST(no1 AS DOUBLE) / nc1 - CAST(no0 AS DOUBLE) / nc0),
                 6) AS first_stage,
           ROUND((CAST(s1 AS DOUBLE) / nc1 - CAST(s0 AS DOUBLE) / nc0)
                 / 100, 6) AS reduced_form,
           ROUND((CAST(s1 AS DOUBLE) / nc1 - CAST(s0 AS DOUBLE) / nc0)
                 / (CAST(no1 AS DOUBLE) / nc1 - CAST(no0 AS DOUBLE) / nc0)
                 / 100, 6) AS wald_effect_per_order
    FROM wide
    """,
)
def q_stat_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable Wald estimator: with a binary instrument
    z (nation parity — exogenous by construction here), the effect of
    an extra order on total customer revenue is the reduced-form
    difference divided by the first-stage difference — the
    two-group IV that 2SLS collapses to with one binary instrument.
    Reports both stages and the ratio; a near-zero first stage warns
    the instrument is irrelevant (the weak-instrument check, visible
    in the same row). Every mean is an integer-sum ratio, so the only
    float steps are the final divisions — 6dp-rounded, hash-exact.

    Scale: one left join + one 2-row aggregate; the per-arm means are
    the whole computation."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_nationkey") % 2).alias("z"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    agg = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("z")
        .agg(
            F.count_distinct("c_custkey").alias("n_cust"),
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"),
        )
    )
    wide = agg.agg(
        F.max(F.when(F.col("z") == 1, F.col("n_cust"))).alias("nc1"),
        F.max(F.when(F.col("z") == 0, F.col("n_cust"))).alias("nc0"),
        F.max(F.when(F.col("z") == 1, F.col("n_orders"))).alias("no1"),
        F.max(F.when(F.col("z") == 0, F.col("n_orders"))).alias("no0"),
        F.max(F.when(F.col("z") == 1, F.col("cents"))).alias("s1"),
        F.max(F.when(F.col("z") == 0, F.col("cents"))).alias("s0"),
    )
    fs = (F.col("no1").cast("double") / F.col("nc1")
          - F.col("no0").cast("double") / F.col("nc0"))
    rf = (F.col("s1").cast("double") / F.col("nc1")
          - F.col("s0").cast("double") / F.col("nc0"))
    return wide.select(
        F.col("nc1").alias("n_cust_z1"),
        F.col("nc0").alias("n_cust_z0"),
        F.round(fs, 6).alias("first_stage"),
        F.round(rf / 100, 6).alias("reduced_form"),
        F.round(rf / fs / 100, 6).alias("wald_effect_per_order"),
    )
