"""Round-6 wave 83: a price-volume-mix revenue bridge (the FP&A
period-over-period decomposition, exact per-segment arithmetic) and
a delete-one-group jackknife CI for a ratio metric (the resampling
alternative to the bootstrap, deterministic hash buckets). Both
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_fin_price_volume_mix",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS seg,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1
                    ELSE 0 END AS per,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'),
    g AS (
        SELECT seg, per, CAST(COUNT(*) AS BIGINT) AS v,
               CAST(SUM(cents) AS BIGINT) AS r
        FROM base GROUP BY seg, per),
    tot AS (
        SELECT CAST(SUM(CASE WHEN per = 0 THEN v END) AS BIGINT) AS v0t,
               CAST(SUM(CASE WHEN per = 1 THEN v END) AS BIGINT) AS v1t
        FROM g),
    wide AS (
        SELECT a.seg, a.v AS v0, a.r AS r0, b.v AS v1, b.r AS r1
        FROM g a JOIN g b ON a.seg = b.seg
        WHERE a.per = 0 AND b.per = 1),
    fx AS (
        SELECT w.seg, w.v0, w.v1, w.r0, w.r1, t.v0t, t.v1t,
               CAST(w.r0 AS DOUBLE) / w.v0 AS p0,
               CAST(w.r1 AS DOUBLE) / w.v1 AS p1
        FROM wide w CROSS JOIN tot t)
    SELECT seg, v0, v1,
           ROUND((r1 - r0) / 100.0, 6) AS delta_revenue,
           ROUND((p1 - p0) * v1 / 100.0 + 0.0, 6) AS price_effect,
           ROUND(p0 * v0 * (CAST(v1t AS DOUBLE) / v0t - 1.0) / 100.0
                 + 0.0, 6) AS volume_effect,
           ROUND((v1 - v0 * CAST(v1t AS DOUBLE) / v0t) * p0 / 100.0
                 + 0.0, 6) AS mix_effect
    FROM fx
    ORDER BY seg
    """,
)
def q_fin_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge (1997 → 1998, by order
    priority): each segment's revenue change decomposes into a price
    effect (p₁−p₀)·v₁, a pure volume effect p₀·v₀·(V₁/V₀−1) at
    constant mix, and a mix-shift effect (v₁−v₀·V₁/V₀)·p₀ — the
    three terms sum to ΔR per segment by algebraic identity. The
    FP&A waterfall behind every "why did revenue move" review. Each
    segment row derives from its own exact integer sums with single
    divisions — no cross-segment float summation at all.

    Scale: one filtered hash aggregate to (segment, period) grain,
    a 2-row totals broadcast, 5-row arithmetic after.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select(
        F.col("o_orderpriority").alias("seg"),
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .cast("int")
        .alias("per"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("seg", "per").agg(
        F.count(F.lit(1)).alias("v"), F.sum("cents").alias("r")
    )
    tot = g.agg(
        F.sum(F.when(F.col("per") == 0, F.col("v"))).alias("v0t"),
        F.sum(F.when(F.col("per") == 1, F.col("v"))).alias("v1t"),
    )
    a = g.filter(F.col("per") == 0).select(
        "seg", F.col("v").alias("v0"), F.col("r").alias("r0")
    )
    b = g.filter(F.col("per") == 1).select(
        "seg", F.col("v").alias("v1"), F.col("r").alias("r1")
    )
    fx = a.join(b, "seg").crossJoin(F.broadcast(tot))
    p0 = F.col("r0").cast("double") / F.col("v0")
    p1 = F.col("r1").cast("double") / F.col("v1")
    ratio = F.col("v1t").cast("double") / F.col("v0t")
    return fx.select(
        "seg",
        "v0",
        "v1",
        F.round((F.col("r1") - F.col("r0")) / 100.0, 6).alias(
            "delta_revenue"
        ),
        F.round((p1 - p0) * F.col("v1") / 100.0, 6).alias("price_effect"),
        F.round(p0 * F.col("v0") * (ratio - 1.0) / 100.0, 6).alias(
            "volume_effect"
        ),
        F.round(
            (F.col("v1") - F.col("v0") * ratio) * p0 / 100.0, 6
        ).alias("mix_effect"),
    ).orderBy("seg")


_N_JK = 32
_JHASH = "((user_id * 2654435761 + 9973) % 4294967296) % 32"


@register(
    "q_stat_jackknife_ci",
    oracle=f"""
    WITH per_bucket AS (
        SELECT {_JHASH} AS g,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(n) AS BIGINT) AS nt,
               CAST(COUNT(*) AS BIGINT) AS gn
        FROM per_bucket),
    pseudo AS (
        SELECT CAST(ROUND((t.gn * (CAST(t.st AS DOUBLE) / t.nt)
                           - (t.gn - 1)
                             * (CAST(t.st - b.s AS DOUBLE)
                                / (t.nt - b.n))) * 1000000)
                    AS BIGINT) AS p6
        FROM per_bucket b CROSS JOIN tot t),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS gn,
               CAST(SUM(p6) AS BIGINT) AS sp,
               SUM(CAST(p6 AS DECIMAL(38, 0)) * CAST(p6 AS DECIMAL(38, 0)))
                   AS spp
        FROM pseudo)
    SELECT t.gn AS n_buckets,
           ROUND(CAST(t.st AS DOUBLE) / t.nt / 100.0, 6)
               AS theta_cents_per_event,
           ROUND(CAST(a.sp AS DOUBLE) / a.gn / 1000000.0 / 100.0, 6)
               AS jk_estimate,
           ROUND(SQRT((CAST(a.spp AS DOUBLE)
                       - CAST(a.sp AS DOUBLE) * a.sp / a.gn)
                      / (a.gn - 1) / a.gn) / 1000000.0 / 100.0, 6)
               AS jk_se,
           ROUND((CAST(a.sp AS DOUBLE) / a.gn
                  - 1.959964 * SQRT((CAST(a.spp AS DOUBLE)
                        - CAST(a.sp AS DOUBLE) * a.sp / a.gn)
                        / (a.gn - 1) / a.gn)) / 1000000.0 / 100.0, 6)
               AS ci_lo,
           ROUND((CAST(a.sp AS DOUBLE) / a.gn
                  + 1.959964 * SQRT((CAST(a.spp AS DOUBLE)
                        - CAST(a.sp AS DOUBLE) * a.sp / a.gn)
                        / (a.gn - 1) / a.gn)) / 1000000.0 / 100.0, 6)
               AS ci_hi
    FROM tot t CROSS JOIN agg a
    """,
)
def q_stat_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife CI for the ratio metric revenue-
    per-event: users hash into 32 deterministic buckets, each
    leave-one-bucket-out ratio yields a pseudo-value
    p_g = G·θ − (G−1)·θ₋g, and the CI comes from the pseudo-values'
    mean and variance — the resampling scheme BigQuery/Google ads
    pipelines use for ratio metrics where the delta method's
    linearization is suspect. Pseudo-values are micro-quantized
    before the cross-bucket sums (squares in DECIMAL(38,0)).

    Scale: one hash aggregate to 32 bucket rows, constant-size
    arithmetic after — resampling without copying any data, same
    contract as the Poisson bootstrap it complements.
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(F.expr(_JHASH).alias("g")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = per_bucket.agg(
        F.sum("s").alias("st"),
        F.sum("n").alias("nt"),
        F.count(F.lit(1)).alias("gn"),
    )
    pseudo = per_bucket.crossJoin(F.broadcast(tot)).select(
        F.round(
            (
                F.col("gn") * (F.col("st").cast("double") / F.col("nt"))
                - (F.col("gn") - 1)
                * (
                    (F.col("st") - F.col("s")).cast("double")
                    / (F.col("nt") - F.col("n"))
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("p6")
    )
    dec = "decimal(38,0)"
    agg = pseudo.agg(
        F.count(F.lit(1)).alias("gn2"),
        F.sum("p6").alias("sp"),
        F.sum(F.col("p6").cast(dec) * F.col("p6").cast(dec)).alias("spp"),
    )
    se = F.sqrt(
        (
            F.col("spp").cast("double")
            - F.col("sp").cast("double") * F.col("sp") / F.col("gn2")
        )
        / (F.col("gn2") - 1)
        / F.col("gn2")
    )
    mean_p = F.col("sp").cast("double") / F.col("gn2")
    return tot.crossJoin(F.broadcast(agg)).select(
        F.col("gn").alias("n_buckets"),
        F.round(
            F.col("st").cast("double") / F.col("nt") / 100.0, 6
        ).alias("theta_cents_per_event"),
        F.round(mean_p / 1000000.0 / 100.0, 6).alias("jk_estimate"),
        F.round(se / 1000000.0 / 100.0, 6).alias("jk_se"),
        F.round((mean_p - 1.959964 * se) / 1000000.0 / 100.0, 6).alias(
            "ci_lo"
        ),
        F.round((mean_p + 1.959964 * se) / 1000000.0 / 100.0, 6).alias(
            "ci_hi"
        ),
    )
