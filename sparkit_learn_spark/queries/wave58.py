"""Round-6 wave 58: growth accounting (monthly new/retained/
resurrected/churned user decomposition), embedding-space drift
between corpus halves, and the Hurst exponent via rescaled-range
analysis. All exactly DuckDB-oracled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_growth_accounting",
    oracle="""
    WITH um AS (
        SELECT DISTINCT user_id,
               date_trunc('month', ts) AS m
        FROM events),
    f AS (SELECT user_id, MIN(m) AS first_m FROM um GROUP BY user_id),
    states AS (
        SELECT cur.m,
               CAST(SUM(CASE WHEN f.first_m = cur.m THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_users,
               CAST(SUM(CASE WHEN f.first_m < cur.m
                             AND prev.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS retained,
               CAST(SUM(CASE WHEN f.first_m < cur.m
                             AND prev.user_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS resurrected
        FROM um cur
        JOIN f ON f.user_id = cur.user_id
        LEFT JOIN um prev ON prev.user_id = cur.user_id
                         AND prev.m = cur.m - INTERVAL 1 MONTH
        GROUP BY cur.m),
    churn AS (
        SELECT prev.m + INTERVAL 1 MONTH AS m,
               CAST(COUNT(*) AS BIGINT) AS churned
        FROM um prev
        LEFT JOIN um cur ON cur.user_id = prev.user_id
                        AND cur.m = prev.m + INTERVAL 1 MONTH
        WHERE cur.user_id IS NULL
        GROUP BY prev.m)
    SELECT s.m AS month, s.new_users, s.retained, s.resurrected,
           COALESCE(c.churned, 0) AS churned,
           s.new_users + s.resurrected - COALESCE(c.churned, 0)
               AS net_growth
    FROM states s LEFT JOIN churn c ON c.m = s.m
    """,
)
def q_evt_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every month's active users decomposed into
    NEW (first month), RETAINED (active last month too), and
    RESURRECTED (active before, absent last month), with CHURNED
    (active last month, absent now) charged to the current month —
    the MAU bridge identity (ΔMAU = new + resurrected − churned)
    every growth team reports, which a bare MAU line hides. Exact
    set logic on (user, month) presence.

    Scale: presence collapses to (user, month) grain first; the
    state classification is one self-join on the adjacent month at
    that grain plus the per-user first-month dimension — no
    event-grain work after the initial distinct."""
    e = load_table(spark, sf_dir, "events")
    um = e.select(
        "user_id", F.date_trunc("month", "ts").alias("m")
    ).distinct()
    f = um.groupBy("user_id").agg(F.min("m").alias("first_m"))
    prev = um.select(
        F.col("user_id").alias("pu"),
        (F.col("m") + F.expr("interval 1 month")).alias("pm"),
    )
    cur = um.join(f, "user_id").join(
        prev,
        (F.col("pu") == F.col("user_id")) & (F.col("pm") == F.col("m")),
        "left",
    )
    states = cur.groupBy("m").agg(
        F.sum(
            F.when(F.col("first_m") == F.col("m"), 1).otherwise(0)
        ).alias("new_users"),
        F.sum(
            F.when(
                (F.col("first_m") < F.col("m")) & F.col("pu").isNotNull(), 1
            ).otherwise(0)
        ).alias("retained"),
        F.sum(
            F.when(
                (F.col("first_m") < F.col("m")) & F.col("pu").isNull(), 1
            ).otherwise(0)
        ).alias("resurrected"),
    )
    nxt = um.select(
        F.col("user_id").alias("nu"),
        F.col("m").alias("nm"),
    )
    churn = (
        um.join(
            nxt,
            (F.col("nu") == F.col("user_id"))
            & (F.col("nm") == F.col("m") + F.expr("interval 1 month")),
            "left",
        )
        .filter(F.col("nu").isNull())
        .groupBy((F.col("m") + F.expr("interval 1 month")).alias("m"))
        .agg(F.count("*").alias("churned"))
    )
    return (
        states.join(churn, "m", "left")
        .select(
            F.col("m").alias("month"),
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).alias("churned"),
            (
                F.col("new_users")
                + F.col("resurrected")
                - F.coalesce("churned", F.lit(0))
            ).alias("net_growth"),
        )
    )


@register(
    "q_ml_embedding_drift",
    oracle="""
    WITH tagged AS (
        SELECT CASE WHEN vec_id * 2 < (SELECT MAX(vec_id) + 1
                                       FROM embeddings)
                    THEN 'first_half' ELSE 'second_half' END AS half,
               embedding
        FROM embeddings),
    comp AS (
        SELECT half, CAST(u.i AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(embedding[CAST(u.i AS INT)]
                                   AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*), 6) AS c
        FROM tagged,
             unnest(range(1, len(embedding) + 1)) AS u(i)
        GROUP BY half, u.i),
    delta AS (
        SELECT a.dim,
               CAST(ROUND(1e9 * (a.c - b.c) * (a.c - b.c)) AS BIGINT)
                   AS d2_u
        FROM comp a JOIN comp b ON b.dim = a.dim
        WHERE a.half = 'first_half' AND b.half = 'second_half')
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           ROUND(SQRT(SUM(d2_u) / 1e9), 6) AS centroid_shift_l2
    FROM delta
    """,
)
def q_ml_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift: the L2 distance between the centroid of
    the corpus's first half and its second half (by vector id — the
    ingestion-order proxy) — the cheap canary that an embedding
    model version changed or the content distribution moved, which
    silently breaks fixed ANN thresholds. Centroid components use
    the order-free DECIMAL(38,12) sum (as q_ml_silhouette); squared
    component deltas quantize to nano-units before the final sum.

    Scale: one component-grain aggregate per half (map-side
    combining) then d-row arithmetic — no pairwise anything; run per
    day/source at 100 TB for a drift time series."""
    emb = load_table(spark, sf_dir, "embeddings")
    mx = emb.agg((F.max("vec_id") + 1).alias("n"))
    tagged = emb.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("vec_id") * 2 < F.col("n"), "first_half")
        .otherwise("second_half")
        .alias("half"),
        "embedding",
    )
    comp = (
        tagged.select("half", F.posexplode("embedding").alias("p", "x"))
        .groupBy("half", (F.col("p") + 1).alias("dim"))
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("c")
        )
    )
    a = comp.filter(F.col("half") == "first_half").select(
        "dim", F.col("c").alias("ca")
    )
    b = comp.filter(F.col("half") == "second_half").select(
        "dim", F.col("c").alias("cb")
    )
    delta = a.join(b, "dim").select(
        F.round(1e9 * (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
        .cast("long")
        .alias("d2_u")
    )
    return delta.agg(
        F.count("*").alias("n_dims"),
        F.round(F.sqrt(F.sum("d2_u") / 1e9), 6).alias("centroid_shift_l2"),
    )


_SCALES = [8, 16, 32, 64]
_LN_S = {s: math.log(s) for s in _SCALES}
_LN_MEAN = sum(_LN_S.values()) / 4
_LN_DEN = sum((v - _LN_MEAN) ** 2 for v in _LN_S.values())


def _hurst_scale_sql(s: int) -> str:
    return f"""
    SELECT {s} AS scale, blk,
           CAST(ROUND(1e6 *
               (MAX(cum) - MIN(cum))
               / SQRT(SUM(dev * dev) / {s}.0)) AS BIGINT) AS rs_u
    FROM (
        SELECT blk, i, dev,
               SUM(dev) OVER (PARTITION BY blk ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM (
            SELECT (i - 1) // {s} AS blk, i,
                   v - AVG(v) OVER (PARTITION BY (i - 1) // {s}) AS dev
            FROM s
            WHERE i <= ((SELECT COUNT(*) FROM s) // {s}) * {s}))
    GROUP BY blk
    HAVING SUM(dev * dev) > 0
    """


@register(
    "q_ts_hurst",
    oracle=f"""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(FLOOR(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          / 100.0) AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    s AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS i,
               CAST(rev AS DOUBLE) AS v
        FROM day),
    rs AS ({_hurst_scale_sql(8)} UNION ALL {_hurst_scale_sql(16)}
           UNION ALL {_hurst_scale_sql(32)} UNION ALL {_hurst_scale_sql(64)}),
    per_scale AS (
        SELECT scale, ROUND(SUM(rs_u) / COUNT(*) / 1e6, 6) AS mean_rs
        FROM rs GROUP BY scale),
    fit AS (
        SELECT SUM((LN(CAST(scale AS DOUBLE)) - {_LN_MEAN!r})
                   * LN(mean_rs)) / {_LN_DEN!r} AS hurst
        FROM per_scale)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_scale) AS n_scales,
           ROUND(f.hurst, 6) AS hurst_exponent
    FROM fit f
    """,
)
def q_ts_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis: the daily
    revenue series cut into disjoint blocks at scales 8/16/32/64,
    each block's range-of-cumulative-deviations over its standard
    deviation averaged per scale, and H fitted as the log-log slope
    (centered-ln literals precomputed identically for both engines) —
    H ≈ 0.5 is memoryless, H > 0.5 long-range persistent (trends
    feed trends), H < 0.5 mean-reverting; the long-memory diagnostic
    beyond ACF's short lags. Block R/S values quantize to micro-units
    before the per-scale mean.

    Scale: blocks live at day grain; each scale is an independent
    block-partitioned window pass over the tiny series, and the fit
    is four rows."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "cast(floor(sum(cast(round(o_totalprice * 100) as bigint))"
            " / 100.0) as bigint)"
        ).alias("rev")
    )
    s = day.select(
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.col("rev").cast("double").alias("v"),
    )
    n_total = s.agg(F.count("*").alias("n"))
    rs_frames = []
    for sc in _SCALES:
        blk = F.floor((F.col("i") - 1) / sc)
        t = (
            s.crossJoin(F.broadcast(n_total))
            .filter(F.col("i") <= F.expr(f"(n div {sc}) * {sc}"))
            .select("i", "v", blk.alias("blk"))
        )
        wpart = Window.partitionBy("blk")
        wcum = Window.partitionBy("blk").orderBy("i").rowsBetween(
            Window.unboundedPreceding, 0
        )
        dev = F.col("v") - F.avg("v").over(wpart)
        t2 = t.select("blk", dev.alias("dev"), F.sum(dev).over(wcum).alias("cum"))
        rs = (
            t2.groupBy("blk")
            .agg(
                F.max("cum").alias("mx"),
                F.min("cum").alias("mn"),
                F.sum(F.col("dev") * F.col("dev")).alias("ss"),
            )
            .filter(F.col("ss") > 0)
            .select(
                F.lit(sc).alias("scale"),
                F.round(
                    1e6
                    * (F.col("mx") - F.col("mn"))
                    / F.sqrt(F.col("ss") / float(sc))
                )
                .cast("long")
                .alias("rs_u"),
            )
        )
        rs_frames.append(rs)
    rs_all = rs_frames[0]
    for fr in rs_frames[1:]:
        rs_all = rs_all.unionByName(fr)
    per_scale = rs_all.groupBy("scale").agg(
        F.round(F.sum("rs_u") / F.count("*") / 1e6, 6).alias("mean_rs")
    )
    fit = per_scale.agg(
        (
            F.sum(
                (F.log(F.col("scale").cast("double")) - F.lit(_LN_MEAN))
                * F.log("mean_rs")
            )
            / F.lit(_LN_DEN)
        ).alias("hurst"),
        F.count("*").alias("n_scales"),
    )
    return fit.select(
        "n_scales", F.round(F.col("hurst"), 6).alias("hurst_exponent")
    )
