"""Round-6 wave 60: position-based (U-shaped) multi-touch
attribution with exact integer credit reconciliation, and
returns-rate analytics per brand. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_multitouch_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'),
    v AS (
        SELECT user_id, ts AS vts FROM events
        WHERE event_type = 'view'),
    touch AS (
        SELECT p.pid, v.vts, p.pts,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY v.vts) AS pos,
               COUNT(*) OVER (PARTITION BY p.pid) AS n
        FROM p JOIN v ON v.user_id = p.user_id
                     AND v.vts < p.pts
                     AND v.vts >= p.pts - INTERVAL 24 HOUR),
    credited AS (
        SELECT pid, vts, pts, pos, n,
               CASE
                 WHEN n = 1 THEN 1000000
                 WHEN n = 2 THEN 500000
                 WHEN pos = 1 OR pos = n THEN 400000
                 ELSE 200000 // (n - 2)
                      + CASE WHEN pos - 1 <= 200000 % (n - 2)
                             THEN 1 ELSE 0 END
               END AS credit_u
        FROM touch),
    banded AS (
        SELECT CASE
                 WHEN pts - vts <= INTERVAL 1 HOUR THEN '0_under_1h'
                 WHEN pts - vts <= INTERVAL 6 HOUR THEN '1_1h_6h'
                 ELSE '2_6h_24h' END AS lag_band,
               credit_u
        FROM credited)
    SELECT lag_band,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit_u) AS BIGINT) AS credit_micro,
           ROUND(SUM(credit_u)
                 / CAST((SELECT SUM(credit_u) FROM credited)
                        AS DOUBLE), 6) AS credit_share
    FROM banded GROUP BY lag_band
    """,
)
def q_evt_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each
    purchase's credit splits over its preceding-24h views — 40% to
    the first touch, 40% to the last, 20% across the middle — with
    credit held in integer MICRO-units and the middle split done by
    floor division plus largest-remainder cents-style top-up, so
    every purchase's credits sum to exactly 1,000,000 (the
    reconciliation single-touch models get for free and naive float
    multi-touch loses). Reported as credit mass by touch-lag band —
    the view that shows whether conversions are driven by fresh or
    day-old touches.

    Scale: the touch join is the bucketed temporal join (user key +
    24h band); positions are per-purchase windows over the bounded
    touch list; credit assignment is row-local integer arithmetic."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    touch = p.join(
        v,
        (F.col("vu") == F.col("pu"))
        & (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("interval 24 hours")),
    ).select("pid", "vts", "pts")
    wp = Window.partitionBy("pid").orderBy("vts")
    wc = Window.partitionBy("pid")
    t = touch.select(
        "*",
        F.row_number().over(wp).alias("pos"),
        F.count("*").over(wc).alias("n"),
    )
    mid = F.expr("200000 div (n - 2)") + F.when(
        F.col("pos") - 1 <= F.expr("200000 % (n - 2)"), 1
    ).otherwise(0)
    credit = (
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 400000)
        .otherwise(mid)
    )
    credited = t.select("pid", "vts", "pts", credit.alias("credit_u"))
    tot = credited.agg(F.sum("credit_u").alias("total_u"))
    band = (
        F.when(
            F.col("pts") - F.col("vts") <= F.expr("interval 1 hour"),
            "0_under_1h",
        )
        .when(
            F.col("pts") - F.col("vts") <= F.expr("interval 6 hours"),
            "1_1h_6h",
        )
        .otherwise("2_6h_24h")
    )
    return (
        credited.select(band.alias("lag_band"), "credit_u")
        .crossJoin(F.broadcast(tot))
        .groupBy("lag_band", "total_u")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit_u").alias("credit_micro"),
        )
        .select(
            "lag_band",
            "n_touches",
            "credit_micro",
            F.round(
                F.col("credit_micro") / F.col("total_u").cast("double"), 6
            ).alias("credit_share"),
        )
    )


@register(
    "q_fin_return_rates",
    oracle="""
    WITH li AS (
        SELECT p.p_brand AS brand,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT) AS net_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(ret) AS BIGINT) AS n_returned,
           ROUND(SUM(ret) / CAST(COUNT(*) AS DOUBLE), 6) AS return_rate,
           CAST(SUM(CASE WHEN ret = 1 THEN net_cents ELSE 0 END)
                AS BIGINT) AS returned_revenue_cents,
           ROUND(SUM(CASE WHEN ret = 1 THEN net_cents ELSE 0 END)
                 / CAST(SUM(net_cents) AS DOUBLE), 6)
               AS revenue_return_share
    FROM li GROUP BY brand
    """,
)
def q_fin_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns analytics per brand: line-level and revenue-weighted
    return rates (returnflag = 'R') with the net revenue at risk —
    the two rates diverge when expensive items return at different
    rates than cheap ones, which is exactly what a merchandising
    team needs to see. One broadcast dimension join; exact cents.

    Scale: fact joins the part dimension by broadcast, then one
    map-side-combining aggregate at brand grain — the canonical
    star-join rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    net = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        ret.alias("ret"),
        net.alias("net_cents"),
    )
    return j.groupBy("brand").agg(
        F.count("*").alias("n_lines"),
        F.sum("ret").alias("n_returned"),
        F.round(F.sum("ret") / F.count("*").cast("double"), 6).alias(
            "return_rate"
        ),
        F.sum(
            F.when(F.col("ret") == 1, F.col("net_cents")).otherwise(0)
        ).alias("returned_revenue_cents"),
        F.round(
            F.sum(F.when(F.col("ret") == 1, F.col("net_cents")).otherwise(0))
            / F.sum("net_cents").cast("double"),
            6,
        ).alias("revenue_return_share"),
    )
