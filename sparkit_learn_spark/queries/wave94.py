"""Round-6 wave 94: exact decile QQ table (distribution comparison
via order statistics on cumulative histograms), temporal-consistency
audit across the order/lineitem date chain, and windowed top-k — the
tumbling-window leaderboard, the canonical streaming aggregation
missing from the tumbling/sliding/session trio. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_qq_table",
    oracle="""
    WITH x AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    h AS (SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS c
          FROM x GROUP BY seg, v),
    cum AS (
        SELECT seg, v,
               SUM(c) OVER (PARTITION BY seg ORDER BY v) AS cc
        FROM h),
    n AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY seg),
    ks AS (
        SELECT n.seg, g.q, (n.n * g.q + 9) // 10 AS k
        FROM n CROSS JOIN (SELECT UNNEST(RANGE(1, 10)) AS q) g),
    qv AS (
        SELECT ks.seg, ks.q, MIN(cum.v) AS qval
        FROM ks JOIN cum ON cum.seg = ks.seg AND cum.cc >= ks.k
        GROUP BY ks.seg, ks.q)
    SELECT CAST(a.q AS BIGINT) AS decile,
           a.qval AS building_v, b.qval AS machinery_v,
           ROUND(CAST(a.qval AS DOUBLE) / CAST(b.qval AS DOUBLE), 6)
               AS qq_ratio
    FROM qv a JOIN qv b ON b.q = a.q
    WHERE a.seg = 'BUILDING' AND b.seg = 'MACHINERY'
    ORDER BY decile
    """,
)
def q_stat_qq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile table comparing order-value distributions of
    the BUILDING vs MACHINERY customer segments: the nine decile
    order statistics of each (type-1 quantiles, k = ⌈n·q/10⌉), paired
    with their ratio — the tabular form of a QQ plot, the standard
    "same distribution, different scale, or genuinely different
    shape?" diagnostic. Each decile is the histogram
    cumulative-crossing order statistic — exact integers end to end,
    no interpolation, no global sort.

    Scale: value-domain-bounded histogram (rounded prices) with one
    per-segment cumulative window — the same histogram-rank pattern
    as Kruskal-Wallis and the weighted median; fact rows are touched
    exactly once."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    x = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(F.col("c_mktsegment").alias("seg"), F.round("o_totalprice").cast("long").alias("v"))
    )
    h = x.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("c"))
    cum = h.select(
        "seg", "v", F.sum("c").over(Window.partitionBy("seg").orderBy("v")).alias("cc")
    )
    n = x.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    ks = n.select(
        "seg", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("q"), "n"
    ).select("seg", "q", F.expr("(n * q + 9) div 10").alias("k"))
    qv = (
        cum.join(F.broadcast(ks), "seg")
        .filter(F.col("cc") >= F.col("k"))
        .groupBy("seg", "q")
        .agg(F.min("v").alias("qval"))
    )
    a = qv.filter(F.col("seg") == "BUILDING").select(F.col("q").alias("qa"), F.col("qval").alias("building_v"))
    b = qv.filter(F.col("seg") == "MACHINERY").select(F.col("q").alias("qb"), F.col("qval").alias("machinery_v"))
    return (
        a.join(b, F.col("qa") == F.col("qb"))
        .select(
            F.col("qa").cast("long").alias("decile"),
            "building_v",
            "machinery_v",
            F.round(F.col("building_v").cast("double") / F.col("machinery_v").cast("double"), 6).alias("qq_ratio"),
        )
        .orderBy("decile")
    )


@register(
    "q_dq_ship_lag_audit",
    oracle="""
    WITH j AS (
        SELECT o.o_orderpriority,
               CAST(DATEDIFF('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS lag
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CASE WHEN lag < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS ship_before_order,
           CAST(MIN(lag) AS BIGINT) AS min_lag_days,
           CAST(MAX(lag) AS BIGINT) AS max_lag_days,
           ROUND(CAST(SUM(lag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS mean_lag_days,
           ROUND(CAST(SUM(CASE WHEN lag > 90 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS share_over_90d
    FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_dq_ship_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-consistency audit of the order→ship chain, per order
    priority: line items shipped BEFORE their order date (the
    event-ordering invariant a warehouse load must preserve), the
    lag envelope (min/max/mean days from order to ship), and the
    share breaching a 90-day SLA — does priority actually buy faster
    shipping? Complements the value-reconciliation audit
    (q_dq_cross_table_audit) on the TIME axis. Lags are exact
    integer day differences, exactly oracled.

    Scale: one fact-fact join on the order key (co-partitioned by
    the natural key; with bucketed tables this is shuffle-free) and
    one conditional-count fold per priority — no window, no second
    pass."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(F.when(F.col("lag") < 0, 1).otherwise(0)).alias("ship_before_order"),
            F.min("lag").alias("min_lag_days"),
            F.max("lag").alias("max_lag_days"),
            F.round(F.sum("lag").cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
                "mean_lag_days"
            ),
            F.round(
                F.sum(F.when(F.col("lag") > 90, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("share_over_90d"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_stream_window_topk",
    oracle="""
    WITH w AS (
        SELECT DATE_TRUNC('day', ts) AS window_start, user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT window_start, user_id, total_cents, n_events,
               ROW_NUMBER() OVER (PARTITION BY window_start
                   ORDER BY total_cents DESC, user_id) AS rnk
        FROM w)
    SELECT window_start, CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(total_cents AS BIGINT) AS total_cents, n_events
    FROM r WHERE rnk <= 3 ORDER BY window_start, rnk
    """,
)
def q_stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k: the three highest-value users inside each
    1-day tumbling window (epoch-aligned, so window() ≡
    date_trunc('day')) — the canonical streaming leaderboard,
    completing the tumbling/sliding/session trio with a ranked
    aggregation. Value sums are exact cents; rank ties break on
    user_id, so the leaderboard is exactly oracled. In streaming
    mode the same plan runs as window-aggregate → per-window rank on
    window close (append mode after watermark).

    Scale: the window aggregate is (window × user)-grain with
    map-side combine; the rank partitions by window — bounded
    partitions, no global sort; top-3 filter prunes before output."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        ev.groupBy(
            F.window("ts", "1 day").alias("win"), "user_id"
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("win.start").alias("window_start"), "user_id", "total_cents", "n_events")
    )
    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(F.desc("total_cents"), "user_id")
    )
    return (
        w.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "rnk", "user_id", "total_cents", "n_events")
        .orderBy("window_start", "rnk")
    )
