"""Window-function operators (SURVEY.md §2B — q_win_*).

One shuffle per distinct (partitionBy, orderBy) spec; partitions sort
locally then stream the frame. At 100 TB the partition key must have
enough cardinality (custkey/user_id do); a global ORDER BY window with
no PARTITION BY would single-task — none here do that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER w AS BIGINT) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer by price (orderkey
    tiebreak makes row_number deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


@register(
    "q_win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable per-group top-k idiom
    (rank then filter; Spark pushes a per-partition limit)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           ROUND(value - lag(value)  OVER w, 6) AS delta_prev,
           ROUND(lead(value) OVER w - value, 6) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead event-value deltas per user in time order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 6).alias("delta_next"),
    )


@register(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_total
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (rows frame, unbounded→current)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_total"),
    )


@register(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch(ts) AS BIGINT)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 6) AS trailing_30d
    FROM events
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day trailing sum per user via a RANGE frame on epoch seconds
    (2592000 s = 30 d). Value-based frames need a numeric sort key in
    Spark, hence unix_timestamp."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn(
        "_epoch", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_epoch")
        .rangeBetween(-2592000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 6).alias("trailing_30d"),
    )


@register(
    "q_win_ntile_pct",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(ntile(4) OVER w AS BIGINT)      AS quartile,
           ROUND(percent_rank() OVER w, 6)      AS pct_rank,
           ROUND(cume_dist() OVER w, 6)         AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist per status partition."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_win_firstlast",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderdate) OVER w AS first_order,
           last_value(o_orderdate)  OVER w AS latest_order,
           ROUND(first_value(o_totalprice) OVER w, 6) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value with an explicit full-partition frame (the
    default frame would make last_value = current row)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("latest_order"),
        F.round(F.first("o_totalprice").over(w), 6).alias("first_price"),
    )


@register(
    "q_win_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM g
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT)  AS session_seq,
           CAST(COUNT(*) AS BIGINT)     AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_seq
    """,
)
def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the classic gaps-and-islands rewrite and
    the batch twin of q_stream_session: per user, a new session starts
    when the gap to the previous event exceeds 30 min; session id =
    running sum of session-start flags.

    Scale: ONE shuffle on user_id serves both the lag and the running
    sum (same window spec), then the per-session aggregate groups on
    (user_id, session_seq) — a superset of the window partition key,
    so no second shuffle. Linear state per partition; survives 100×.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = F.sum(is_new).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("session_seq", sess)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
