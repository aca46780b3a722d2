"""Round-6 wave 23: sweep-line interval concurrency (max simultaneous
sessions via +1/−1 event encoding) and an out-of-orderness audit (the
disorder measurement that sizes streaming watermarks). Both exactly
DuckDB-oracled in integer space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_concurrency",
    oracle="""
    WITH iv AS (
        SELECT epoch_us(ts) AS s,
               epoch_us(ts) + (event_id % 3600) * 1000000 AS e
        FROM events),
    pts AS (
        SELECT s AS us, 1 AS delta FROM iv
        UNION ALL
        SELECT e + 1, -1 FROM iv),
    c AS (
        SELECT us,
               SUM(delta) OVER (ORDER BY us, delta
                                ROWS UNBOUNDED PRECEDING) AS depth
        FROM pts),
    m AS (SELECT MAX(depth) AS max_c FROM c)
    SELECT CAST(m.max_c AS BIGINT) AS max_concurrent,
           CAST(MIN(c.us) AS BIGINT) AS first_peak_us
    FROM c JOIN m ON c.depth = m.max_c
    GROUP BY m.max_c
    """,
)
def q_evt_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: the maximum number of simultaneously
    open sessions (events as [ts, ts + (event_id mod 3600) s] closed
    intervals) and the earliest instant it is reached — each interval
    becomes a +1 at its start and a −1 just after its end, and a
    running sum over the sorted boundary stream IS the concurrency
    profile. Ordering (us, delta) ends intervals before starting
    coincident ones only after both appear — the −1-sorts-first rule
    makes touching-at-a-point count as overlapping consistently in
    both engines. Exact microsecond integers.

    Scale: boundary encoding is row-local; the prefix sum is the one
    ordered pass (2n boundary rows) — at 100 TB, range-partition by
    time and add each partition's incoming depth (a per-partition
    scalar prefix, the standard distributed scan fixup). Compare
    q_join_interval_bucketed (pairwise overlap) — this answers the
    aggregate 'how deep' question in O(n log n), no pairs at all."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = e.select(
        us.alias("s"), (us + (F.col("event_id") % 3600) * 1000000).alias("e")
    )
    pts = iv.select(F.col("s").alias("us"), F.lit(1).alias("delta")).unionByName(
        iv.select((F.col("e") + 1).alias("us"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("us", "delta").rowsBetween(Window.unboundedPreceding, 0)
    c = pts.select("us", F.sum("delta").over(w).alias("depth"))
    m = c.agg(F.max("depth").alias("max_c"))
    return (
        c.join(F.broadcast(m), c.depth == m.max_c)
        .groupBy("max_c")
        .agg(F.min("us").alias("first_peak_us"))
        .select(
            F.col("max_c").cast("long").alias("max_concurrent"),
            F.col("first_peak_us").cast("long").alias("first_peak_us"),
        )
    )


@register(
    "q_dq_out_of_order",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CASE WHEN ts < LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY event_id)
                    THEN 1 ELSE 0 END AS inverted,
               CASE WHEN LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY event_id) IS NULL
                    THEN 0 ELSE 1 END AS counted,
               GREATEST(epoch_us(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY event_id))
                        - epoch_us(ts), 0) AS late_us
        FROM events)
    SELECT CAST(SUM(counted) AS BIGINT) AS n_transitions,
           CAST(SUM(inverted) AS BIGINT) AS n_inversions,
           ROUND(SUM(inverted) / CAST(SUM(counted) AS DOUBLE), 6)
               AS inversion_rate,
           CAST(MAX(late_us) AS BIGINT) AS max_lateness_us
    FROM s
    """,
)
def q_dq_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit: treating arrival order as the event_id
    sequence, how often does event time step BACKWARD per user, and by
    at most how much — the disorder profile that sizes a streaming
    watermark (max observed lateness bounds the allowed-lateness
    setting; cf. q_stream_late, which shows what a too-tight watermark
    drops). Exact microsecond integers.

    Scale: one user-keyed LAG pass plus a global four-sum aggregate —
    the per-batch data-quality probe an ingest pipeline runs to detect
    clock skew and replay storms before they silently drop rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev_ts = F.lag("ts").over(w)
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prev_us = F.unix_micros(prev_ts.cast("timestamp_ltz"))
    s = e.select(
        F.when(F.col("ts") < prev_ts, 1).otherwise(0).alias("inverted"),
        F.when(prev_ts.isNull(), 0).otherwise(1).alias("counted"),
        F.greatest(prev_us - us, F.lit(0)).alias("late_us"),
    )
    return s.agg(
        F.sum("counted").alias("n_transitions"),
        F.sum("inverted").alias("n_inversions"),
        F.round(
            F.sum("inverted") / F.sum("counted").cast("double"), 6
        ).alias("inversion_rate"),
        F.max("late_us").alias("max_lateness_us"),
    )
