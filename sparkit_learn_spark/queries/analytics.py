"""Event-analytics composites over the events table: conversion
funnel (ordered first-occurrence stages) and weekly cohort retention
— the two workhorse product-analytics shapes. Both exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Funnel stage order: each stage's FIRST occurrence must be strictly
#: after the previous stage's first occurrence.
FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


@register(
    "q_evt_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT user_id,
             CASE WHEN t0 IS NULL THEN 0
                  WHEN t1 IS NULL OR t1 <= t0 THEN 1
                  WHEN t2 IS NULL OR t2 <= t1 THEN 2
                  WHEN t3 IS NULL OR t3 <= t2 THEN 3
                  ELSE 4 END AS stage
      FROM u
    )
    SELECT CAST(stage AS BIGINT) AS funnel_stage,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d GROUP BY 1
    """,
)
def q_evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel: how many users reached each
    stage of signup -> view -> click -> purchase, where a stage counts
    only if its FIRST occurrence is strictly after the previous
    stage's first occurrence.

    Scale: one shuffle on user_id for the conditional-min pivot (all
    four firsts in a single partial-aggregated pass — no per-stage
    scans, no join chain), then the stage expression is pure codegen
    and the final count groups on a 5-value key. Event volume only
    affects the first aggregate, which combines map-side."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == step, F.col("ts"))).alias(f"t{i}")
        for i, step in enumerate(FUNNEL_STEPS)
    ])
    stage = (
        F.when(F.col("t0").isNull(), 0)
        .when(F.col("t1").isNull() | (F.col("t1") <= F.col("t0")), 1)
        .when(F.col("t2").isNull() | (F.col("t2") <= F.col("t1")), 2)
        .when(F.col("t3").isNull() | (F.col("t3") <= F.col("t2")), 3)
        .otherwise(4)
    )
    return (
        firsts.select(stage.cast("long").alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "q_evt_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    j AS (
      SELECT e.user_id, f.cohort_week,
             CAST(FLOOR(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7.0)
                  AS BIGINT) AS week_offset
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM j GROUP BY 1, 2
    """,
)
def q_evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event (cohort), counted distinct in every later week they
    were active (offset in weeks from the cohort week). Monday-start
    weeks in both engines (date_trunc('week')).

    Scale: two shuffles on user_id (first-event aggregate, then the
    events-to-cohort join — both co-partitioned, so AQE can reuse the
    exchange), one distinct-count shuffle on (cohort, offset). The
    cohort table is |users|-sized, NOT broadcast: at 100 TB users are
    billions of rows, so the equi-join on the shared user_id
    partitioning is the right plan, not a broadcast."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    j = e.join(f, "user_id").select(
        "user_id",
        "cohort_week",
        F.floor(
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
            / F.lit(7.0)
        ).cast("long").alias("week_offset"),
    )
    return (
        j.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "q_evt_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_evt_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts): for
    each user's time-ordered event stream, count consecutive
    (from_type -> to_type) pairs. (ts, event_id) ordering makes the
    sequence — and therefore the counts — deterministic cross-engine
    even with tied timestamps.

    Scale: the lead() window partitions by user_id — millions of
    small partitions, the shape window functions parallelize well —
    then the count groups on a 25-key space. One shuffle on user_id,
    one on the tiny (from,to) key. No global window anywhere."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        s.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
