"""Event-analytics composites over the events table: conversion
funnel (ordered first-occurrence stages), weekly cohort retention,
state transitions, z-score anomaly flagging, and the dow×hour
activity heatmap — the workhorse product-analytics shapes. All
exactly DuckDB-oracled.
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


#: Anomaly threshold in per-type standard deviations.
ANOM_Z = 2.5


@register(
    "q_evt_anomaly",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             AVG(value)         AS mu,
             STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 2) AS value,
           ROUND((e.value - s.mu) / s.sd, 4) + 0.0 AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS(e.value - s.mu) > {ANOM_Z} * s.sd
    ORDER BY e.event_id
    """,
)
def q_evt_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flagging: events whose value deviates
    more than {ANOM_Z}σ from their type's mean — the monitoring /
    data-validation pass over a metrics stream. The z is rounded with
    a signed-zero guard; the CUT itself compares raw doubles, which
    is safe because both engines derive mu/sd from the same algebraic
    moments and a value landing within an ulp of the exact threshold
    does not occur at fixture scales (and would shift the flag set,
    not corrupt values, at worst).

    Scale: the per-type moments are ONE partial+final aggregate
    (5 groups); they broadcast back into a second scan of events —
    two scans, zero fact shuffles, output ∝ tail density. This is the
    shape to keep at 100 TB: never window the raw stream by type
    (a 5-key window would funnel the whole table through 5 reducers);
    aggregate-then-broadcast instead."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy(F.col("event_type").alias("st")).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
    )
    return (
        e.join(F.broadcast(stats), e.event_type == F.col("st"))
        .filter(F.abs(F.col("value") - F.col("mu")) > ANOM_Z * F.col("sd"))
        .select(
            "event_id", "event_type",
            F.round("value", 2).alias("value"),
            (F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
             + F.lit(0.0)).alias("z"),
        )
        .orderBy("event_id")
    )


@register(
    "q_evt_heatmap",
    oracle="""
    SELECT CAST(EXTRACT(dow  FROM ts) AS BIGINT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT)              AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_evt_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with per-cell
    distinct users — the standard traffic-shape rollup. Spark's
    dayofweek is 1-based (Sunday=1); DuckDB's dow is 0-based
    (Sunday=0) — aligned by subtracting 1.

    Scale: 168 groups; COUNT(DISTINCT) expands to a two-stage
    aggregate (dedup on (cell, user) then count) — both stages
    map-side combine, so the shuffles carry at most one row per
    (cell, user) and per cell respectively."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(F.count("*").alias("n"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("dow", "hod")
    )


#: Minimum consecutive same-type events to count as a streak.
STREAK_MIN = 3


@register(
    "q_evt_streaks",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           MIN(ts) AS run_start
    FROM t
    GROUP BY user_id, event_type, rn - rnt
    HAVING COUNT(*) >= {STREAK_MIN}
    ORDER BY user_id, run_start, event_type
    """,
)
def q_evt_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of >= {STREAK_MIN} CONSECUTIVE
    same-type events per user (the rn − rn_per_type island id trick)
    — sequence-position based, unlike q_win_sessionize's time-gap
    islands. Ordering ties on ts are broken by event_id so island
    membership is deterministic cross-engine.

    Scale: both window passes partition by user (the second by
    user+type — a subpartition, so with AQE the second sort reuses
    the first exchange's layout where possible) and the island
    aggregate groups within the same keys — everything after the
    first user_id shuffle is user-local. Per-user data must fit a
    partition's sort spill budget, the standard window constraint;
    no global sort, no driver state."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    t = e.select(
        "user_id", "event_type", "ts",
        (F.row_number().over(w_all)
         - F.row_number().over(w_typ)).alias("island"),
    )
    return (
        t.groupBy("user_id", "event_type", "island")
        .agg(F.count("*").alias("run_len"),
             F.min("ts").alias("run_start"))
        .filter(F.col("run_len") >= STREAK_MIN)
        .select("user_id", "event_type",
                F.col("run_len").cast("long").alias("run_len"),
                "run_start")
        .orderBy("user_id", "run_start", "event_type")
    )
