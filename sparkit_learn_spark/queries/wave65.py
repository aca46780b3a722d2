"""Round-6 wave 65: feature-adoption curves (per-event-type
cumulative first use) and a time-series data-gap audit (missing-day
run lengths). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_adoption_curves",
    oracle="""
    WITH fu AS (
        SELECT event_type, user_id,
               MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
        FROM events GROUP BY event_type, user_id),
    daily AS (
        SELECT event_type, first_day AS d,
               CAST(COUNT(*) AS BIGINT) AS new_adopters
        FROM fu GROUP BY event_type, first_day),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS eventual
        FROM fu GROUP BY event_type)
    SELECT d.event_type, d.d AS day,
           CAST(SUM(d.new_adopters) OVER (
               PARTITION BY d.event_type ORDER BY d.d
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_adopters,
           ROUND(SUM(d.new_adopters) OVER (
                     PARTITION BY d.event_type ORDER BY d.d
                     ROWS UNBOUNDED PRECEDING)
                 / CAST(t.eventual AS DOUBLE), 6) AS adoption_share
    FROM daily d JOIN tot t ON t.event_type = d.event_type
    """,
)
def q_evt_adoption_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption curves: for each event type, the cumulative
    count of users who have used it at least once, by day, plus the
    share of its eventual adopter base — the S-curves product teams
    overlay to see which capability spread fastest (steep early =
    discoverable; long tail = power-user feature). First-seen
    rewrite: each (type, user) contributes one row, so no windowed
    distinct ever runs.

    Scale: one (type, user) MIN aggregate, a (type, day) rollup, and
    a cumulative window partitioned by type over day-grain rows —
    all map-side-combining aggregates plus a tiny series window."""
    e = load_table(spark, sf_dir, "events")
    fu = e.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("first_day")
    )
    daily = fu.groupBy("event_type", F.col("first_day").alias("d")).agg(
        F.count("*").alias("new_adopters")
    )
    tot = fu.groupBy("event_type").agg(F.count("*").alias("eventual"))
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        daily.join(tot, "event_type")
        .select(
            "event_type",
            F.col("d").alias("day"),
            F.sum("new_adopters").over(w).cast("long").alias("cum_adopters"),
            F.round(
                F.sum("new_adopters").over(w)
                / F.col("eventual").cast("double"),
                6,
            ).alias("adoption_share"),
        )
    )


@register(
    "q_ts_data_gaps",
    oracle="""
    WITH obs AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events WHERE event_type = 'purchase'),
    seq AS (
        SELECT d,
               LEAD(d) OVER (ORDER BY d) AS next_d
        FROM obs),
    gaps AS (
        SELECT d AS gap_after,
               CAST(date_diff('day', d, next_d) - 1 AS BIGINT)
                   AS gap_days
        FROM seq
        WHERE next_d IS NOT NULL
          AND date_diff('day', d, next_d) > 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COALESCE(SUM(gap_days), 0) AS BIGINT)
               AS total_missing_days,
           CAST(COALESCE(MAX(gap_days), 0) AS BIGINT) AS longest_gap
    FROM gaps
    """,
)
def q_ts_data_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-gap audit: runs of MISSING days in the purchase series —
    gap count, total missing days, and the longest outage — the
    completeness check that should precede any calendar-window
    metric (a silent 3-day ingestion outage poisons every trailing
    average; LOCF/interpolation fill gaps, this one REPORTS them).
    One LEAD over observed days; exact integer date arithmetic.

    Scale: observed days collapse from the fact first (map-side
    distinct at day grain), the gap scan is one window over the tiny
    series — per-source/per-table extension partitions the window."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = e.select(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    seq = obs.select(
        "d", F.lead("d").over(Window.orderBy("d")).alias("next_d")
    )
    gaps = seq.filter(
        F.col("next_d").isNotNull()
        & (F.datediff("next_d", "d") > 1)
    ).select((F.datediff("next_d", "d") - 1).cast("long").alias("gap_days"))
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.coalesce(F.sum("gap_days"), F.lit(0))
        .cast("long")
        .alias("total_missing_days"),
        F.coalesce(F.max("gap_days"), F.lit(0))
        .cast("long")
        .alias("longest_gap"),
    )
