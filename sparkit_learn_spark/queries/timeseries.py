"""Time-series surface (round 6): gap interpolation and contingency
tables — rounding out the calendar-spine family (q_date_spine_fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_interpolate",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(
               (SELECT MIN(CAST(ts AS DATE)) FROM events),
               (SELECT MAX(CAST(ts AS DATE)) FROM events),
               INTERVAL 1 DAY))::DATE AS day
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 6) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    filled AS (
      SELECT s.day, d.rev,
             LAST_VALUE(d.rev IGNORE NULLS)
               OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_v,
             LAST_VALUE(CASE WHEN d.rev IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_d,
             FIRST_VALUE(d.rev IGNORE NULLS)
               OVER (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_v,
             FIRST_VALUE(CASE WHEN d.rev IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_d
      FROM spine s LEFT JOIN daily d USING (day)
    )
    SELECT day,
           CASE WHEN rev IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
           ROUND(CASE
             WHEN rev IS NOT NULL THEN rev
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v)
                 * date_diff('day', prev_d, day)
                 / date_diff('day', prev_d, next_d)
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v END, 6) AS rev
    FROM filled
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over a calendar spine: missing days
    get prev + (next−prev)·Δt/Δspan (edges carry the nearest known
    value) — the standard sensor/finance resample. Two ignore-nulls
    window passes (carry-backward + carry-forward) over the SPINE
    (days × 1 row), never the raw events.

    Scale: the only event-sized step is the daily aggregation; the
    interpolation windows run over the day spine, which is tiny at any
    corpus size. A per-entity version partitions the same windows by
    the entity key — same state, parallel across entities."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("rev"))
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    known_day = F.when(F.col("rev").isNotNull(), F.col("day"))
    filled = (
        spine.join(daily, "day", "left")
        .withColumn("prev_v", F.last("rev", ignorenulls=True).over(w_prev))
        .withColumn("prev_d", F.last(known_day, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("rev", ignorenulls=True).over(w_next))
        .withColumn("next_d", F.first(known_day, ignorenulls=True).over(w_next))
    )
    interp = (
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * F.date_diff("day", "prev_d")
        / F.date_diff("next_d", "prev_d")
    )
    return filled.select(
        "day",
        F.when(F.col("rev").isNotNull(), 0).otherwise(1).cast("long")
         .alias("interpolated"),
        F.round(
            F.when(F.col("rev").isNotNull(), F.col("rev"))
            .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp)
            .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
            .otherwise(F.col("next_v")), 6
        ).alias("rev"),
    )


@register(
    "q_stat_crosstab",
    oracle="""
    SELECT l_returnflag AS l_returnflag_l_linestatus,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via df.stat.crosstab — the DataFrameStat
    surface. Output pivots the (bounded-domain) linestatus values to
    columns; the oracle spells the same table with FILTER aggregates.

    Scale: crosstab is a groupBy(a) pivot(b) count — safe only while
    |domain(b)| is bounded (here 2); unbounded domains belong in long
    form (q_agg_pivot's caveat applies)."""
    li = load_table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    # crosstab returns counts as long but column order follows value
    # discovery — select explicitly for a stable schema
    return ct.select(
        "l_returnflag_l_linestatus",
        F.col("F").cast("long"), F.col("O").cast("long"),
    )
