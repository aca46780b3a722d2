"""Event analytics, wave 2 (round 6): RFM segmentation, last-touch
attribution, and cohort retention — the remaining product-analytics
staples over the events stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_rfm",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             date_diff('day', MAX(ts),
                       (SELECT MAX(ts) FROM events))          AS recency_d,
             COUNT(*)                                          AS frequency,
             COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0)
                                                               AS monetary
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT NTILE(4) OVER (ORDER BY recency_d, user_id)        AS r_q,
             NTILE(4) OVER (ORDER BY frequency DESC, user_id)   AS f_q,
             NTILE(4) OVER (ORDER BY monetary DESC, user_id)    AS m_q
      FROM per_user
    )
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q_evt_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary, each
    quartiled (ntile with a user_id tiebreak so the quartile
    assignment is total-ordered and engine-stable), then segment
    sizes. The global MAX(ts) anchor is a broadcast scalar.

    Scale: the ntiles run over the per-USER aggregate (one row per
    user). A global ntile is a single-partition sort — acceptable on
    user-grain tables up to ~10⁸ rows; beyond that switch to
    approx-quantile bucket edges (cf. q_agg_approx_quantiles)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("t_max"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.date_diff(F.max("t_max"), F.max("ts")).alias("recency_d"),
            F.count("*").alias("frequency"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
                F.lit(0.0),
            ).alias("monetary"),
        )
    )
    scored = per_user.select(
        F.ntile(4).over(Window.orderBy("recency_d", "user_id")).alias("r_q"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "user_id")).alias("f_q"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), "user_id")).alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_users")
    ).select(
        F.col("r_q").cast("long"), F.col("f_q").cast("long"),
        F.col("m_q").cast("long"), "n_users",
    )


@register(
    "q_evt_attribution",
    oracle="""
    WITH tagged AS (
      SELECT *,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS purchases,
           CAST(COUNT(last_click_ts) AS BIGINT) AS attributed,
           ROUND(SUM(CASE WHEN last_click_ts IS NOT NULL
                          THEN value ELSE 0 END), 6) AS attributed_value
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_evt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's
    most recent PRIOR click — an as-of lookup done as one window pass
    (last_value ignore-nulls over a frame ending 1 PRECEDING), not a
    pairwise time-range self-join.

    Scale: one shuffle on user_id; per-row state is one carried
    timestamp. The self-join form (purchases × candidate clicks)
    explodes quadratically on active users — same argument as
    q_join_asof."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    tagged = ev.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("event_type") == "click", F.col("ts")),
               ignorenulls=True).over(w),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("purchases"),
            F.count("last_click_ts").alias("attributed"),
            F.round(F.sum(F.when(F.col("last_click_ts").isNotNull(),
                                 F.col("value")).otherwise(0.0)), 6)
             .alias("attributed_value"),
        )
    )


@register(
    "q_evt_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_evt_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted distinct in each later week — the (cohort_week,
    week_offset, active_users) long form a retention heatmap reads.

    Scale: the firsts table is user-grain and joins back on user_id —
    same shuffle key as its own aggregation, so Catalyst reuses the
    partitioning; the distinct count is the only second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.date_diff(F.date_trunc("week", "ts").cast("date"),
                            F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
