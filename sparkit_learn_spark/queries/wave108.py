"""Round-6 wave 108: recency windows (days since the last / until
the next spike day — the gap-to-event feature family), customer
value-segment migration matrix (quarter-over-quarter quartile
transitions), and the odds ratio with Woolf confidence interval.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_win_days_since_event",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s,
               SQRT(CAST(COUNT(*) AS DOUBLE)
                    * CAST(SUM(CAST(v * v AS DECIMAL(38, 0))) AS DOUBLE)
                    - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE))
                   AS t_unit
        FROM d),
    mk AS (
        SELECT d.day,
               CASE WHEN CAST(d.v * m.n - m.s AS DOUBLE) > m.t_unit
                    THEN d.day END AS spike_day
        FROM d CROSS JOIN m),
    g AS (
        SELECT day,
               MAX(spike_day) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_spike,
               MIN(spike_day) OVER (ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_spike
        FROM mk)
    SELECT day,
           CAST(DATEDIFF('day', last_spike, day) AS BIGINT)
               AS days_since_spike,
           CAST(DATEDIFF('day', day, next_spike) AS BIGINT)
               AS days_until_spike
    FROM g
    WHERE last_spike IS NOT NULL AND next_spike IS NOT NULL
    ORDER BY day
    """,
)
def q_win_days_since_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-to-event recency features: for every day, the days since
    the LAST revenue spike (>1σ above mean, the exact-integer z
    trick) and until the NEXT one — the backward/forward event-gap
    pattern behind "days since last login/incident/deploy" features,
    computed as running MAX/MIN of a conditionally-marked day column
    over unbounded frames (no join back to the event set). Edge days
    with no spike on one side are excluded exactly.

    Scale: two unbounded frames over the day grain — the marker
    column makes recency a WINDOW problem instead of an as-of join,
    one ordered pass each direction."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sqrt(
            F.count(F.lit(1)).cast("double")
            * F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).cast("double")
            - F.sum("v").cast("double") * F.sum("v").cast("double")
        ).alias("t_unit"),
    )
    mk = d.crossJoin(F.broadcast(m)).select(
        "day",
        F.when(
            (F.col("v") * F.col("n") - F.col("s")).cast("double") > F.col("t_unit"),
            F.col("day"),
        ).alias("spike_day"),
    )
    wb = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    wf = Window.orderBy("day").rowsBetween(1, Window.unboundedFollowing)
    g = mk.select(
        "day",
        F.max("spike_day").over(wb).alias("last_spike"),
        F.min("spike_day").over(wf).alias("next_spike"),
    )
    return (
        g.filter(F.col("last_spike").isNotNull() & F.col("next_spike").isNotNull())
        .select(
            "day",
            F.datediff("day", "last_spike").cast("long").alias("days_since_spike"),
            F.datediff("next_spike", "day").cast("long").alias("days_until_spike"),
        )
        .orderBy("day")
    )


@register(
    "q_fin_segment_migration",
    oracle="""
    WITH halves AS (
        SELECT o_custkey,
               CASE WHEN o_orderdate < DATE '1998-04-01' THEN 0 ELSE 1 END
                   AS half,
               CAST(ROUND(o_totalprice) AS BIGINT) AS v
        FROM orders),
    cust AS (
        SELECT o_custkey, half, CAST(SUM(v) AS BIGINT) AS rev
        FROM halves GROUP BY 1, 2),
    ranked AS (
        SELECT o_custkey, half,
               NTILE(4) OVER (PARTITION BY half
                   ORDER BY rev DESC, o_custkey) AS quartile
        FROM cust),
    mig AS (
        SELECT a.quartile AS from_q, b.quartile AS to_q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ranked a JOIN ranked b
          ON b.o_custkey = a.o_custkey AND a.half = 0 AND b.half = 1
        GROUP BY 1, 2),
    tot AS (SELECT from_q, CAST(SUM(n) AS BIGINT) AS t
            FROM mig GROUP BY from_q)
    SELECT CAST(mig.from_q AS BIGINT) AS from_quartile,
           CAST(mig.to_q AS BIGINT) AS to_quartile, mig.n,
           ROUND(CAST(mig.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
               AS migration_rate
    FROM mig JOIN tot ON tot.from_q = mig.from_q
    ORDER BY from_quartile, to_quartile
    """,
)
def q_fin_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration matrix: revenue quartile in
    the first era (pre-1998-04) vs the second, as a 4×4 transition
    matrix with row-normalized migration rates — the retention
    analysis that distinguishes "our top quartile is stable" from
    "top customers churn and are replaced" (same marginals, opposite
    businesses). NTILE ties break on customer key, so segment
    assignment is engine-deterministic; counts are exact integers.

    Scale: customer-era aggregate, two bounded NTILE windows (one
    per era), a self-join at customer grain, and a 16-row matrix —
    the segmentation never leaves customer grain."""
    o = load_table(spark, sf_dir, "orders")
    cust = (
        o.select(
            "o_custkey",
            F.when(F.col("o_orderdate") < F.lit("1998-04-01").cast("date"), 0)
            .otherwise(1)
            .alias("half"),
            F.round("o_totalprice").cast("long").alias("v"),
        )
        .groupBy("o_custkey", "half")
        .agg(F.sum("v").alias("rev"))
    )
    ranked = cust.select(
        "o_custkey",
        "half",
        F.ntile(4)
        .over(Window.partitionBy("half").orderBy(F.desc("rev"), "o_custkey"))
        .alias("quartile"),
    )
    a = ranked.filter(F.col("half") == 0).select(
        F.col("o_custkey").alias("ka"), F.col("quartile").alias("from_q")
    )
    b = ranked.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("kb"), F.col("quartile").alias("to_q")
    )
    mig = (
        a.join(b, F.col("kb") == F.col("ka"))
        .groupBy("from_q", "to_q")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = mig.groupBy("from_q").agg(F.sum("n").alias("t"))
    return (
        mig.join(F.broadcast(tot), "from_q")
        .select(
            F.col("from_q").cast("long").alias("from_quartile"),
            F.col("to_q").cast("long").alias("to_quartile"),
            "n",
            F.round(F.col("n").cast("double") / F.col("t").cast("double"), 6).alias(
                "migration_rate"
            ),
        )
        .orderBy("from_quartile", "to_quartile")
    )


@register(
    "q_stat_odds_ratio",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS views,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS bought
        FROM events GROUP BY user_id),
    med AS (
        SELECT CAST(AVG(views) AS DOUBLE) AS mean_views FROM u),
    c AS (
        SELECT
          CAST(SUM(CASE WHEN CAST(views AS DOUBLE) > mean_views
                        AND bought = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN CAST(views AS DOUBLE) > mean_views
                        AND bought = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(SUM(CASE WHEN CAST(views AS DOUBLE) <= mean_views
                        AND bought = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN CAST(views AS DOUBLE) <= mean_views
                        AND bought = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM u CROSS JOIN med)
    SELECT a, b, c, d,
           ROUND((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
                 / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)),
                 6) AS odds_ratio,
           ROUND(EXP(LN((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
                        / ((CAST(b AS DOUBLE) + 0.5)
                           * (CAST(c AS DOUBLE) + 0.5)))
                     - 1.96 * SQRT(1 / (CAST(a AS DOUBLE) + 0.5)
                                   + 1 / (CAST(b AS DOUBLE) + 0.5)
                                   + 1 / (CAST(c AS DOUBLE) + 0.5)
                                   + 1 / (CAST(d AS DOUBLE) + 0.5))), 6)
               AS or_ci_low,
           ROUND(EXP(LN((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
                        / ((CAST(b AS DOUBLE) + 0.5)
                           * (CAST(c AS DOUBLE) + 0.5)))
                     + 1.96 * SQRT(1 / (CAST(a AS DOUBLE) + 0.5)
                                   + 1 / (CAST(b AS DOUBLE) + 0.5)
                                   + 1 / (CAST(c AS DOUBLE) + 0.5)
                                   + 1 / (CAST(d AS DOUBLE) + 0.5))), 6)
               AS or_ci_high
    FROM c
    """,
)
def q_stat_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio with Woolf (log-normal) 95% CI, Haldane-Anscombe
    0.5-corrected: are above-average viewers more likely to ever
    purchase? The 2×2 effect-size + uncertainty combo (chi² says "is
    there association", OR says HOW STRONG with a CI) that epi and
    growth teams quote. Exposure threshold is the mean view count
    (one broadcast scalar); cells are exact integers; OR and CI are
    closed-form doubles.

    Scale: user-grain aggregate, one scalar broadcast, one
    conditional-count fold — constant-size output at any event
    volume."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("views"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("bought"),
    )
    med = u.agg(F.avg("views").alias("mean_views"))
    hi = F.col("views").cast("double") > F.col("mean_views")
    c = u.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(hi & (F.col("bought") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when(hi & (F.col("bought") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when(~hi & (F.col("bought") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when(~hi & (F.col("bought") == 0), 1).otherwise(0)).alias("d"),
    )
    ah = F.col("a").cast("double") + 0.5
    bh = F.col("b").cast("double") + 0.5
    ch = F.col("c").cast("double") + 0.5
    dh = F.col("d").cast("double") + 0.5
    lor = F.log(ah * dh / (bh * ch))
    se = F.sqrt(1 / ah + 1 / bh + 1 / ch + 1 / dh)
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.round(ah * dh / (bh * ch), 6).alias("odds_ratio"),
        F.round(F.exp(lor - 1.96 * se), 6).alias("or_ci_low"),
        F.round(F.exp(lor + 1.96 * se), 6).alias("or_ci_high"),
    )
