"""Round-6 wave 102: the log-rank test (two-group survival
comparison — the companion to Kaplan-Meier), a sequential next-item
transition table (consecutive-order market-basket mining), and the
Lincoln-Petersen capture-recapture population estimate. All exactly
DuckDB-oracled from integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_logrank",
    oracle="""
    WITH u0 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events GROUP BY user_id),
    mx AS (SELECT MAX(ts) AS tmax FROM events),
    u AS (SELECT u0.*, mx.tmax FROM u0 CROSS JOIN mx),
    s AS (
        SELECT ((user_id * 2654435761) % 4294967296) % 2 AS g,
               CASE WHEN tp IS NOT NULL AND tp >= t0 THEN 1 ELSE 0 END
                   AS died,
               CAST(FLOOR((EPOCH(CASE WHEN tp IS NOT NULL AND tp >= t0
                                      THEN tp ELSE tmax END)
                           - EPOCH(t0)) / 86400) AS BIGINT) AS dur
        FROM u WHERE t0 IS NOT NULL),
    tg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY g),
    h AS (
        SELECT dur, g, CAST(COUNT(*) AS BIGINT) AS leaving,
               CAST(SUM(died) AS BIGINT) AS deaths
        FROM s GROUP BY dur, g),
    r AS (
        SELECT h.dur, h.g, h.deaths,
               tg.n - COALESCE(SUM(h.leaving) OVER (PARTITION BY h.g
                   ORDER BY h.dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS at_risk
        FROM h JOIN tg ON tg.g = h.g),
    w AS (
        SELECT dur,
               SUM(CASE WHEN g = 0 THEN deaths ELSE 0 END) AS d0,
               SUM(deaths) AS dt,
               SUM(CASE WHEN g = 0 THEN at_risk ELSE 0 END) AS r0,
               SUM(at_risk) AS rt
        FROM r GROUP BY dur),
    agg AS (
        SELECT CAST(SUM(d0) AS DOUBLE) AS o0,
               SUM(CAST(dt AS DOUBLE) * CAST(r0 AS DOUBLE)
                   / CAST(rt AS DOUBLE)) AS e0,
               SUM(CASE WHEN rt > 1 THEN
                   CAST(dt AS DOUBLE) * (CAST(r0 AS DOUBLE) / CAST(rt AS DOUBLE))
                   * (1 - CAST(r0 AS DOUBLE) / CAST(rt AS DOUBLE))
                   * (CAST(rt AS DOUBLE) - CAST(dt AS DOUBLE))
                   / (CAST(rt AS DOUBLE) - 1) ELSE 0 END) AS v
        FROM w WHERE dt > 0)
    SELECT CAST(o0 AS BIGINT) AS observed_g0,
           ROUND(e0, 6) AS expected_g0,
           ROUND((o0 - e0) * (o0 - e0) / v, 6) AS logrank_chi2
    FROM agg
    """,
)
def q_stat_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time from first view to first purchase
    between two hash-split user cohorts, with right-censoring at the
    observation end: at every day with events, observed vs expected
    group-0 conversions given the risk sets, pooled into the
    hypergeometric-variance chi-square — THE standard test for "do
    these cohorts convert at different speeds?", where a mean
    comparison is censoring-biased. Risk sets come from descending
    cumulative integer counts; only the final three reductions are
    doubles. Exactly oracled.

    Scale: user-grain survival rows, then a (duration-domain ×
    2)-grain table with one cumulative window per group — the
    standard distributed survival-analysis shape (KM and log-rank
    share the same risk-set scan)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    tmax = ev.agg(F.max("ts").alias("tmax"))
    died = F.when(F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0")), 1).otherwise(0)
    tend = F.when(F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0")), F.col("tp")).otherwise(
        F.col("tmax")
    )
    s = (
        u.filter(F.col("t0").isNotNull())
        .crossJoin(F.broadcast(tmax))
        .select(
            F.expr("((user_id * 2654435761) % 4294967296) % 2").alias("g"),
            died.alias("died"),
            F.floor((F.unix_timestamp(tend) - F.unix_timestamp("t0")) / 86400)
            .cast("long")
            .alias("dur"),
        )
    )
    tg = s.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    h = s.groupBy("dur", "g").agg(
        F.count(F.lit(1)).alias("leaving"), F.sum("died").alias("deaths")
    )
    wcum = Window.partitionBy("g").orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    r = h.join(F.broadcast(tg), "g").select(
        "dur",
        "g",
        "deaths",
        (F.col("n") - F.coalesce(F.sum("leaving").over(wcum), F.lit(0))).alias("at_risk"),
    )
    w = r.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 0, F.col("deaths")).otherwise(0)).alias("d0"),
        F.sum("deaths").alias("dt"),
        F.sum(F.when(F.col("g") == 0, F.col("at_risk")).otherwise(0)).alias("r0"),
        F.sum("at_risk").alias("rt"),
    )
    dtd = F.col("dt").cast("double")
    r0d = F.col("r0").cast("double")
    rtd = F.col("rt").cast("double")
    agg = w.filter(F.col("dt") > 0).agg(
        F.sum("d0").cast("double").alias("o0"),
        F.sum(dtd * r0d / rtd).alias("e0"),
        F.sum(
            F.when(
                F.col("rt") > 1,
                dtd * (r0d / rtd) * (1 - r0d / rtd) * (rtd - dtd) / (rtd - 1),
            ).otherwise(0.0)
        ).alias("v"),
    )
    return agg.select(
        F.col("o0").cast("long").alias("observed_g0"),
        F.round("e0", 6).alias("expected_g0"),
        F.round((F.col("o0") - F.col("e0")) * (F.col("o0") - F.col("e0")) / F.col("v"), 6).alias(
            "logrank_chi2"
        ),
    )


@register(
    "q_ml_next_item_table",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders),
    pair AS (
        SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
        FROM o a JOIN o b
          ON b.o_custkey = a.o_custkey AND b.rn = a.rn + 1),
    li AS (SELECT l_orderkey, l_partkey % 97 AS pg FROM lineitem),
    tr AS (
        SELECT la.pg AS from_group, lb.pg AS to_group,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pair
        JOIN li la ON la.l_orderkey = pair.k1
        JOIN li lb ON lb.l_orderkey = pair.k2
        GROUP BY 1, 2),
    tot AS (SELECT from_group, CAST(SUM(n) AS BIGINT) AS t
            FROM tr GROUP BY from_group)
    SELECT CAST(tr.from_group AS BIGINT) AS from_group,
           CAST(tr.to_group AS BIGINT) AS to_group, tr.n,
           ROUND(CAST(tr.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
               AS p_next
    FROM tr JOIN tot ON tot.from_group = tr.from_group
    ORDER BY tr.n DESC, from_group, to_group LIMIT 20
    """,
)
def q_ml_next_item_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential next-item transition table: for each customer's
    CONSECUTIVE order pair, count part-group → part-group transitions
    (parts bucketed to 97 groups) and normalize to next-purchase
    probabilities — the sequential upgrade of co-occurrence basket
    rules (q_ml_basket_rules finds "bought together"; this finds
    "bought NEXT", the table a session-based recommender serves).
    Top-20 transitions, exact integer counts.

    Scale: the order sequence is a per-customer window (bounded
    partitions); the pair join is keyed on (customer, rank) — fact
    grain, never cross; items join through the order keys, giving
    ≤ basket² rows per order pair with basket ≤ 7 — linear in facts
    with a bounded constant."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    a = o.select(F.col("o_custkey").alias("ca"), F.col("rn").alias("ra"), F.col("o_orderkey").alias("k1"))
    b = o.select(F.col("o_custkey").alias("cb"), F.col("rn").alias("rb"), F.col("o_orderkey").alias("k2"))
    pair = a.join(b, (F.col("cb") == F.col("ca")) & (F.col("rb") == F.col("ra") + 1)).select(
        "k1", "k2"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 97).alias("pg")
    )
    la = li.select(F.col("l_orderkey").alias("ka"), F.col("pg").alias("from_group"))
    lb = li.select(F.col("l_orderkey").alias("kb"), F.col("pg").alias("to_group"))
    tr = (
        pair.join(la, F.col("ka") == F.col("k1"))
        .join(lb, F.col("kb") == F.col("k2"))
        .groupBy("from_group", "to_group")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tr.groupBy("from_group").agg(F.sum("n").alias("t"))
    return (
        tr.join(F.broadcast(tot), "from_group")
        .select(
            F.col("from_group").cast("long").alias("from_group"),
            F.col("to_group").cast("long").alias("to_group"),
            "n",
            F.round(F.col("n").cast("double") / F.col("t").cast("double"), 6).alias("p_next"),
        )
        .orderBy(F.desc("n"), "from_group", "to_group")
        .limit(20)
    )


@register(
    "q_stat_capture_recapture",
    oracle="""
    WITH w1 AS (
        SELECT DISTINCT user_id FROM events
        WHERE CAST(ts AS DATE) < DATE '2024-01-11'),
    w2 AS (
        SELECT DISTINCT user_id FROM events
        WHERE CAST(ts AS DATE) >= DATE '2024-01-11'
          AND CAST(ts AS DATE) < DATE '2024-01-21'),
    c AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w1) AS n1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM w2) AS n2,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM w1 JOIN w2 USING (user_id)) AS m),
    t AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS observed
          FROM events)
    SELECT c.n1 AS week1_users, c.n2 AS week2_users, c.m AS recaptured,
           ROUND((CAST(c.n1 AS DOUBLE) + 1) * (CAST(c.n2 AS DOUBLE) + 1)
                 / (CAST(c.m AS DOUBLE) + 1) - 1, 6) AS chapman_estimate,
           t.observed AS observed_total
    FROM c CROSS JOIN t
    """,
)
def q_stat_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman's bias-corrected Lincoln-Petersen)
    estimate of the total user population from two 10-day observation
    windows: N̂ = (n1+1)(n2+1)/(m+1) − 1, where m is the recaptured
    overlap — the ecology estimator that answers "how many users
    exist that we have NEVER seen?", which no direct count can.
    Reported beside the observed total so the dark-pool gap is
    explicit. Exact integer captures, one closed form.

    Scale: two distinct-sets plus one semi-join at user grain —
    aggregate-only, no window; the estimator's inputs merge across
    shards as set unions."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w1 = ev.filter(day < F.lit("2024-01-11").cast("date")).select("user_id").distinct()
    w2 = ev.filter(
        (day >= F.lit("2024-01-11").cast("date")) & (day < F.lit("2024-01-21").cast("date"))
    ).select("user_id").distinct()
    n1 = w1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = w2.agg(F.count(F.lit(1)).alias("n2"))
    m = w1.join(w2, "user_id").agg(F.count(F.lit(1)).alias("m"))
    t = ev.agg(F.countDistinct("user_id").alias("observed"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("n1").alias("week1_users"),
            F.col("n2").alias("week2_users"),
            F.col("m").alias("recaptured"),
            F.round(
                (F.col("n1").cast("double") + 1)
                * (F.col("n2").cast("double") + 1)
                / (F.col("m").cast("double") + 1)
                - 1,
                6,
            ).alias("chapman_estimate"),
            F.col("observed").alias("observed_total"),
        )
    )
