"""Round-8 wave 139: sequential state-space forecasters — additive
Holt-Winters (level+trend+weekly seasonality) and Croston's method
for intermittent demand. Both are inherently sequential recursions in
time, the one shape Spark cannot parallelize ACROSS — so the engine
strategy is: aggregate the 100 TB fact to series grain distributed
(day rows, thousands), then run the O(days) recursion in ONE bounded
Arrow batch (the MMR convention). The oracles replicate the exact
recursion with DuckDB recursive CTEs seeded from integer aggregates,
so both engines execute identical IEEE double sequences — exact
hash parity despite being 'iterative float' queries.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

ALPHA, BETA, GAMMA = 0.3, 0.1, 0.2
M = 7  # weekly seasonality over the observed-day index


@register(
    "q_ts_holt_winters",
    oracle=f"""
    WITH RECURSIVE d AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
               day, v
        FROM (SELECT o_orderdate AS day,
                     CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT))
                          AS BIGINT) AS v
              FROM orders GROUP BY 1)),
    n AS (SELECT CAST(MAX(t) AS BIGINT) AS n FROM d),
    s1 AS (SELECT SUM(v) AS w1 FROM d WHERE t BETWEEN 1 AND {M}),
    s2 AS (SELECT SUM(v) AS w2 FROM d WHERE t BETWEEN {M + 1} AND {2 * M}),
    init AS (
        SELECT CAST(w1 AS DOUBLE) / {M} AS l0,
               (CAST(w2 AS DOUBLE) / {M} - CAST(w1 AS DOUBLE) / {M}) / {M}
                   AS b0
        FROM s1, s2),
    r(t, l, b, p1, p2, p3, p4, p5, p6, p7, fitted) AS (
        SELECT CAST({M} AS BIGINT), init.l0, init.b0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 7) - init.l0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 6) - init.l0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 5) - init.l0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 4) - init.l0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 3) - init.l0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 2) - init.l0,
               (SELECT CAST(v AS DOUBLE) FROM d WHERE t = 1) - init.l0,
               CAST(NULL AS DOUBLE)
        FROM init
        UNION ALL
        SELECT r.t + 1,
               {ALPHA} * (dd.v - r.p7) + {1 - ALPHA} * (r.l + r.b),
               {BETA} * (({ALPHA} * (dd.v - r.p7)
                          + {1 - ALPHA} * (r.l + r.b)) - r.l)
                   + {1 - BETA} * r.b,
               {GAMMA} * (dd.v - ({ALPHA} * (dd.v - r.p7)
                                  + {1 - ALPHA} * (r.l + r.b)))
                   + {1 - GAMMA} * r.p7,
               r.p1, r.p2, r.p3, r.p4, r.p5, r.p6,
               r.l + r.b + r.p7
        FROM r JOIN d dd ON dd.t = r.t + 1),
    fit AS (
        SELECT r.t, d.day, d.v AS actual, r.fitted
        FROM r JOIN d ON d.t = r.t
        WHERE r.fitted IS NOT NULL),
    lastn AS (
        SELECT * FROM fit ORDER BY t DESC LIMIT 10)
    SELECT day, actual,
           ROUND(fitted, 6) AS fitted,
           ROUND(ABS(actual - fitted) / actual, 6) AS ape
    FROM lastn ORDER BY day
    """,
)
def q_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level, trend, period-{M} seasonality
    over the observed-day index; α={ALPHA}, β={BETA}, γ={GAMMA}) on
    daily order revenue, reporting the last 10 one-step-ahead fits and
    their absolute percentage errors — the classic triple-smoothing
    forecaster (Winters 1960) the ewma/decompose queries stop short
    of. All smoothing state is seeded from INTEGER day sums, so the
    sequential double recursion is bit-identical in Spark's Arrow
    batch and the oracle's recursive CTE.

    Scale: the fact aggregates distributed to day grain (constant
    thousands of rows); the recursion is O(days) in ONE Arrow batch —
    state-space fitting is sequential in time no matter the engine,
    so the right 100 TB plan is exactly this funnel."""
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
    )

    out_schema = "day timestamp, actual long, fitted double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        v = pdf["v"].astype("int64").tolist()
        n = len(v)
        if n < 2 * M + 1:
            return pd.DataFrame({"day": [], "actual": [], "fitted": []})
        w1 = sum(v[0:M])
        w2 = sum(v[M:2 * M])
        l = w1 / M
        b = (w2 / M - w1 / M) / M
        # p[0] = s_t, p[6] = s_{t-6}; seeded from the first week
        p = [v[M - 1 - i] - l for i in range(M)]
        rows = []
        for t in range(M + 1, n + 1):
            y = float(v[t - 1])
            fitted = l + b + p[6]
            l_new = ALPHA * (y - p[6]) + (1 - ALPHA) * (l + b)
            b = BETA * (l_new - l) + (1 - BETA) * b
            s_new = GAMMA * (y - l_new) + (1 - GAMMA) * p[6]
            p = [s_new] + p[:6]
            l = l_new
            rows.append((pdf["day"].iloc[t - 1], v[t - 1], fitted))
        # last 10 fits; rounding happens Spark-side (HALF_UP, matching
        # the oracle's ROUND — pandas .round is banker's)
        return pd.DataFrame(rows, columns=["day", "actual", "fitted"]).tail(10)

    return (
        d.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: fit(pdf), schema=out_schema)
        .select(
            "day", "actual",
            F.round("fitted", 6).alias("fitted"),
            F.round(
                F.abs(F.col("actual") - F.col("fitted")) / F.col("actual"), 6
            ).alias("ape"),
        )
        .orderBy("day")
    )


@register(
    "q_ts_croston",
    oracle="""
    WITH RECURSIVE dem AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
               day, q
        FROM (SELECT o_orderdate AS day,
                     CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                          AS BIGINT) AS q
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE l_partkey % 997 = 0
              GROUP BY 1)),
    gaps AS (
        SELECT i, day, q,
               CAST(COALESCE(
                   DATE_DIFF('day',
                             LAG(CAST(day AS DATE)) OVER (ORDER BY i),
                             CAST(day AS DATE)), 0) AS BIGINT) AS gap
        FROM dem),
    r(i, z, x) AS (
        SELECT CAST(1 AS BIGINT),
               (SELECT CAST(q AS DOUBLE) FROM gaps WHERE i = 1),
               CAST(1.0 AS DOUBLE)
        UNION ALL
        SELECT r.i + 1,
               0.2 * CAST(g.q AS DOUBLE) + 0.8 * r.z,
               0.2 * CAST(g.gap AS DOUBLE) + 0.8 * r.x
        FROM r JOIN gaps g ON g.i = r.i + 1),
    last AS (SELECT * FROM r ORDER BY i DESC LIMIT 1),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_demands FROM dem)
    SELECT cnt.n_demands,
           ROUND(last.z, 6) AS smoothed_size,
           ROUND(last.x, 6) AS smoothed_interval_days,
           ROUND(last.z / last.x, 6) AS demand_rate_per_day
    FROM last, cnt
    """,
)
def q_ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) for INTERMITTENT demand — the sparse-
    series case where Holt-Winters degenerates: a rare part family
    (partkey % 997 = 0) sells on scattered days, so Croston smooths
    the demand SIZES and the INTER-DEMAND intervals separately
    (α=0.2 each) and forecasts rate = size/interval. One summary row:
    demand count, both smoothed states, the rate. Seeded from integer
    quantities and calendar-day gaps, so the sequential recursion is
    engine-exact.

    Scale: the join+filter reduces the fact to the sparse part
    family's demand days (hundreds); the recursion is O(demand days)
    in one Arrow batch, like every Croston implementation."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    dem = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("l_partkey") % 997 == 0)
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
    )

    out_schema = "n_demands long, z double, x double"

    def croston(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) == 0:
            return pd.DataFrame(columns=["n_demands", "z", "x"])
        days = pd.to_datetime(pdf["day"]).dt.normalize()
        gaps = days.diff().dt.days.fillna(0).astype("int64").tolist()
        q = pdf["q"].astype("int64").tolist()
        z = float(q[0])
        x = 1.0
        for i in range(1, len(q)):
            z = 0.2 * q[i] + 0.8 * z
            x = 0.2 * gaps[i] + 0.8 * x
        return pd.DataFrame({"n_demands": [len(q)], "z": [z], "x": [x]})

    return (
        dem.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: croston(pdf), schema=out_schema)
        .select(
            "n_demands",
            F.round("z", 6).alias("smoothed_size"),
            F.round("x", 6).alias("smoothed_interval_days"),
            F.round(F.col("z") / F.col("x"), 6).alias("demand_rate_per_day"),
        )
    )
