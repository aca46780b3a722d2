"""Round-6 wave 81: propensity-stratification ATT (the observational
causal estimate the DiD/CUPED family was missing), the entropy rate
of the user-journey Markov chain (per-cell micro-quantized
information terms), and a Ljung-Box residual-whiteness test (exact
day-grain moments, fixed-order 3-term sum). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_propensity_att",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS treated,
               CAST(COUNT(*) AS BIGINT) AS activity,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents
        FROM events GROUP BY user_id),
    strata AS (
        SELECT treated, cents,
               NTILE(10) OVER (ORDER BY activity, user_id) AS b
        FROM per_user),
    h AS (
        SELECT b,
               CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nt,
               CAST(SUM(CASE WHEN treated = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS st,
               CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN treated = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sc
        FROM strata GROUP BY b),
    used AS (SELECT * FROM h WHERE nt > 0 AND nc > 0),
    terms AS (
        SELECT nt,
               CAST(ROUND(nt * (CAST(st AS DOUBLE) / nt
                                - CAST(sc AS DOUBLE) / nc) * 10000)
                    AS BIGINT) AS t4
        FROM used),
    att AS (
        SELECT CAST(SUM(nt) AS BIGINT) AS n_treated,
               CAST(SUM(t4) AS BIGINT) AS s4,
               CAST(COUNT(*) AS BIGINT) AS n_strata
        FROM terms),
    naive AS (
        SELECT (SELECT CAST(SUM(cents) AS DOUBLE) / SUM(1)
                FROM per_user WHERE treated = 1)
               - (SELECT CAST(SUM(cents) AS DOUBLE) / SUM(1)
                  FROM per_user WHERE treated = 0) AS d_naive)
    SELECT a.n_strata, a.n_treated,
           ROUND(CAST(a.s4 AS DOUBLE) / a.n_treated / 1000000.0 + 0.0, 6)
               AS att_dollars,
           ROUND(n.d_naive / 100.0 + 0.0, 6) AS naive_diff_dollars
    FROM att a CROSS JOIN naive n
    """,
)
def q_evt_propensity_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-stratification ATT: users are stratified into 10
    activity deciles (the propensity-score stand-in), the treated-
    vs-control spend difference is measured WITHIN each stratum, and
    strata combine weighted by treated counts — the classic
    subclassification estimator that removes confounding the naive
    difference keeps (both are reported for contrast). Per-stratum
    terms are quantized to integer 10⁻⁴-cents before the cross-
    stratum sum.

    Scale: one fact pass to user grain, the user-grain NTILE, a
    10-row stratum table — same shape as the uplift query; strata
    lacking either arm are dropped identically in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.count(F.lit(1)).alias("activity"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("cents"),
    )
    strata = per_user.select(
        "treated",
        "cents",
        F.ntile(10).over(Window.orderBy("activity", "user_id")).alias("b"),
    )
    t1 = F.col("treated") == 1
    h = strata.groupBy("b").agg(
        F.sum(F.when(t1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(t1, F.col("cents")).otherwise(0)).alias("st"),
        F.sum(F.when(~t1, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(~t1, F.col("cents")).otherwise(0)).alias("sc"),
    )
    used = h.filter((F.col("nt") > 0) & (F.col("nc") > 0))
    terms = used.select(
        "nt",
        F.round(
            F.col("nt")
            * (
                F.col("st").cast("double") / F.col("nt")
                - F.col("sc").cast("double") / F.col("nc")
            )
            * 10000
        )
        .cast("long")
        .alias("t4"),
    )
    att = terms.agg(
        F.sum("nt").alias("n_treated"),
        F.sum("t4").alias("s4"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    naive = per_user.agg(
        (
            F.sum(F.when(t1, F.col("cents"))).cast("double")
            / F.sum(F.when(t1, 1))
            - F.sum(F.when(~t1, F.col("cents"))).cast("double")
            / F.sum(F.when(~t1, 1))
        ).alias("d_naive")
    )
    return att.crossJoin(F.broadcast(naive)).select(
        "n_strata",
        "n_treated",
        F.round(
            F.col("s4").cast("double") / F.col("n_treated") / 1000000.0, 6
        ).alias("att_dollars"),
        F.round(F.col("d_naive") / 100.0, 6).alias("naive_diff_dollars"),
    )


@register(
    "q_evt_entropy_rate",
    oracle="""
    WITH pairs AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    c AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
          FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    r AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS r FROM c GROUP BY cur),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
    terms AS (
        SELECT CAST(ROUND(c.c * LN(CAST(r.r AS DOUBLE) / c.c) * 1000000)
                    AS BIGINT) AS t6
        FROM c JOIN r ON r.cur = c.cur),
    s AS (SELECT CAST(SUM(t6) AS BIGINT) AS s6,
                 CAST(COUNT(*) AS BIGINT) AS n_cells
          FROM terms)
    SELECT s.n_cells, n.n AS n_transitions,
           ROUND(CAST(s.s6 AS DOUBLE) / n.n / 1000000.0, 6)
               AS entropy_rate_nats,
           ROUND(EXP(CAST(s.s6 AS DOUBLE) / n.n / 1000000.0), 6)
               AS perplexity
    FROM s CROSS JOIN n
    """,
)
def q_evt_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-journey Markov chain: H = Σ_ij
    (c_ij/N)·ln(r_i/c_ij) over the empirical transition counts — how
    predictable the next event is given the current one (the
    information-theoretic ceiling for any next-event model), with
    behavioral perplexity e^H. Per-cell information terms are
    micro-quantized before the k²-cell sum, so the reduction is exact
    integer arithmetic; ln arguments are ratios of exact counts.

    Scale: one keyed LEAD pass to transition-count grain (k² rows),
    constant-size arithmetic after — the same contract as the Markov
    stationary/removal family this completes.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    r = c.groupBy("cur").agg(F.sum("c").alias("r"))
    n = c.agg(F.sum("c").alias("n"))
    terms = c.join(F.broadcast(r), "cur").select(
        F.round(
            F.col("c")
            * F.log(F.col("r").cast("double") / F.col("c"))
            * 1000000
        )
        .cast("long")
        .alias("t6")
    )
    s = terms.agg(
        F.sum("t6").alias("s6"), F.count(F.lit(1)).alias("n_cells")
    )
    return s.crossJoin(F.broadcast(n)).select(
        "n_cells",
        F.col("n").alias("n_transitions"),
        F.round(
            F.col("s6").cast("double") / F.col("n") / 1000000.0, 6
        ).alias("entropy_rate_nats"),
        F.round(
            F.exp(F.col("s6").cast("double") / F.col("n") / 1000000.0), 6
        ).alias("perplexity"),
    )


_LB_SQL = """
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS v
        FROM {orders} GROUP BY 1),
    ld AS (
        SELECT v,
               LEAD(v, 1) OVER (ORDER BY day) AS v1,
               LEAD(v, 2) OVER (ORDER BY day) AS v2,
               LEAD(v, 3) OVER (ORDER BY day) AS v3
        FROM d),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS DECIMAL(38, 0)) AS s,
               SUM(CAST(v AS DECIMAL(38, 0)) * CAST(v AS DECIMAL(38, 0)))
                   AS s2,
               SUM(CAST(v AS DECIMAL(38, 0)) * CAST(v1 AS DECIMAL(38, 0)))
                   AS p1,
               SUM(CASE WHEN v1 IS NOT NULL
                        THEN CAST(v AS DECIMAL(38, 0)) ELSE 0 END) AS h1,
               SUM(CAST(COALESCE(v1, 0) AS DECIMAL(38, 0))) AS t1,
               SUM(CAST(v AS DECIMAL(38, 0)) * CAST(v2 AS DECIMAL(38, 0)))
                   AS p2,
               SUM(CASE WHEN v2 IS NOT NULL
                        THEN CAST(v AS DECIMAL(38, 0)) ELSE 0 END) AS h2,
               SUM(CAST(COALESCE(v2, 0) AS DECIMAL(38, 0))) AS t2,
               SUM(CAST(v AS DECIMAL(38, 0)) * CAST(v3 AS DECIMAL(38, 0)))
                   AS p3,
               SUM(CASE WHEN v3 IS NOT NULL
                        THEN CAST(v AS DECIMAL(38, 0)) ELSE 0 END) AS h3,
               SUM(CAST(COALESCE(v3, 0) AS DECIMAL(38, 0))) AS t3
        FROM ld),
    r AS (
        SELECT n,
               (CAST(p1 AS DOUBLE) - CAST(s AS DOUBLE) / n
                * (CAST(h1 AS DOUBLE) + CAST(t1 AS DOUBLE))
                + (n - 1) * (CAST(s AS DOUBLE) / n)
                  * (CAST(s AS DOUBLE) / n))
               / (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                  * CAST(s AS DOUBLE) / n) AS r1,
               (CAST(p2 AS DOUBLE) - CAST(s AS DOUBLE) / n
                * (CAST(h2 AS DOUBLE) + CAST(t2 AS DOUBLE))
                + (n - 2) * (CAST(s AS DOUBLE) / n)
                  * (CAST(s AS DOUBLE) / n))
               / (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                  * CAST(s AS DOUBLE) / n) AS r2,
               (CAST(p3 AS DOUBLE) - CAST(s AS DOUBLE) / n
                * (CAST(h3 AS DOUBLE) + CAST(t3 AS DOUBLE))
                + (n - 3) * (CAST(s AS DOUBLE) / n)
                  * (CAST(s AS DOUBLE) / n))
               / (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                  * CAST(s AS DOUBLE) / n) AS r3
        FROM m)
    SELECT n AS n_days,
           ROUND(r1 + 0.0, 6) AS acf_1,
           ROUND(r2 + 0.0, 6) AS acf_2,
           ROUND(r3 + 0.0, 6) AS acf_3,
           ROUND(n * (n + 2.0) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                                  + r3 * r3 / (n - 3)) + 0.0, 6)
               AS ljung_box_q
    FROM r
"""


@register("q_ts_ljung_box", oracle=_LB_SQL.format(orders="orders"))
def q_ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1-3) on daily revenue: the
    "is anything left to model" whiteness diagnostic — Q = n(n+2)·
    Σ r_k²/(n−k) against χ²₃. The ACFs use the Box-Jenkins
    convention (global mean, full-series denominator) computed from
    EXACT DECIMAL(38,0) day-grain moments: lagged products, head and
    tail sums per lag — so r₁..r₃ are identical closed-form doubles
    in both engines and the 3-term Q is a fixed-order expression,
    not a row-order-dependent SUM.

    Scale: the fact collapses to day grain before the single LEAD
    window; one moments aggregate; constant-size arithmetic after —
    completing the forecast-diagnostics family (ACF/PACF/decompose →
    residual whiteness).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_lb_v"
    )
    return spark.sql(_LB_SQL.format(orders="orders_lb_v"))
