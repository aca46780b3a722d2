"""Round-6 wave 99: extreme-value analysis (Gumbel fit on monthly
block maxima, method of moments), Poisson goodness-of-fit for basket
sizes (literal-factorial expected counts), and weighted reciprocity
of the directed event-transition graph. All exactly DuckDB-oracled
from exact integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_gumbel_maxima",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    mx AS (
        SELECT DATE_TRUNC('month', day) AS month,
               CAST(MAX(v) AS BIGINT) AS m
        FROM d GROUP BY 1),
    mo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(m) AS s,
               SUM(CAST(m * m AS DECIMAL(38, 0))) AS q
        FROM mx),
    p AS (
        SELECT n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                   AS sd
        FROM mo),
    g AS (
        SELECT n, mean, sd,
               sd * 0.7796968012336403 AS beta,
               mean - 0.5772156649015329 * sd * 0.7796968012336403 AS mu
        FROM p)
    SELECT n AS n_months,
           ROUND(mu, 6) AS gumbel_mu,
           ROUND(beta, 6) AS gumbel_beta,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 12)), 6) AS level_1y,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 120)), 6) AS level_10y
    FROM g
    """,
)
def q_stat_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of daily revenue: Gumbel fit on monthly
    block maxima by method of moments (β = s·√6/π, μ = m̄ − γ·β) and
    the implied 12-month and 120-month return levels — "what's the
    biggest day we should provision for per year / per decade?", the
    capacity-planning question a mean+3σ rule answers wrongly because
    maxima aren't Gaussian. Block maxima and their two moments are
    exact integers; the fit is four literal-constant double
    expressions, exactly oracled.

    Scale: day grain → month grain → two moments; block-maxima EVT is
    embarrassingly aggregable (the blocks ARE the partition), which
    is why it beats peaks-over-threshold at warehouse scale."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    mx = d.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.max("v").alias("m")
    )
    mo = mx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("s"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,0)")).alias("q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    sd = F.sqrt(
        (nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
        / (nd * (nd - 1))
    )
    g = mo.select(
        "n",
        (sd * 0.7796968012336403).alias("beta"),
        (mean - 0.5772156649015329 * sd * 0.7796968012336403).alias("mu"),
    )
    import math

    return g.select(
        F.col("n").alias("n_months"),
        F.round("mu", 6).alias("gumbel_mu"),
        F.round("beta", 6).alias("gumbel_beta"),
        F.round(
            F.col("mu") - F.col("beta") * math.log(-math.log(1 - 1.0 / 12)), 6
        ).alias("level_1y"),
        F.round(
            F.col("mu") - F.col("beta") * math.log(-math.log(1 - 1.0 / 120)), 6
        ).alias("level_10y"),
    )


@register(
    "q_fin_basket_poisson",
    oracle="""
    WITH b AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
        FROM lineitem GROUP BY 1),
    h AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS obs FROM b GROUP BY k),
    m AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                 CAST(SUM(k * obs) AS BIGINT) AS s FROM h),
    lam AS (SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS lam FROM m),
    e AS (
        SELECT h.k, h.obs, lam.n, lam.lam,
               CAST(lam.n AS DOUBLE) * EXP(-lam.lam) * POW(lam.lam, h.k)
                 / (CASE h.k WHEN 1 THEN 1.0 WHEN 2 THEN 2.0 WHEN 3 THEN 6.0
                    WHEN 4 THEN 24.0 WHEN 5 THEN 120.0 WHEN 6 THEN 720.0
                    WHEN 7 THEN 5040.0 ELSE 40320.0 END) AS expected
        FROM h CROSS JOIN lam),
    chi AS (
        SELECT SUM((CAST(obs AS DOUBLE) - expected)
                   * (CAST(obs AS DOUBLE) - expected) / expected) AS chi2
        FROM e)
    SELECT e.k AS basket_size, e.obs AS n_orders,
           ROUND(e.expected, 6) AS poisson_expected,
           ROUND(e.lam, 6) AS lambda,
           ROUND(chi.chi2, 6) AS chi2_total
    FROM e CROSS JOIN chi ORDER BY basket_size
    """,
)
def q_fin_basket_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson goodness-of-fit for basket sizes (line items per
    order, k = 1..7 by TPC-H construction): observed histogram vs the
    Poisson expectation n·e^(−λ)λ^k/k! at the MLE λ = mean, with the
    chi-square misfit — "are basket sizes memoryless, or do customers
    batch?" (TPC-H's uniform 1..7 will fail loudly — the test
    DETECTING that is the point). Factorials are literal constants,
    the histogram is exact integers, so expected counts and chi²
    are bit-identical doubles, exactly oracled.

    Scale: order-grain count → basket-size-domain histogram (≤8
    rows of state) — distribution-shape testing at any scale for the
    cost of one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    h = b.groupBy("k").agg(F.count(F.lit(1)).alias("obs"))
    m = h.agg(F.sum("obs").alias("n"), F.sum(F.col("k") * F.col("obs")).alias("s"))
    lam = m.select("n", (F.col("s").cast("double") / F.col("n").cast("double")).alias("lam"))
    fact = (
        F.when(F.col("k") == 1, 1.0)
        .when(F.col("k") == 2, 2.0)
        .when(F.col("k") == 3, 6.0)
        .when(F.col("k") == 4, 24.0)
        .when(F.col("k") == 5, 120.0)
        .when(F.col("k") == 6, 720.0)
        .when(F.col("k") == 7, 5040.0)
        .otherwise(40320.0)
    )
    e = h.crossJoin(F.broadcast(lam)).select(
        "k",
        "obs",
        "lam",
        (
            F.col("n").cast("double")
            * F.exp(-F.col("lam"))
            * F.pow(F.col("lam"), F.col("k"))
            / fact
        ).alias("expected"),
    )
    chi = e.agg(
        F.sum(
            (F.col("obs").cast("double") - F.col("expected"))
            * (F.col("obs").cast("double") - F.col("expected"))
            / F.col("expected")
        ).alias("chi2")
    )
    return (
        e.crossJoin(F.broadcast(chi))
        .select(
            F.col("k").alias("basket_size"),
            F.col("obs").alias("n_orders"),
            F.round("expected", 6).alias("poisson_expected"),
            F.round("lam", 6).alias("lambda"),
            F.round("chi2", 6).alias("chi2_total"),
        )
        .orderBy("basket_size")
    )


@register(
    "q_graph_reciprocity",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type AS t, ts, event_id,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events),
    e AS (
        SELECT t AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS w
        FROM s WHERE nxt IS NOT NULL AND nxt <> t
        GROUP BY 1, 2),
    p AS (
        SELECT e.src, e.dst, e.w, COALESCE(r.w, 0) AS w_rev
        FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src),
    tot AS (
        SELECT CAST(SUM(w) AS BIGINT) AS total,
               CAST(SUM(LEAST(w, w_rev)) AS BIGINT) AS recip
        FROM p)
    SELECT p.src, p.dst, p.w AS n_transitions,
           CAST(p.w_rev AS BIGINT) AS n_reverse,
           ROUND(CAST(p.w - p.w_rev AS DOUBLE)
                 / CAST(p.w + p.w_rev AS DOUBLE), 6) AS asymmetry,
           ROUND((SELECT CAST(recip AS DOUBLE) / CAST(total AS DOUBLE)
                  FROM tot), 6) AS graph_reciprocity
    FROM p ORDER BY p.w DESC, p.src, p.dst LIMIT 10
    """,
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reciprocity of the directed event-transition graph:
    per consecutive-event-type edge, the flow asymmetry
    (w−w̄)/(w+w̄) against the reverse edge, plus the graph-level
    weighted reciprocity Σmin(w, w̄)/Σw (Squartini-Garlaschelli) —
    does the funnel actually flow one way (view→cart→purchase), or
    do users bounce back? q_evt_transitions gives the Markov
    matrix; this grades its DIRECTIONALITY. Exact integer edge
    weights, self-join for the reverse edge, exactly oracled.

    Scale: one per-user ordered window pass (bounded partitions) to
    an event-type² edge list — dimension-sized state; the reverse
    lookup is a self-join on an 8×8 table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("t"), F.lead("event_type").over(w).alias("nxt")
    )
    e = (
        s.filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("t")))
        .groupBy(F.col("t").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .persist()
    )
    r = e.select(F.col("src").alias("rsrc"), F.col("dst").alias("rdst"), F.col("w").alias("w_rev"))
    p = e.join(
        r, (F.col("rsrc") == F.col("dst")) & (F.col("rdst") == F.col("src")), "left"
    ).select("src", "dst", "w", F.coalesce(F.col("w_rev"), F.lit(0)).alias("w_rev"))
    tot = p.agg(
        F.sum("w").alias("total"), F.sum(F.least("w", "w_rev")).alias("recip")
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "src",
            "dst",
            F.col("w").alias("n_transitions"),
            F.col("w_rev").cast("long").alias("n_reverse"),
            F.round(
                (F.col("w") - F.col("w_rev")).cast("double")
                / (F.col("w") + F.col("w_rev")).cast("double"),
                6,
            ).alias("asymmetry"),
            F.round(F.col("recip").cast("double") / F.col("total").cast("double"), 6).alias(
                "graph_reciprocity"
            ),
        )
        .orderBy(F.desc("n_transitions"), "src", "dst")
        .limit(10)
    )
