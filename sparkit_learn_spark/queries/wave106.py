"""Round-6 wave 106: fixed-period periodogram with literal
trigonometric roots (spectral power at periods 2-14 days + spectral
entropy), the adjusted Rand index between two deterministic
clusterings, and Kendall's W concordance across quality-signal
rankings. All exactly DuckDB-oracled — the trig values are decimal
LITERALS injected into both engines, so every power is a product of
identical doubles and exact integer residue sums.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_PERIODS = [2, 3, 4, 5, 6, 7, 14]

_ROOTS = [
    (p, r, repr(math.cos(2 * math.pi * r / p)), repr(math.sin(2 * math.pi * r / p)))
    for p in _PERIODS
    for r in range(p)
]

_ROOTS_SQL = " UNION ALL ".join(
    f"SELECT {p} AS p, {r} AS r, CAST({c} AS DOUBLE) AS cv, CAST({s} AS DOUBLE) AS sv"
    for p, r, c, s in _ROOTS
)

_PERIODS_SQL = " UNION ALL ".join(f"SELECT {p} AS p" for p in _PERIODS)


@register(
    "q_ts_periodogram",
    oracle=f"""
    WITH d AS (
        SELECT SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v,
               CAST(DATEDIFF('day', DATE '1992-01-01', o_orderdate)
                    AS BIGINT) AS t
        FROM orders GROUP BY o_orderdate),
    ps AS ({_PERIODS_SQL}),
    res AS (
        SELECT ps.p, d.t % ps.p AS r, CAST(SUM(d.v) AS BIGINT) AS s
        FROM d CROSS JOIN ps GROUP BY ps.p, d.t % ps.p),
    roots AS ({_ROOTS_SQL}),
    pw AS (
        SELECT res.p,
               SUM(CAST(res.s AS DOUBLE) * roots.cv) AS cs,
               SUM(CAST(res.s AS DOUBLE) * roots.sv) AS ss
        FROM res JOIN roots ON roots.p = res.p AND roots.r = res.r
        GROUP BY res.p),
    pw2 AS (SELECT p, cs * cs + ss * ss AS power FROM pw),
    tot AS (SELECT SUM(power) AS tp FROM pw2),
    ent AS (
        SELECT -SUM((power / tot.tp) * LN(power / tot.tp)) AS h
        FROM pw2 CROSS JOIN tot)
    SELECT CAST(pw2.p AS BIGINT) AS period_days,
           ROUND(pw2.power / tot.tp, 6) AS power_share,
           ROUND(ent.h, 6) AS spectral_entropy
    FROM pw2 CROSS JOIN tot CROSS JOIN ent
    ORDER BY period_days
    """,
)
def q_ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-period periodogram of daily revenue: spectral power at
    candidate periods 2-14 days via the residue-class trick — the
    DFT sum Σv·cos(2πt/p) collapses to Σ over residues r of
    S_r·cos(2πr/p), where S_r are EXACT integer sums and the trig
    values are shared decimal literals — plus the spectral entropy
    (low = one dominant cycle, high = noise). Generalizes the
    single-bin q_ts_dft_weekly into a full candidate-period scan
    without any engine trig (whose libm rounding could differ).

    Scale: one fact pass to day grain, one (period × residue)-grain
    aggregate (41 rows of state), one 41-row literal join — the
    periodogram costs one aggregate regardless of history length."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy("o_orderdate").agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v"),
        F.datediff(
            F.first("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).cast("long").alias("t"),
    )
    ps = spark.createDataFrame([(p,) for p in _PERIODS], ["p"])
    res = (
        d.crossJoin(F.broadcast(ps))
        .groupBy("p", (F.col("t") % F.col("p")).alias("r"))
        .agg(F.sum("v").alias("s"))
    )
    roots = spark.createDataFrame(
        [(p, r, float(c), float(s)) for p, r, c, s in _ROOTS],
        ["p", "r", "cv", "sv"],
    )
    pw = (
        res.join(F.broadcast(roots), ["p", "r"])
        .groupBy("p")
        .agg(
            F.sum(F.col("s").cast("double") * F.col("cv")).alias("cs"),
            F.sum(F.col("s").cast("double") * F.col("sv")).alias("ss"),
        )
        .select("p", (F.col("cs") * F.col("cs") + F.col("ss") * F.col("ss")).alias("power"))
    )
    # r12 (VERDICT r11 #1): the tot/ent/projection fan-out is now TWO
    # window passes over the 7-row pw frame (single tiny partition)
    # instead of two aggregate+crossJoin branches — structurally ONE
    # plan path, so the orders day-grain aggregate runs exactly once
    # with no persist (the r11 persist() of pw was net-negative at
    # sf0.1: fresh-JVM A/B cold 4.9 s -> 3.2 s, warm 1.7 -> 0.9 s).
    # Sum order inside the 7-row window matches the oracle at 6 dp
    # (re-proven at sf0.001/0.01/0.1).
    w_all = Window.partitionBy()
    pw2 = pw.withColumn("tp", F.sum("power").over(w_all))
    share = F.col("power") / F.col("tp")
    return (
        pw2.withColumn("h", -F.sum(share * F.log(share)).over(w_all))
        .select(
            F.col("p").cast("long").alias("period_days"),
            F.round(share, 6).alias("power_share"),
            F.round("h", 6).alias("spectral_entropy"),
        )
        .orderBy("period_days")
    )


@register(
    "q_ml_adjusted_rand",
    oracle="""
    WITH pts AS (
        SELECT c_custkey, c_mktsegment AS seg,
               ((c_custkey * 2654435761) % 4294967296) % 1000 AS x,
               ((c_custkey * 40503) % 65536) % 1000 AS y
        FROM customer),
    cl AS (
        SELECT c_custkey, seg,
               CASE WHEN x < 500 THEN 0 ELSE 1 END * 2
               + CASE WHEN y < 500 THEN 0 ELSE 1 END AS quad
        FROM pts),
    ct AS (
        SELECT seg, quad, CAST(COUNT(*) AS BIGINT) AS n
        FROM cl GROUP BY seg, quad),
    a AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS n FROM ct GROUP BY seg),
    b AS (SELECT quad, CAST(SUM(n) AS BIGINT) AS n FROM ct GROUP BY quad),
    s AS (
        SELECT (SELECT SUM(n * (n - 1) / 2) FROM ct) AS sum_ij,
               (SELECT SUM(n * (n - 1) / 2) FROM a) AS sum_a,
               (SELECT SUM(n * (n - 1) / 2) FROM b) AS sum_b,
               (SELECT SUM(n) FROM a) AS n
        FROM (SELECT 1))
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND((sum_ij - sum_a * sum_b / (n * (n - 1) / 2))
                 / ((sum_a + sum_b) / 2
                    - sum_a * sum_b / (n * (n - 1) / 2)), 6)
               AS adjusted_rand
    FROM s
    """,
)
def q_ml_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand index between two deterministic customer
    clusterings — the market segment labels vs the hash-plane
    quadrant assignment (the q_ml_kmeanspp_init feature space) — the
    chance-corrected agreement metric for comparing clusterings with
    different label sets (0 = random agreement, 1 = identical). The
    contingency table, marginals, and pair counts are exact integers;
    ARI is one closed-form double. (Expected ≈ 0 here by
    construction — the hash plane is independent of segments; the
    metric proving independence is the point.)

    Scale: the contingency table is (segments × quadrants)-grain —
    one aggregate pass, constant-size algebra after; ARI at any n for
    the cost of a groupBy."""
    c = load_table(spark, sf_dir, "customer")
    cl = c.select(
        F.col("c_mktsegment").alias("seg"),
        (
            F.when(F.expr("((c_custkey * 2654435761) % 4294967296) % 1000") < 500, 0).otherwise(1) * 2
            + F.when(F.expr("((c_custkey * 40503) % 65536) % 1000") < 500, 0).otherwise(1)
        ).alias("quad"),
    )
    ct = cl.groupBy("seg", "quad").agg(F.count(F.lit(1)).alias("n"))
    pair = lambda col: F.sum(F.expr(f"{col} * ({col} - 1) / 2"))  # noqa: E731
    sum_ij = ct.agg(pair("n").alias("v")).first()["v"]
    a = ct.groupBy("seg").agg(F.sum("n").alias("n"))
    b = ct.groupBy("quad").agg(F.sum("n").alias("n"))
    sum_a = a.agg(pair("n").alias("v")).first()["v"]
    sum_b = b.agg(pair("n").alias("v")).first()["v"]
    n = a.agg(F.sum("n").alias("n")).first()["n"]
    tot_pairs = n * (n - 1) / 2
    exp = sum_a * sum_b / tot_pairs
    ari = (sum_ij - exp) / ((sum_a + sum_b) / 2 - exp)
    return spark.createDataFrame(
        [(int(n), float(round(ari, 6)))], ["n_customers", "adjusted_rand"]
    )


@register(
    "q_stat_kendall_w",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(SUM(n_chars) AS BIGINT) AS v1,
               CAST(COUNT(*) AS BIGINT) AS v2,
               CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[^ ]+')) ) AS BIGINT)
                   AS v3
        FROM documents GROUP BY source),
    r AS (
        SELECT source,
               ROW_NUMBER() OVER (ORDER BY v1, source)
               + ROW_NUMBER() OVER (ORDER BY v2, source)
               + ROW_NUMBER() OVER (ORDER BY v3, source) AS rsum
        FROM s),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(rsum * rsum AS DECIMAL(38, 0))) AS sq,
               CAST(SUM(rsum) AS BIGINT) AS sr
        FROM r)
    SELECT n AS n_sources,
           ROUND((12 * CAST(sq AS DOUBLE)
                  - 3.0 * 9 * CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) + 1) * (CAST(n AS DOUBLE) + 1))
                 / (9 * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1)), 6)
               AS kendall_w
    FROM m
    """,
)
def q_stat_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W (coefficient of concordance) across three source
    rankings — by total characters, by document count, and by total
    words: do the three "size" signals rank the 20 sources the same
    way (W→1) or disagree (W→0)? The inter-rater agreement statistic
    for m rankers × n items, W = (12·ΣR² − 3m²n(n+1)²)/(m²n(n²−1)),
    with deterministic tie-breaks (ties → source name) so the ranks
    are integers in both engines.

    Scale: source-grain aggregates (bounded domain), three rank
    windows over 20 rows, one fold — concordance auditing is free at
    any corpus size once signals aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum("n_chars").alias("v1"),
        F.count(F.lit(1)).alias("v2"),
        F.sum(F.size(F.expr("regexp_extract_all(text, '[^ ]+', 0)"))).alias("v3"),
    )
    r = s.select(
        "source",
        (
            F.row_number().over(Window.orderBy("v1", "source"))
            + F.row_number().over(Window.orderBy("v2", "source"))
            + F.row_number().over(Window.orderBy("v3", "source"))
        ).cast("long").alias("rsum"),
    )
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("rsum") * F.col("rsum")).cast("decimal(38,0)")).alias("sq"),
        F.sum("rsum").alias("sr"),
    )
    nd = F.col("n").cast("double")
    w = (
        12 * F.col("sq").cast("double") - 3.0 * 9 * nd * (nd + 1) * (nd + 1)
    ) / (9 * nd * (nd * nd - 1))
    return m.select(F.col("n").alias("n_sources"), F.round(w, 6).alias("kendall_w"))
