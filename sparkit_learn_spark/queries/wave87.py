"""Round-6 wave 87: farthest-first k-means seeding (the
deterministic k-means++ variant, exact integer distances), Bollinger
bands with exact-integer rolling frame sums (no segment-tree float
order hazard), and the Hodges-Lehmann pseudo-median (Walsh-average
median at day grain). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_X = "((c_custkey * 2654435761) % 4294967296) % 1000"
_Y = "((c_custkey * 40503) % 65536) % 1000"


def _kpp_round(prev_centers: str, new: str, k: int) -> str:
    """Pick the point maximizing min squared distance to chosen
    centers (exact integers, ties to smallest key)."""
    return f"""{new} AS (
        SELECT * FROM {prev_centers}
        UNION ALL
        SELECT p.c_custkey, p.x, p.y, {k} AS rank
        FROM pts p
        WHERE p.c_custkey = (
            SELECT pp.c_custkey FROM pts pp
            JOIN (SELECT pp2.c_custkey,
                         MIN((pp2.x - c.x) * (pp2.x - c.x)
                             + (pp2.y - c.y) * (pp2.y - c.y)) AS d2
                  FROM pts pp2 CROSS JOIN {prev_centers} c
                  GROUP BY pp2.c_custkey) d
              ON d.c_custkey = pp.c_custkey
            ORDER BY d.d2 DESC, pp.c_custkey LIMIT 1))"""


_KPP_SQL = """
    WITH pts AS MATERIALIZED (
        SELECT c_custkey, {x} AS x, {y} AS y FROM {customer}),
    c1 AS (
        SELECT c_custkey, x, y, 1 AS rank FROM pts
        ORDER BY c_custkey LIMIT 1),
    {r2},
    {r3},
    {r4}
    SELECT CAST(rank AS BIGINT) AS rank, c_custkey,
           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM c4 ORDER BY rank
"""


def _kpp_sql(customer: str) -> str:
    return _KPP_SQL.format(
        customer=customer,
        x=_X,
        y=_Y,
        r2=_kpp_round("c1", "c2", 2),
        r3=_kpp_round("c2", "c3", 3),
        r4=_kpp_round("c3", "c4", 4),
    )


@register("q_ml_kmeanspp_init", oracle=_kpp_sql("customer"))
def q_ml_kmeanspp_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first k-means seeding (the deterministic k-means++
    variant: instead of sampling ∝ D², take the D² argmax — the
    2-approximation of k-center): seed with the minimum key, then
    three rounds of "add the point farthest from its nearest chosen
    center". Distances are exact integers on the portable hash
    plane, argmax ties break on the key, so the seeding is bit-exact
    across engines — the deterministic initialization a reproducible
    distributed k-means wants.

    Scale: each round is one point-grain pass (min-distance to ≤4
    broadcast centers) plus a top-1 reduction — O(k·n) total, the
    standard scalable seeding shape (k-means‖ batches the same
    computation).
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey", F.expr(_X).alias("x"), F.expr(_Y).alias("y")
    ).persist()
    centers = (
        pts.orderBy("c_custkey")
        .limit(1)
        .select("c_custkey", "x", "y", F.lit(1).alias("rank"))
        .localCheckpoint(eager=True)
    )
    for k in range(2, 5):
        cc = centers.select(
            F.col("x").alias("cx"), F.col("y").alias("cy")
        )
        d2 = (
            pts.crossJoin(F.broadcast(cc))
            .groupBy("c_custkey", "x", "y")
            .agg(
                F.min(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                    + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
                ).alias("d2")
            )
        )
        nxt = (
            d2.orderBy(F.col("d2").desc(), "c_custkey")
            .limit(1)
            .select("c_custkey", "x", "y", F.lit(k).alias("rank"))
        )
        centers = centers.unionAll(nxt).localCheckpoint(eager=True)
    return centers.select(
        F.col("rank").cast("long").alias("rank"),
        "c_custkey",
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    ).orderBy("rank")


_BB_WIN = 20


@register(
    "q_ts_bollinger",
    oracle=f"""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS v
        FROM orders GROUP BY 1),
    r AS (
        SELECT day, v,
               SUM(v) OVER w AS s,
               SUM(CAST(v AS DECIMAL(38, 0)) * CAST(v AS DECIMAL(38, 0)))
                   OVER w AS s2,
               COUNT(*) OVER w AS n
        FROM d
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {_BB_WIN - 1} PRECEDING AND CURRENT ROW)),
    bands AS (
        SELECT day, v, n,
               CAST(s AS DOUBLE) / n AS mid,
               SQRT((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / (n - 1)) AS sd
        FROM r WHERE n = {_BB_WIN}),
    flags AS (
        SELECT day, v,
               CASE WHEN v > mid + 2 * sd THEN 1 ELSE 0 END AS brk_up,
               CASE WHEN v < mid - 2 * sd THEN 1 ELSE 0 END AS brk_dn
        FROM bands)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(brk_up) AS BIGINT) AS n_breakout_up,
           CAST(SUM(brk_dn) AS BIGINT) AS n_breakout_down,
           MAX(CASE WHEN brk_up = 1 THEN day END) AS last_breakout_up
    FROM flags
    """,
)
def q_ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakouts on daily revenue: 20-day rolling mean
    ± 2σ, counting band breaches. The rolling variance comes from
    EXACT integer frame sums (Σv and Σv² in DECIMAL(38,0) over the
    ROWS frame), not a float windowed STDDEV — windowed float
    aggregation uses segment trees whose summation order differs
    between engines; integer frame sums cannot. The anomaly-band
    pattern behind ops dashboards and trading signals alike.

    Scale: the fact collapses to day grain before the single ordered
    window (dimension-sized, the documented post-shrink contract);
    breach tests are row-local doubles from exact sums.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day").rowsBetween(-(_BB_WIN - 1), 0)
    r = d.select(
        "day",
        "v",
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v").cast(dec) * F.col("v").cast(dec)).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") == _BB_WIN)
    mid = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    flags = r.select(
        "day",
        (F.col("v") > mid + 2 * sd).cast("long").alias("brk_up"),
        (F.col("v") < mid - 2 * sd).cast("long").alias("brk_dn"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("brk_up").alias("n_breakout_up"),
        F.sum("brk_dn").alias("n_breakout_down"),
        F.max(F.when(F.col("brk_up") == 1, F.col("day"))).alias(
            "last_breakout_up"
        ),
    )


@register(
    "q_stat_hodges_lehmann",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS v
        FROM orders GROUP BY 1),
    walsh AS (
        SELECT a.v + b.v AS w2
        FROM d a JOIN d b ON a.day <= b.day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM walsh),
    h AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c FROM walsh GROUP BY w2),
    cum AS (SELECT w2, SUM(c) OVER (ORDER BY w2) AS cc FROM h),
    med AS (
        SELECT MIN(w2) AS w2m FROM cum CROSS JOIN n
        WHERE cc >= (n.n + 1) // 2)
    SELECT n.n AS n_walsh_pairs,
           ROUND(med.w2m / 2.0, 6) AS hodges_lehmann,
           (SELECT ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) FROM d)
               AS plain_mean
    FROM n CROSS JOIN med
    """,
)
def q_stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of daily revenue: the median of
    all Walsh averages (v_i + v_j)/2 over day pairs i ≤ j — the
    location estimator associated with the Wilcoxon test (robust
    like the median, more efficient near normality), reported beside
    the plain mean. Pair sums stay exact integers (medians taken on
    2v to avoid halves), and the median is the histogram cumulative-
    crossing order statistic — no global sort.

    Scale: the fact collapses to day grain first, so the pairwise
    Walsh set is days² (dimension-sized, same contract as Theil-Sen
    and Mann-Kendall), distributed as a self-join.
    """
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
        .persist()
    )
    a = d.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = d.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (F.col("va") + F.col("vb")).alias("w2")
    )
    walsh = walsh.persist()
    n = walsh.agg(F.count(F.lit(1)).alias("n"))
    h = walsh.groupBy("w2").agg(F.count(F.lit(1)).alias("c"))
    cum = h.select("w2", F.sum("c").over(Window.orderBy("w2")).alias("cc"))
    med = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .agg(F.min("w2").alias("w2m"))
    )
    mean = d.agg(
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias(
            "plain_mean"
        )
    )
    return (
        n.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mean))
        .select(
            F.col("n").alias("n_walsh_pairs"),
            F.round(F.col("w2m") / 2.0, 6).alias("hodges_lehmann"),
            F.col("plain_mean"),
        )
    )
