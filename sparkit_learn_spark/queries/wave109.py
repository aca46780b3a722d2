"""Round-6 wave 109: leave-one-out window average (EXCLUDE CURRENT
ROW frame emulation), LLM watermark detection (green-list token
z-score with a portable hash vocabulary split), and an Engle-Granger
cointegration screen (residual serial correlation via exact
difference moments). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_win_loo_average",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    w AS (
        SELECT day, v,
               SUM(v) OVER f AS s, CAST(COUNT(*) OVER f AS BIGINT) AS n
        FROM d
        WINDOW f AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING))
    SELECT day, CAST(v AS BIGINT) AS revenue,
           ROUND(CAST(s - v AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6)
               AS loo_neighborhood_mean,
           ROUND(CAST(v AS DOUBLE)
                 / (CAST(s - v AS DOUBLE) / CAST(n - 1 AS DOUBLE)), 6)
               AS self_vs_neighbors
    FROM w WHERE n = 15 ORDER BY day
    """,
)
def q_win_loo_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out neighborhood mean: each day's revenue against
    the average of its ±7-day neighbors EXCLUDING itself — SQL's
    `EXCLUDE CURRENT ROW` frame, which Spark's window engine lacks,
    emulated exactly as (frame_sum − v)/(frame_count − 1). The LOO
    form is the honest anomaly baseline (including self dilutes the
    very spike being measured — a 15-day mean understates a 10× spike
    by 40%). Exact integer frame sums; ratio at 6dp.

    Scale: one bounded frame pass over the day grain — the exclusion
    emulation adds two arithmetic ops, not a second window."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    f = Window.orderBy("day").rowsBetween(-7, 7)
    w = d.select(
        "day",
        "v",
        F.sum("v").over(f).alias("s"),
        F.count(F.lit(1)).over(f).alias("n"),
    )
    loo = (F.col("s") - F.col("v")).cast("double") / (F.col("n") - 1).cast("double")
    return (
        w.filter(F.col("n") == 15)
        .select(
            "day",
            F.col("v").cast("long").alias("revenue"),
            F.round(loo, 6).alias("loo_neighborhood_mean"),
            F.round(F.col("v").cast("double") / loo, 6).alias("self_vs_neighbors"),
        )
        .orderBy("day")
    )


@register(
    "q_llm_watermark_detect",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w
        FROM documents),
    flag AS (
        SELECT doc_id,
               CASE WHEN SUBSTR(MD5(w), 1, 1) IN
                    ('0', '2', '4', '6', '8', 'a', 'c', 'e')
                    THEN 1 ELSE 0 END AS green
        FROM tok),
    g AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(green) AS BIGINT) AS ng
        FROM flag GROUP BY doc_id),
    z AS (
        SELECT doc_id, n, ng,
               (CAST(ng AS DOUBLE) - 0.5 * CAST(n AS DOUBLE))
                   / SQRT(0.25 * CAST(n AS DOUBLE)) AS zscore
        FROM g WHERE n >= 20)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_tested,
           CAST(SUM(CASE WHEN zscore > 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS flagged_docs,
           ROUND(AVG(zscore), 6) AS mean_z,
           ROUND(MAX(zscore), 6) AS max_z
    FROM z
    """,
)
def q_llm_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM watermark detection (Kirchenbauer-style green-list test):
    hash-partition the vocabulary into a 50% green list, count each
    document's green-token fraction, and z-test against the null
    Binomial(n, 0.5) — watermarked generations over-sample green
    tokens and light up at z > 4. The detection side of the
    soft-watermarking scheme, run corpus-wide as a screening pass
    (expected: ZERO flags on organic text — the clean baseline is the
    audit). The green list is a PORTABLE hash split — even parity of
    the token's first md5 hex nibble — identical in both engines, so
    the flag set is exactly oracled (the split only needs to be
    fixed, not secret).

    Scale: tokenize-explode map-side; per-doc conditional count;
    constant-size screening summary — watermark screening at corpus
    scale costs one wordcount pass."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("w"),
    )
    green = F.substring(F.md5("w"), 1, 1).isin(
        "0", "2", "4", "6", "8", "a", "c", "e"
    )
    g = tok.select("doc_id", F.when(green, 1).otherwise(0).alias("green")).groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("green").alias("ng"))
    z = g.filter(F.col("n") >= 20).select(
        (
            (F.col("ng").cast("double") - 0.5 * F.col("n").cast("double"))
            / F.sqrt(0.25 * F.col("n").cast("double"))
        ).alias("zscore")
    )
    return z.agg(
        F.count(F.lit(1)).alias("n_docs_tested"),
        F.sum(F.when(F.col("zscore") > 4, 1).otherwise(0)).alias("flagged_docs"),
        F.round(F.avg("zscore"), 6).alias("mean_z"),
        F.round(F.max("zscore"), 6).alias("max_z"),
    )


@register(
    "q_ts_cointegration",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'view'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY 1),
    l AS (
        SELECT day, x, y,
               x - LAG(x) OVER (ORDER BY day) AS dx,
               y - LAG(y) OVER (ORDER BY day) AS dy
        FROM d),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x * x AS DECIMAL(38, 0))) AS sxx,
               SUM(CAST(x * y AS DECIMAL(38, 0))) AS sxy,
               SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy,
               SUM(CAST(dx * dx AS DECIMAL(38, 0))) AS sdxx,
               SUM(CAST(dx * dy AS DECIMAL(38, 0))) AS sdxy,
               SUM(CAST(dy * dy AS DECIMAL(38, 0))) AS sdyy
        FROM l),
    b AS (
        SELECT n,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS beta,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS ayy,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS axy,
               CAST(sdxx AS DOUBLE) AS dxx, CAST(sdxy AS DOUBLE) AS dxy,
               CAST(sdyy AS DOUBLE) AS dyy
        FROM m)
    SELECT n AS n_days, ROUND(beta, 6) AS hedge_beta,
           ROUND((dyy - 2 * beta * dxy + beta * beta * dxx)
                 / (ayy - beta * axy), 6) AS residual_dw,
           ROUND(1 - (dyy - 2 * beta * dxy + beta * beta * dxx)
                     / (ayy - beta * axy) / 2, 6) AS residual_rho
    FROM b
    """,
)
def q_ts_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger cointegration screen between daily view value
    and purchase value: fit the long-run relation y = βx (the hedge
    ratio), then measure the RESIDUAL spread's serial correlation via
    the Durbin-Watson difference-moment expansion — residual_rho near
    0 means the spread mean-reverts fast (cointegrated: the two
    series are tied), near 1 means the spread wanders (no long-run
    link, any 'pairs' strategy on them is spurious). Residuals never
    materialize: every term expands over exact integer level- and
    difference-moments (the q_stat_durbin_watson machinery applied to
    a two-series spread).

    Scale: one fact pass to day grain, one lag window, nine integer
    moments, constant-time algebra."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).alias("y"),
    )
    w = Window.orderBy("day")
    l = d.select(
        "x",
        "y",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    )
    dec = "decimal(38,0)"
    m = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.sum((F.col("dx") * F.col("dx")).cast(dec)).alias("sdxx"),
        F.sum((F.col("dx") * F.col("dy")).cast(dec)).alias("sdxy"),
        F.sum((F.col("dy") * F.col("dy")).cast(dec)).alias("sdyy"),
    )
    nd = F.col("n").cast("double")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    beta = (dd("sxy") - dd("sx") * dd("sy") / nd) / (dd("sxx") - dd("sx") * dd("sx") / nd)
    b = m.select(
        "n",
        beta.alias("beta"),
        (dd("syy") - dd("sy") * dd("sy") / nd).alias("ayy"),
        (dd("sxy") - dd("sx") * dd("sy") / nd).alias("axy"),
        dd("sdxx").alias("dxx"),
        dd("sdxy").alias("dxy"),
        dd("sdyy").alias("dyy"),
    )
    num = F.col("dyy") - 2 * F.col("beta") * F.col("dxy") + F.col("beta") * F.col("beta") * F.col("dxx")
    den = F.col("ayy") - F.col("beta") * F.col("axy")
    return b.select(
        F.col("n").alias("n_days"),
        F.round("beta", 6).alias("hedge_beta"),
        F.round(num / den, 6).alias("residual_dw"),
        F.round(1 - num / den / 2, 6).alias("residual_rho"),
    )
