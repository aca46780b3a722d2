"""Round-6 wave 95: chi-square feature selection (token vs language
contingency ranking, the sklearn chi2/SelectKBest shape), the paired
sign test (week-over-week revenue direction), and Cook's distance
influence diagnostics for the daily-revenue trend regression. All
exactly DuckDB-oracled via exact integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_chi2_features",
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id, (lang = 'en') AS en,
               UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]{3,}')) AS w
        FROM documents),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS e
        FROM documents),
    tf AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS nt,
               CAST(SUM(CASE WHEN en THEN 1 ELSE 0 END) AS BIGINT) AS a
        FROM dt GROUP BY w HAVING COUNT(*) >= 5),
    x AS (
        SELECT w, nt, a, nt - a AS b, e - a AS c, n - e - (nt - a) AS d,
               n, e
        FROM tf CROSS JOIN tot)
    SELECT w AS token, nt AS doc_freq,
           ROUND(CAST(n AS DOUBLE)
                 * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                    - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                 * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                    - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                 / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)),
                 6) AS chi2
    FROM x
    WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
    ORDER BY chi2 DESC, token LIMIT 20
    """,
)
def q_ml_chi2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection: rank tokens by their 2×2
    contingency association with the English label (doc-level
    presence, df ≥ 5) — the sklearn SelectKBest(chi2) shape, the
    classic first filter before training a text classifier. The
    contingency cells are exact integers from one distinct
    (doc, token) pass, so the chi-square scores and the top-20
    ranking (ties to token) are exactly oracled.

    Scale: tokenize-explode is map-side; the distinct and the
    per-token fold are vocabulary-bounded with map-side combine; the
    label totals broadcast. Feature selection over a 100 TB corpus
    is exactly this: one pass, vocab-sized state."""
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            (F.col("lang") == "en").alias("en"),
            F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z]{3,}', 0)")).alias("w"),
        )
        .distinct()
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("e"),
    )
    tf = (
        dt.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.sum(F.when(F.col("en"), 1).otherwise(0)).alias("a"),
        )
        .filter(F.col("nt") >= 5)
    )
    x = tf.crossJoin(F.broadcast(tot)).select(
        "w",
        "nt",
        "a",
        (F.col("nt") - F.col("a")).alias("b"),
        (F.col("e") - F.col("a")).alias("c"),
        (F.col("n") - F.col("e") - (F.col("nt") - F.col("a"))).alias("d"),
        "n",
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    det = dd("a") * dd("d") - dd("b") * dd("c")
    return (
        x.filter(
            ((F.col("a") + F.col("b")) > 0)
            & ((F.col("c") + F.col("d")) > 0)
            & ((F.col("a") + F.col("c")) > 0)
            & ((F.col("b") + F.col("d")) > 0)
        )
        .select(
            F.col("w").alias("token"),
            F.col("nt").alias("doc_freq"),
            F.round(
                dd("n") * det * det
                / (
                    (F.col("a") + F.col("b")).cast("double")
                    * (F.col("c") + F.col("d")).cast("double")
                    * (F.col("a") + F.col("c")).cast("double")
                    * (F.col("b") + F.col("d")).cast("double")
                ),
                6,
            ).alias("chi2"),
        )
        .orderBy(F.desc("chi2"), "token")
        .limit(20)
    )


@register(
    "q_stat_sign_test",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    p AS (
        SELECT a.v - b.v AS diff
        FROM d a JOIN d b ON b.day = a.day - INTERVAL 7 DAY),
    c AS (
        SELECT CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up,
               CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down,
               CAST(SUM(CASE WHEN diff = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tie
        FROM p)
    SELECT n_up, n_down, n_tie,
           ROUND((ABS(CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE)) - 1)
                 / SQRT(CAST(n_up + n_down AS DOUBLE)), 6) AS z_continuity
    FROM c
    """,
)
def q_stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on week-over-week daily revenue: is revenue
    more often up than down vs the same weekday last week? The
    distribution-free paired test (no symmetry assumption, unlike
    Wilcoxon) — counts of up/down/tie days and the continuity-
    corrected normal z. The pairing joins on the CALENDAR (day −
    7 days), not row lag, so missing days pair with nothing instead
    of the wrong day. Exact integer counts, one double expression.

    Scale: day-grain self-join (dimension-sized) + one conditional
    fold; nothing fact-sized moves after the first aggregate."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    a = d.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = d.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    p = a.join(b, F.col("db") == F.date_sub(F.col("da"), 7)).select(
        (F.col("va") - F.col("vb")).alias("diff")
    )
    c = p.agg(
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("n_up"),
        F.sum(F.when(F.col("diff") < 0, 1).otherwise(0)).alias("n_down"),
        F.sum(F.when(F.col("diff") == 0, 1).otherwise(0)).alias("n_tie"),
    )
    return c.select(
        "n_up",
        "n_down",
        "n_tie",
        F.round(
            (F.abs(F.col("n_up").cast("double") - F.col("n_down").cast("double")) - 1)
            / F.sqrt((F.col("n_up") + F.col("n_down")).cast("double")),
            6,
        ).alias("z_continuity"),
    )


@register(
    "q_stat_influence",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    t AS (
        SELECT day, v,
               CAST(DATEDIFF('day', MIN(day) OVER (), day) AS BIGINT) AS t
        FROM d),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(t) AS st, SUM(v) AS sv,
               SUM(CAST(t * t AS DECIMAL(38, 0))) AS stt,
               SUM(CAST(t * v AS DECIMAL(38, 0))) AS stv,
               SUM(CAST(v * v AS DECIMAL(38, 0))) AS svv
        FROM t),
    b AS (
        SELECT n,
               CAST(st AS DOUBLE) AS std, CAST(sv AS DOUBLE) AS svd,
               CAST(n AS DOUBLE) AS nd,
               (CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS slope,
               CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                   / CAST(n AS DOUBLE) AS sxx,
               (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                    / CAST(n AS DOUBLE))
               - ((CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)
                       / CAST(n AS DOUBLE))
                  * (CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE)
                       / CAST(n AS DOUBLE))
                  / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                       / CAST(n AS DOUBLE))) AS sse
        FROM m),
    e AS (
        SELECT t.day, t.v, t.t,
               CAST(t.v AS DOUBLE)
                 - ((b.svd - b.slope * b.std) / b.nd + b.slope * CAST(t.t AS DOUBLE))
                   AS resid,
               1.0 / b.nd
                 + (CAST(t.t AS DOUBLE) - b.std / b.nd)
                   * (CAST(t.t AS DOUBLE) - b.std / b.nd) / b.sxx AS h,
               b.sse / (b.nd - 2) AS s2
        FROM t CROSS JOIN b)
    SELECT day, CAST(v AS BIGINT) AS revenue,
           ROUND(resid * resid * h / (2 * s2 * (1 - h) * (1 - h)), 6)
               AS cooks_d,
           ROUND(h, 6) AS leverage
    FROM e
    ORDER BY resid * resid * h / (2 * s2 * (1 - h) * (1 - h)) DESC, day
    LIMIT 10
    """,
)
def q_stat_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for the daily-revenue-on-time regression: the
    ten days that most influence the fitted trend, combining residual
    size with leverage — D_t = e²·h / (p·s²·(1−h)²) — the regression
    diagnostic that finds the days silently steering the slope
    (month-end spikes at the series edge beat bigger spikes in the
    middle). Residuals, leverages, and s² all derive from the same
    five exact-integer moments, so every D is a bit-identical double
    in both engines and the top-10 (ties to day) is exactly oracled.

    Scale: one fact pass to day grain, one constant-size moment
    aggregate broadcast back over the day series — per-point
    diagnostics WITHOUT a per-point refit (the hat-matrix closed form
    is what makes influence analysis feasible at all distributively)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    t = d.select(
        "day",
        "v",
        F.datediff("day", F.min("day").over(Window.partitionBy())).cast("long").alias("t"),
    )
    dec = "decimal(38,0)"
    m = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("v").alias("sv"),
        F.sum((F.col("t") * F.col("t")).cast(dec)).alias("stt"),
        F.sum((F.col("t") * F.col("v")).cast(dec)).alias("stv"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("svv"),
    )
    nd = F.col("n").cast("double")
    aty = F.col("stv").cast("double") - F.col("st").cast("double") * F.col("sv").cast("double") / nd
    sxx = F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st").cast("double") / nd
    ayy = F.col("svv").cast("double") - F.col("sv").cast("double") * F.col("sv").cast("double") / nd
    b = m.select(
        F.col("st").cast("double").alias("std"),
        F.col("sv").cast("double").alias("svd"),
        nd.alias("nd"),
        (aty / sxx).alias("slope"),
        sxx.alias("sxx"),
        (ayy - aty * aty / sxx).alias("sse"),
    )
    td = F.col("t").cast("double")
    resid = F.col("v").cast("double") - (
        (F.col("svd") - F.col("slope") * F.col("std")) / F.col("nd")
        + F.col("slope") * td
    )
    h = (
        1.0 / F.col("nd")
        + (td - F.col("std") / F.col("nd")) * (td - F.col("std") / F.col("nd")) / F.col("sxx")
    )
    s2 = F.col("sse") / (F.col("nd") - 2)
    e = t.crossJoin(F.broadcast(b)).select(
        "day", "v", resid.alias("resid"), h.alias("h"), s2.alias("s2")
    )
    cooks = (
        F.col("resid") * F.col("resid") * F.col("h")
        / (2 * F.col("s2") * (1 - F.col("h")) * (1 - F.col("h")))
    )
    return (
        e.select(
            "day",
            F.col("v").cast("long").alias("revenue"),
            F.round(cooks, 6).alias("cooks_d"),
            F.round("h", 6).alias("leverage"),
            cooks.alias("_sort"),
        )
        .orderBy(F.desc("_sort"), "day")
        .limit(10)
        .drop("_sort")
    )
