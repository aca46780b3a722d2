"""Round-6 wave 119: Cochran's Q (k binary raters on the same
documents), worst-slice error analysis (slice finder for a fixed
classifier), and the seasonal Mann-Kendall trend test (weekday-
stratified S statistics pooled). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_cochran_q",
    oracle="""
    WITH r AS (
        SELECT doc_id,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS r1,
               CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))
                        >= 50 THEN 1 ELSE 0 END AS r2,
               CASE WHEN LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]{3,}'))
                        >= 40 THEN 1 ELSE 0 END AS r3
        FROM documents),
    rowsums AS (
        SELECT r1 + r2 + r3 AS li FROM r),
    cs AS (
        SELECT CAST(SUM(r1) AS BIGINT) AS c1,
               CAST(SUM(r2) AS BIGINT) AS c2,
               CAST(SUM(r3) AS BIGINT) AS c3
        FROM r),
    ls AS (
        SELECT CAST(SUM(li) AS BIGINT) AS sl,
               CAST(SUM(li * li) AS BIGINT) AS sll
        FROM rowsums)
    SELECT cs.c1 AS flags_rule1, cs.c2 AS flags_rule2, cs.c3 AS flags_rule3,
           ROUND(3 * 2 * (CAST(cs.c1 AS DOUBLE) * cs.c1
                          + CAST(cs.c2 AS DOUBLE) * cs.c2
                          + CAST(cs.c3 AS DOUBLE) * cs.c3
                          - CAST(ls.sl AS DOUBLE) * ls.sl / 3)
                 / (3 * CAST(ls.sl AS DOUBLE) - CAST(ls.sll AS DOUBLE)), 6)
               AS cochran_q
    FROM cs CROSS JOIN ls
    """,
)
def q_stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: do three binary document filters (length ≥
    300 chars, ≥ 50 spaces, ≥ 40 real words) flag at DIFFERENT rates
    on the same documents? The k-treatment generalization of McNemar
    (k=2 reduces to it) — the test to run before treating an ensemble
    of quality filters as interchangeable. Q = k(k−1)(ΣC_j² −
    (ΣL)²/k) / (kΣL − ΣL²) over exact integer column and row sums.

    Scale: one pass computing three conditional counts and two
    row-sum moments — constant state, any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    r1 = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    r2 = F.when(
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) >= 50, 1
    ).otherwise(0)
    r3 = F.when(
        F.size(F.expr(r"regexp_extract_all(lower(text), '[a-z]{3,}', 0)")) >= 40, 1
    ).otherwise(0)
    r = docs.select(r1.alias("r1"), r2.alias("r2"), r3.alias("r3")).withColumn(
        "li", F.col("r1") + F.col("r2") + F.col("r3")
    )
    agg = r.agg(
        F.sum("r1").alias("c1"),
        F.sum("r2").alias("c2"),
        F.sum("r3").alias("c3"),
        F.sum("li").alias("sl"),
        F.sum(F.col("li") * F.col("li")).alias("sll"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    q = (
        3
        * 2
        * (dd("c1") * F.col("c1") + dd("c2") * F.col("c2") + dd("c3") * F.col("c3") - dd("sl") * F.col("sl") / 3)
        / (3 * dd("sl") - dd("sll"))
    )
    return agg.select(
        F.col("c1").alias("flags_rule1"),
        F.col("c2").alias("flags_rule2"),
        F.col("c3").alias("flags_rule3"),
        F.round(q, 6).alias("cochran_q"),
    )


@register(
    "q_ml_worst_slices",
    oracle="""
    WITH p AS (
        SELECT source, lang,
               CASE WHEN (n_chars >= 300) = (lang = 'en') THEN 1 ELSE 0 END
                   AS correct
        FROM documents),
    g AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(correct) AS BIGINT) AS n_correct
        FROM p GROUP BY source, lang HAVING COUNT(*) >= 5),
    o AS (SELECT CAST(SUM(n_correct) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
              AS overall
          FROM g)
    SELECT g.source, g.lang, g.n,
           ROUND(CAST(g.n_correct AS DOUBLE) / CAST(g.n AS DOUBLE), 6)
               AS slice_accuracy,
           ROUND(CAST(g.n_correct AS DOUBLE) / CAST(g.n AS DOUBLE)
                 - o.overall, 6) AS gap_vs_overall
    FROM g CROSS JOIN o
    ORDER BY CAST(g.n_correct AS DOUBLE) / CAST(g.n AS DOUBLE), g.source,
             g.lang
    LIMIT 10
    """,
)
def q_ml_worst_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-slice error analysis (slice finder): the ten
    (source × lang) slices where the length-based English detector is
    LEAST accurate (support ≥ 5), with each slice's gap to overall
    accuracy — the error-analysis discipline that turns "92% overall"
    into "fails on short German docs from src7", which is the only
    form a fix can act on. Exact integer cells, deterministic
    ordering.

    Scale: slice grain is the cross of two bounded dimensions; the
    audit is one conditional aggregate + top-10 — rerunnable per
    model version at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "source",
        "lang",
        F.when((F.col("n_chars") >= 300) == (F.col("lang") == "en"), 1)
        .otherwise(0)
        .alias("correct"),
    )
    g = (
        p.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("correct").alias("n_correct"))
        .filter(F.col("n") >= 5)  # fixture slices max out at 16 docs
        # below sf0.1 — the original support>=20 emptied the result at
        # the driver's SF (r6 near-degeneracy class)
    )
    o = g.agg(
        (F.sum("n_correct").cast("double") / F.sum("n").cast("double")).alias("overall")
    )
    acc = F.col("n_correct").cast("double") / F.col("n").cast("double")
    return (
        g.crossJoin(F.broadcast(o))
        .select(
            "source",
            "lang",
            "n",
            F.round(acc, 6).alias("slice_accuracy"),
            F.round(acc - F.col("overall"), 6).alias("gap_vs_overall"),
        )
        .orderBy("slice_accuracy", "source", "lang")
        .limit(10)
    )


@register(
    "q_ts_seasonal_mann_kendall",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               DAYOFWEEK(o_orderdate) + 1 AS dow,  -- align to Spark's 1=Sunday
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1, 2),
    s0 AS (
        SELECT a.dow,
               CAST(SUM(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_w
        FROM d a JOIN d b ON b.dow = a.dow AND b.day > a.day
        GROUP BY a.dow),
    nn AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_w FROM d GROUP BY dow),
    s AS (SELECT s0.dow, s0.s_w, nn.n_w
          FROM s0 JOIN nn ON nn.dow = s0.dow),
    t AS (
        SELECT CAST(SUM(s_w) AS BIGINT) AS s_total,
               SUM(CAST(n_w AS DOUBLE) * (CAST(n_w AS DOUBLE) - 1)
                   * (2 * CAST(n_w AS DOUBLE) + 5) / 18) AS var_s
        FROM s)
    SELECT s.dow AS day_of_week, s.s_w, s.n_w,
           CAST(t.s_total AS BIGINT) AS s_total,
           ROUND((CAST(t.s_total AS DOUBLE)
                  - SIGN(CAST(t.s_total AS DOUBLE)))
                 / SQRT(t.var_s), 6) AS z_score
    FROM s CROSS JOIN t ORDER BY day_of_week
    """,
)
def q_ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test: the MK S statistic computed
    WITHIN each weekday stratum (Mondays compared only to Mondays…)
    and pooled — the trend test that is immune to weekly seasonality,
    which inflates plain MK (q_ts_mann_kendall) into false trends on
    any weekday-cyclic series. Per-stratum S are exact integer
    pairwise sign sums; the pooled variance is the standard
    n(n−1)(2n+5)/18 per stratum; continuity-corrected z.

    Scale: the pairwise comparisons partition BY WEEKDAY — 7
    day-grain self-joins of ~n/7 rows each (2× cheaper than plain
    MK's full pairwise), the stratification that also parallelizes
    it."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.col("o_orderdate").alias("day"), F.dayofweek("o_orderdate").alias("dow")
    ).agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
    a = d.select(F.col("dow").alias("da_dow"), F.col("day").alias("da"), F.col("v").alias("va"))
    b = d.select(F.col("dow").alias("db_dow"), F.col("day").alias("db"), F.col("v").alias("vb"))
    s0 = (
        a.join(b, (F.col("db_dow") == F.col("da_dow")) & (F.col("db") > F.col("da")))
        .groupBy(F.col("da_dow").alias("dow"))
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            ).alias("s_w")
        )
    )
    nn = d.groupBy("dow").agg(F.count(F.lit(1)).alias("n_w"))
    s = s0.join(nn, "dow")
    nw = F.col("n_w").cast("double")
    var_term = nw * (nw - 1) * (2 * nw + 5) / 18
    t = s.agg(
        F.sum("s_w").alias("s_total"),
        F.sum(var_term).alias("var_s"),
    )
    st = F.col("s_total").cast("double")
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            F.col("dow").alias("day_of_week"),
            "s_w",
            "n_w",
            F.col("s_total").cast("long").alias("s_total"),
            F.round((st - F.signum(st)) / F.sqrt(F.col("var_s")), 6).alias("z_score"),
        )
        .orderBy("day_of_week")
    )
