"""Round-6 wave 112: permutation entropy (ordinal-pattern complexity
of the revenue series), the XmR individuals control chart (SPC
moving-range limits + out-of-control flags), and ordinal association
(Somers' D and Goodman-Kruskal gamma from the same concordance
table). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_permutation_entropy",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    l AS (
        SELECT v,
               LEAD(v, 1) OVER (ORDER BY day) AS v1,
               LEAD(v, 2) OVER (ORDER BY day) AS v2
        FROM d),
    pat AS (
        SELECT CASE
                 WHEN v < v1 AND v1 < v2 THEN '012'
                 WHEN v < v2 AND v2 <= v1 THEN '021'
                 WHEN v1 <= v AND v < v2 THEN '102'
                 WHEN v2 <= v AND v < v1 THEN '120'
                 WHEN v1 < v2 AND v2 <= v THEN '201'
                 ELSE '210'
               END AS p
        FROM l WHERE v1 IS NOT NULL AND v2 IS NOT NULL),
    h AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM pat GROUP BY p),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    e AS (
        SELECT -SUM((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
                    * LN(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))) AS pe
        FROM h CROSS JOIN n)
    SELECT h.p AS pattern, h.c AS n_windows,
           ROUND(CAST(h.c AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS share,
           ROUND(e.pe / LN(6.0), 6) AS norm_perm_entropy
    FROM h CROSS JOIN n CROSS JOIN e ORDER BY h.p
    """,
)
def q_ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt-Pompe, order 3): classify every
    3-day window by the ORDINAL pattern of its values (which of the
    6 orderings), and report the pattern histogram plus the
    normalized entropy — 1.0 = white noise, low = deterministic
    structure; the complexity measure that is robust to any monotone
    distortion of the values (it never reads magnitudes, only
    comparisons — so it is exactly oracled by construction, no float
    anywhere until the final ln). Ties break toward the earlier index
    (the standard convention), encoded in the comparison chain.

    Scale: two leads in one day-grain window pass, a 6-row
    histogram, one fold."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    l = d.select(
        "v",
        F.lead("v", 1).over(w).alias("v1"),
        F.lead("v", 2).over(w).alias("v2"),
    ).filter(F.col("v1").isNotNull() & F.col("v2").isNotNull())
    v, v1, v2 = F.col("v"), F.col("v1"), F.col("v2")
    pat = l.select(
        F.when((v < v1) & (v1 < v2), "012")
        .when((v < v2) & (v2 <= v1), "021")
        .when((v1 <= v) & (v < v2), "102")
        .when((v2 <= v) & (v < v1), "120")
        .when((v1 < v2) & (v2 <= v), "201")
        .otherwise("210")
        .alias("p")
    )
    h = pat.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    n = h.agg(F.sum("c").alias("n"))
    hn = h.crossJoin(F.broadcast(n))
    e = hn.agg(
        (
            -F.sum(
                (F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("c").cast("double") / F.col("n").cast("double"))
            )
        ).alias("pe")
    )
    import math

    return (
        hn.crossJoin(F.broadcast(e))
        .select(
            F.col("p").alias("pattern"),
            F.col("c").alias("n_windows"),
            F.round(F.col("c").cast("double") / F.col("n").cast("double"), 6).alias("share"),
            F.round(F.col("pe") / math.log(6.0), 6).alias("norm_perm_entropy"),
        )
        .orderBy("pattern")
    )


@register(
    "q_ts_control_chart",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    mr AS (
        SELECT day, v, ABS(v - LAG(v) OVER (ORDER BY day)) AS mrange
        FROM d),
    lim AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS center,
               CAST(SUM(mrange) AS DOUBLE) / COUNT(mrange) AS mrbar
        FROM mr),
    fl AS (
        SELECT mr.day, mr.v, lim.n,
               CASE WHEN CAST(mr.v AS DOUBLE)
                         > lim.center + 2.66 * lim.mrbar THEN 1
                    WHEN CAST(mr.v AS DOUBLE)
                         < lim.center - 2.66 * lim.mrbar THEN -1
                    ELSE 0 END AS signal
        FROM mr CROSS JOIN lim)
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN signal = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above_ucl,
           CAST(SUM(CASE WHEN signal = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_below_lcl,
           ROUND((SELECT center + 2.66 * mrbar FROM lim), 6) AS ucl,
           ROUND((SELECT center - 2.66 * mrbar FROM lim), 6) AS lcl
    FROM fl
    """,
)
def q_ts_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR individuals control chart (classic SPC): control limits at
    mean ± 2.66·(mean moving range) — the moving-range estimate of
    short-term variation is what makes XmR robust to trends that
    inflate the global σ — with counts of out-of-control days each
    side. The manufacturing-grade "is the process stable?" monitor,
    one of the few anomaly rules with a derivation rather than a
    tuned threshold. Moving ranges are exact integers; limits are two
    closed-form doubles both engines share.

    Scale: one day-grain lag window, one moment fold, one flag pass —
    the monitor costs two scans of a dimension-sized series."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    mr = d.select("day", "v", F.abs(F.col("v") - F.lag("v").over(w)).alias("mrange"))
    lim = mr.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("center"),
        (F.sum("mrange").cast("double") / F.count("mrange")).alias("mrbar"),
    )
    fl = mr.crossJoin(F.broadcast(lim)).select(
        "n",
        "center",
        "mrbar",
        F.when(F.col("v").cast("double") > F.col("center") + 2.66 * F.col("mrbar"), 1)
        .when(F.col("v").cast("double") < F.col("center") - 2.66 * F.col("mrbar"), -1)
        .otherwise(0)
        .alias("signal"),
    )
    return fl.groupBy("center", "mrbar").agg(
        F.max("n").alias("n_days"),
        F.sum(F.when(F.col("signal") == 1, 1).otherwise(0)).alias("n_above_ucl"),
        F.sum(F.when(F.col("signal") == -1, 1).otherwise(0)).alias("n_below_lcl"),
    ).select(
        "n_days",
        "n_above_ucl",
        "n_below_lcl",
        F.round(F.col("center") + 2.66 * F.col("mrbar"), 6).alias("ucl"),
        F.round(F.col("center") - 2.66 * F.col("mrbar"), 6).alias("lcl"),
    )


@register(
    "q_ml_somers_d",
    oracle="""
    WITH h AS (
        SELECT CAST(n_chars AS BIGINT) AS s,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS pos,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
                   AS neg
        FROM documents GROUP BY 1),
    cum AS (
        SELECT s, pos, neg,
               COALESCE(SUM(pos) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS pos_below,
               COALESCE(SUM(neg) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS neg_below
        FROM h),
    t AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS q,
               CAST(SUM(pos * neg_below) AS BIGINT) AS concordant,
               CAST(SUM(neg * pos_below) AS BIGINT) AS discordant,
               CAST(SUM(pos * neg) AS BIGINT) AS tied_on_score
        FROM cum)
    SELECT concordant, discordant, tied_on_score,
           ROUND(CAST(concordant - discordant AS DOUBLE)
                 / CAST(p AS DOUBLE) / CAST(q AS DOUBLE), 6) AS somers_d,
           ROUND(CAST(concordant - discordant AS DOUBLE)
                 / CAST(concordant + discordant AS DOUBLE), 6)
               AS gk_gamma
    FROM t
    """,
)
def q_ml_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D and Goodman-Kruskal gamma for the length score vs
    the English label: concordant pairs (an English doc outscoring a
    non-English one) minus discordant, normalized by all pos×neg
    pairs (D, which equals 2·AUC−1 — the credit-scoring 'Gini') or by
    the untied pairs only (gamma). Pair counts come from ONE
    cumulative pass over the value histogram (pos·neg_below
    accumulates concordance without enumerating pairs) — exact
    integers, n² pairs counted in O(distinct values).

    Scale: value-domain histogram + one cumulative window — the same
    histogram-rank backbone as the AUC/Kruskal machinery, which is
    the entire point: every pairwise ordinal statistic reduces to it."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy(F.col("n_chars").cast("long").alias("s")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("neg"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "pos",
        "neg",
        F.coalesce(F.sum("pos").over(w), F.lit(0)).alias("pos_below"),
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    t = cum.agg(
        F.sum("pos").alias("p"),
        F.sum("neg").alias("q"),
        F.sum(F.col("pos") * F.col("neg_below")).alias("concordant"),
        F.sum(F.col("neg") * F.col("pos_below")).alias("discordant"),
        F.sum(F.col("pos") * F.col("neg")).alias("tied_on_score"),
    )
    cd = (F.col("concordant") - F.col("discordant")).cast("double")
    return t.select(
        "concordant",
        "discordant",
        "tied_on_score",
        F.round(cd / F.col("p").cast("double") / F.col("q").cast("double"), 6).alias("somers_d"),
        F.round(cd / (F.col("concordant") + F.col("discordant")).cast("double"), 6).alias(
            "gk_gamma"
        ),
    )
