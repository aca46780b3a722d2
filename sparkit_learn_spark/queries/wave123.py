"""Round-6 wave 123: text entropy rate per source (bigram conditional
entropy), model-accuracy decay over data age (the model-rot monitor),
and the Friedman test (rank ANOVA over weekday blocks). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_text_entropy_rate",
    oracle="""
    WITH t AS (
        SELECT source, doc_id,
               REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
        FROM documents),
    uni AS (
        SELECT source, toks[CAST(i AS INT)] AS w
        FROM t, UNNEST(RANGE(1, LEN(toks) + 1)) u(i)),
    bi AS (
        SELECT source,
               toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS b
        FROM t, UNNEST(RANGE(1, LEN(toks))) u(i)),
    hu AS (
        SELECT source,
               -SUM((CAST(c AS DOUBLE) / tot) * LN(CAST(c AS DOUBLE) / tot))
                   AS h1
        FROM (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c,
                     CAST(SUM(COUNT(*)) OVER (PARTITION BY source)
                          AS DOUBLE) AS tot
              FROM uni GROUP BY source, w)
        GROUP BY source),
    hb AS (
        SELECT source,
               -SUM((CAST(c AS DOUBLE) / tot) * LN(CAST(c AS DOUBLE) / tot))
                   AS h2
        FROM (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c,
                     CAST(SUM(COUNT(*)) OVER (PARTITION BY source)
                          AS DOUBLE) AS tot
              FROM bi GROUP BY source, b)
        GROUP BY source)
    SELECT hu.source,
           ROUND(hu.h1, 6) AS unigram_entropy,
           ROUND(hb.h2 - hu.h1, 6) AS entropy_rate,
           ROUND(1 - (hb.h2 - hu.h1) / hu.h1, 6) AS predictability
    FROM hu JOIN hb ON hb.source = hu.source
    WHERE hu.source IN ('src0', 'src1', 'src2', 'src3')
    ORDER BY hu.source
    """,
)
def q_llm_text_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text entropy rate per source: the bigram conditional entropy
    H(w_t | w_{t−1}) = H(bigram) − H(unigram) and the predictability
    1 − H_rate/H_uni — the information-theoretic text signature that
    separates natural prose (strong sequential structure, high
    predictability) from shuffled/generated token soup with the SAME
    unigram profile, which every unigram-based quality filter is
    blind to. Probabilities are exact count ratios; the entropy sums
    follow the engine's documented per-group float-sum contract.

    Scale: two wordcount-shaped aggregates (unigram and bigram
    grain, vocab-bounded) with a per-source total window — the
    classic two-pass LM statistics shape."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2", "src3")
    )
    t = docs.select(
        "source", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks")
    )
    uni = t.select("source", F.explode("toks").alias("w"))
    bi = t.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i - 1], ' ', toks[i]))"
            )
        ).alias("b"),
    )

    def entropy(df: DataFrame, col: str, out: str) -> DataFrame:
        g = df.groupBy("source", col).agg(F.count(F.lit(1)).alias("c"))
        tot = Window.partitionBy("source")
        p = g.select(
            "source",
            (F.col("c").cast("double") / F.sum("c").over(tot).cast("double")).alias("p"),
        )
        return p.groupBy("source").agg((-F.sum(F.col("p") * F.log("p"))).alias(out))

    hu = entropy(uni, "w", "h1")
    hb = entropy(bi, "b", "h2")
    return (
        hu.join(hb, "source")
        .select(
            "source",
            F.round("h1", 6).alias("unigram_entropy"),
            F.round(F.col("h2") - F.col("h1"), 6).alias("entropy_rate"),
            F.round(1 - (F.col("h2") - F.col("h1")) / F.col("h1"), 6).alias("predictability"),
        )
        .orderBy("source")
    )


@register(
    "q_ml_accuracy_decay",
    oracle="""
    WITH p AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               CASE WHEN (o_totalprice >= 150000) = (o_orderpriority
                    IN ('1-URGENT', '2-HIGH')) THEN 1 ELSE 0 END AS correct
        FROM orders),
    g AS (
        SELECT month, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(correct) AS BIGINT) AS n_correct,
               ROW_NUMBER() OVER (ORDER BY month) - 1 AS i
        FROM p GROUP BY month),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(i) AS si,
               SUM(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE)) AS sa,
               SUM(CAST(i AS DOUBLE) * i) AS sii,
               SUM(CAST(i AS DOUBLE) * CAST(n_correct AS DOUBLE)
                   / CAST(n AS DOUBLE)) AS sia
        FROM g)
    SELECT g.month, g.n,
           ROUND(CAST(g.n_correct AS DOUBLE) / CAST(g.n AS DOUBLE), 6)
               AS monthly_accuracy,
           ROUND((m.sia - m.si * m.sa / m.k) / (m.sii - m.si * m.si / m.k),
                 8) AS accuracy_trend_per_month
    FROM g CROSS JOIN m ORDER BY g.month
    """,
)
def q_ml_accuracy_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-rot monitor: the accuracy of a FROZEN rule (price ≥ 150k
    predicts urgent/high priority) evaluated per data month, with the
    OLS trend of monthly accuracy — a significant negative slope is
    the canonical "the world drifted away from the training snapshot"
    signal that triggers retraining BEFORE business metrics notice.
    Exact integer cells per month; closed-form trend.

    Scale: month-grain conditional aggregate + constant-size trend
    algebra — the monitor every deployed model should emit per load."""
    o = load_table(spark, sf_dir, "orders")
    correct = F.when(
        (F.col("o_totalprice") >= 150000)
        == F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        1,
    ).otherwise(0)
    g = (
        o.select(F.date_trunc("month", "o_orderdate").alias("month"), correct.alias("correct"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("correct").alias("n_correct"))
        .select("month", "n", "n_correct", (F.row_number().over(Window.orderBy("month")) - 1).alias("i"))
    )
    acc = F.col("n_correct").cast("double") / F.col("n").cast("double")
    m = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("i").cast("double").alias("si"),
        F.sum(acc).alias("sa"),
        F.sum(F.col("i").cast("double") * F.col("i")).alias("sii"),
        F.sum(F.col("i").cast("double") * acc).alias("sia"),
    )
    return (
        g.crossJoin(F.broadcast(m))
        .select(
            "month",
            "n",
            F.round(acc, 6).alias("monthly_accuracy"),
            F.round(
                (F.col("sia") - F.col("si") * F.col("sa") / F.col("k"))
                / (F.col("sii") - F.col("si") * F.col("si") / F.col("k")),
                8,
            ).alias("accuracy_trend_per_month"),
        )
        .orderBy("month")
    )


@register(
    "q_stat_friedman",
    oracle="""
    WITH d AS (
        SELECT CAST(FLOOR(DATEDIFF('day', DATE '1995-01-06', o_orderdate)
                          / 7) AS BIGINT) AS week,
               DAYOFWEEK(o_orderdate) + 1 AS dow,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1, 2),
    full_weeks AS (
        SELECT week FROM d GROUP BY week HAVING COUNT(*) = 7),
    r AS (
        SELECT d.week, d.dow,
               RANK() OVER (PARTITION BY d.week ORDER BY d.v, d.dow)
                   AS rk
        FROM d JOIN full_weeks USING (week)),
    g AS (
        SELECT dow, CAST(SUM(rk) AS BIGINT) AS rsum
        FROM r GROUP BY dow),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM full_weeks),
    chi AS (
        SELECT 12.0 / (CAST(nb.b AS DOUBLE) * 7 * 8)
               * SUM(CAST(g.rsum AS DOUBLE) * CAST(g.rsum AS DOUBLE))
               - 3 * CAST(nb.b AS DOUBLE) * 8 AS q
        FROM g CROSS JOIN nb GROUP BY nb.b)
    SELECT CAST(g.dow AS BIGINT) AS day_of_week, g.rsum AS rank_sum,
           ROUND(CAST(g.rsum AS DOUBLE)
                 / (SELECT CAST(b AS DOUBLE) FROM nb), 6) AS mean_rank,
           ROUND((SELECT q FROM chi), 6) AS friedman_chi2
    FROM g ORDER BY day_of_week
    """,
)
def q_stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: rank the 7 weekdays WITHIN each complete week
    by revenue and test whether the weekday rank sums differ — the
    repeated-measures rank ANOVA (blocks = weeks remove the
    level-shift between weeks that would drown Kruskal-Wallis, its
    independent-samples cousin). Ranks are integers with a
    deterministic (value, weekday) tie-break; only complete 7-day
    weeks enter, so every block contributes exactly ranks 1..7.

    Scale: the rank window partitions by week (7-row partitions);
    the statistic folds 7 rank sums — the weekly-effect test at any
    history length."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.floor(
            F.datediff("o_orderdate", F.lit("1995-01-06").cast("date")) / 7
        ).cast("long").alias("week"),
        (F.dayofweek("o_orderdate")).alias("dow0"),
    ).agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
    d = d.select("week", (F.col("dow0") + 0).alias("dow"), "v")
    full_weeks = d.groupBy("week").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") == 7
    ).select("week")
    r = d.join(full_weeks, "week").select(
        "week",
        "dow",
        F.rank().over(Window.partitionBy("week").orderBy("v", "dow")).alias("rk"),
    )
    g = r.groupBy("dow").agg(F.sum("rk").alias("rsum"))
    nb = full_weeks.agg(F.count(F.lit(1)).alias("b"))
    chi = (
        g.crossJoin(F.broadcast(nb))
        .groupBy("b")
        .agg(
            (
                12.0
                / (F.col("b").cast("double") * 7 * 8)
                * F.sum(F.col("rsum").cast("double") * F.col("rsum").cast("double"))
                - 3 * F.col("b").cast("double") * 8
            ).alias("q")
        )
    )
    return (
        g.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(chi.select("q")))
        .select(
            F.col("dow").cast("long").alias("day_of_week"),
            F.col("rsum").alias("rank_sum"),
            F.round(F.col("rsum").cast("double") / F.col("b").cast("double"), 6).alias(
                "mean_rank"
            ),
            F.round("q", 6).alias("friedman_chi2"),
        )
        .orderBy("day_of_week")
    )
