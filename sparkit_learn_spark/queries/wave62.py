"""Round-6 wave 62: daily-activity streaks (gaps-and-islands at user
grain with a streak-length distribution) and the word2vec-style
negative-sampling table (unigram^0.75 distribution with cumulative
ranges). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_activity_streaks",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events),
    isl AS (
        SELECT user_id, d,
               date_diff('day', DATE '2024-01-01', d)
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                 AS grp
        FROM ud),
    streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, grp),
    best AS (
        SELECT user_id, MAX(len) AS best_streak
        FROM streaks GROUP BY user_id)
    SELECT CAST(best_streak AS BIGINT) AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM best GROUP BY best_streak
    """,
)
def q_evt_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-activity streaks: each user's longest run of consecutive
    active days (the day-number-minus-rank island idiom at user
    grain), rolled into a streak-length distribution — the
    engagement-habit metric behind every streak badge and the input
    to habit-formation analyses (a mass at 1 means drive-by usage;
    a fat tail means ritual usage). Exact integer date arithmetic.

    Scale: presence collapses to (user, day) first; the island
    window partitions BY USER (embarrassingly parallel, no global
    sort), and the rollups run at streak then length grain."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.select(
        "user_id",
        (
            F.datediff("d", F.lit("2024-01-01"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return best.groupBy(
        F.col("best_streak").cast("long").alias("streak_days")
    ).agg(F.count("*").alias("n_users"))


@register(
    "q_llm_negative_sampling",
    oracle="""
    WITH tf AS (
        SELECT u.tok AS term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT string_split(text, ' ') AS toks FROM documents),
             unnest(toks) AS u(tok)
        GROUP BY u.tok),
    pw AS (
        SELECT term, cnt,
               CAST(ROUND(1e6 * EXP(0.75 * LN(cnt))) AS BIGINT) AS w_u
        FROM tf),
    tot AS (SELECT CAST(SUM(w_u) AS BIGINT) AS total_w FROM pw),
    ranked AS (
        SELECT term, cnt, w_u,
               SUM(w_u) OVER (ORDER BY w_u DESC, term
                              ROWS UNBOUNDED PRECEDING) AS cum_w,
               ROW_NUMBER() OVER (ORDER BY w_u DESC, term) AS rnk
        FROM pw)
    SELECT r.term, r.cnt,
           ROUND(r.w_u / CAST(t.total_w AS DOUBLE), 6) AS sample_prob,
           ROUND(r.cum_w / CAST(t.total_w AS DOUBLE), 6) AS cum_prob
    FROM ranked r CROSS JOIN tot t
    WHERE r.rnk <= 50
    """,
)
def q_llm_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-sampling table (word2vec's unigram^0.75): term weights
    count^0.75 — the exponent that lifts rare words relative to raw
    frequency — quantized to integer micro-units, with each of the
    top-50 terms' sampling probability and CUMULATIVE boundary (the
    alias-table / binary-search ranges a trainer samples against).
    The ^0.75 computes as exp(0.75·ln) identically in both engines
    and rounds before any ranking; all sums exact integers.

    Scale: one vocabulary-grain count aggregate, row-local weight
    transform, and a vocabulary-sized cumulative window (top-50
    emitted) — the table build is a side artifact of the corpus
    scan, exactly as in production trainers."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    pw = tf.select(
        "term",
        "cnt",
        F.round(1e6 * F.exp(0.75 * F.log("cnt"))).cast("long").alias("w_u"),
    )
    tot = pw.agg(F.sum("w_u").alias("total_w"))
    w = Window.orderBy(F.col("w_u").desc(), "term")
    ranked = pw.select(
        "*",
        F.sum("w_u")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_w"),
        F.row_number().over(w).alias("rnk"),
    ).filter(F.col("rnk") <= 50)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "term",
        "cnt",
        F.round(F.col("w_u") / F.col("total_w").cast("double"), 6).alias(
            "sample_prob"
        ),
        F.round(F.col("cum_w") / F.col("total_w").cast("double"), 6).alias(
            "cum_prob"
        ),
    )
