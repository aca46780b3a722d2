"""Round-6 wave 116: Wilcoxon signed-rank test (paired magnitudes,
histogram mid-ranks), Parkinson range-based volatility (OHLC
high/low), and a hapax-legomena corpus audit (rare-token mass as a
garbage screen). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_wilcoxon_signed",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    p AS (
        SELECT a.v - b.v AS diff
        FROM d a JOIN d b ON b.day = a.day - INTERVAL 7 DAY
        WHERE a.v <> b.v),
    h AS (
        SELECT ABS(diff) AS mag,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cpos
        FROM p GROUP BY ABS(diff)),
    r AS (
        SELECT mag, c, cpos,
               2 * COALESCE(SUM(c) OVER (ORDER BY mag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS avg2
        FROM h),
    t AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(cpos * avg2) AS BIGINT) AS w2pos
        FROM r)
    SELECT n AS n_pairs,
           ROUND(CAST(w2pos AS DOUBLE) / 2, 6) AS w_plus,
           ROUND((CAST(w2pos AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 4)
                 / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                        * (2 * CAST(n AS DOUBLE) + 1) / 24), 6) AS z_score
    FROM t
    """,
)
def q_stat_wilcoxon_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on week-over-week daily revenue:
    rank the |differences| (zeros dropped, mid-ranks for ties via the
    twice-rank histogram trick), sum the ranks of positive
    differences, and z-test against the null — the paired test that
    uses MAGNITUDES where the sign test (q_stat_sign_test) only
    counts directions, the standard step up in power when symmetry
    holds. Every rank statistic stays an exact integer until the
    final z.

    Scale: the calendar self-join at day grain, then a
    magnitude-domain histogram with one cumulative window — the same
    histogram-rank backbone as Kruskal/AUC/Somers, proving it covers
    the whole classical rank-test family."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    a = d.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = d.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    p = (
        a.join(b, F.col("db") == F.date_sub(F.col("da"), 7))
        .filter(F.col("va") != F.col("vb"))
        .select((F.col("va") - F.col("vb")).alias("diff"))
    )
    h = p.groupBy(F.abs("diff").alias("mag")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("cpos"),
    )
    w = Window.orderBy("mag").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "c",
        "cpos",
        (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias("avg2"),
    )
    t = r.agg(
        F.sum("c").alias("n"), F.sum(F.col("cpos") * F.col("avg2")).alias("w2pos")
    )
    nd = F.col("n").cast("double")
    wplus = F.col("w2pos").cast("double") / 2
    return t.select(
        F.col("n").alias("n_pairs"),
        F.round(wplus, 6).alias("w_plus"),
        F.round(
            (wplus - nd * (nd + 1) / 4) / F.sqrt(nd * (nd + 1) * (2 * nd + 1) / 24), 6
        ).alias("z_score"),
    )


@register(
    "q_fin_parkinson_vol",
    oracle="""
    WITH b AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(MAX(ROUND(value * 100)) AS BIGINT) AS hi,
               CAST(MIN(ROUND(value * 100)) AS BIGINT) AS lo
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1 HAVING MIN(ROUND(value * 100)) > 0),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(POW(LN(CAST(hi AS DOUBLE) / CAST(lo AS DOUBLE)), 2))
                   AS s
        FROM b)
    SELECT n AS n_days,
           ROUND(SQRT(s / (4 * CAST(n AS DOUBLE) * LN(2.0))), 6)
               AS parkinson_vol,
           ROUND(SQRT(s / CAST(n AS DOUBLE)), 6) AS rms_log_range
    FROM t
    """,
)
def q_fin_parkinson_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson range-based volatility of daily purchase values:
    σ_P = √(Σ ln²(high/low) / (4n·ln2)) over daily high-low ranges —
    the estimator that extracts ~5× more information per day than
    close-to-close returns by using the intraday RANGE (the reason
    OHLC bars exist, q_ts_ohlc, rather than closes alone). Ranges
    are exact integer cents; each term is one ln² both engines share;
    zero/negative lows are excluded by the same exact predicate.

    Scale: day-grain min/max aggregate + one fold — range volatility
    at any event volume for one scan."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100)
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.max(cents).cast("long").alias("hi"),
            F.min(cents).cast("long").alias("lo"),
        )
        .filter(F.col("lo") > 0)
    )
    t = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pow(F.log(F.col("hi").cast("double") / F.col("lo").cast("double")), F.lit(2))
        ).alias("s"),
    )
    import math

    nd = F.col("n").cast("double")
    return t.select(
        F.col("n").alias("n_days"),
        F.round(F.sqrt(F.col("s") / (4 * nd * math.log(2.0))), 6).alias("parkinson_vol"),
        F.round(F.sqrt(F.col("s") / nd), 6).alias("rms_log_range"),
    )


@register(
    "q_llm_hapax_audit",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w
        FROM documents),
    tf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    v AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax,
               CAST(SUM(c) AS BIGINT) AS tokens
        FROM tf),
    dh AS (
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN tf.c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
        FROM tok JOIN tf ON tf.w = tok.w
        GROUP BY tok.doc_id),
    worst AS (
        SELECT doc_id, n_tok, n_hapax,
               ROW_NUMBER() OVER (ORDER BY CAST(n_hapax AS DOUBLE)
                   / CAST(n_tok AS DOUBLE) DESC, doc_id) AS rn
        FROM dh WHERE n_tok >= 20)
    SELECT v.vocab, v.hapax,
           ROUND(CAST(v.hapax AS DOUBLE) / CAST(v.vocab AS DOUBLE), 6)
               AS hapax_vocab_share,
           w.doc_id AS worst_doc,
           ROUND(CAST(w.n_hapax AS DOUBLE) / CAST(w.n_tok AS DOUBLE), 6)
               AS worst_doc_hapax_share
    FROM v CROSS JOIN worst w WHERE w.rn = 1
    """,
)
def q_llm_hapax_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena audit: the share of vocabulary appearing exactly
    once corpus-wide (healthy natural corpora sit near 40-60%;
    far above = OCR noise / random strings, far below = templated
    text), plus the single worst document by hapax-token share (≥20
    tokens) — the rare-token garbage screen complementing character
    entropy (q_llm_char_entropy works at char level; this at corpus
    vocabulary level, catching well-formed but never-repeated junk).
    Exact integer counts; deterministic worst-doc tie-break.

    Scale: wordcount + one join of tokens back to their corpus
    frequency (vocab-sized broadcast in practice) + a top-1 — two
    aggregate passes."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("w"),
    ).persist()
    tf = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    v = tf.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        F.sum("c").alias("tokens"),
    )
    dh = (
        tok.join(tf, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .filter(F.col("n_tok") >= 20)
    )
    rn = F.row_number().over(
        Window.orderBy(
            F.desc(F.col("n_hapax").cast("double") / F.col("n_tok").cast("double")),
            "doc_id",
        )
    )
    worst = dh.withColumn("rn", rn).filter(F.col("rn") == 1)
    return (
        v.crossJoin(F.broadcast(worst))
        .select(
            "vocab",
            "hapax",
            F.round(F.col("hapax").cast("double") / F.col("vocab").cast("double"), 6).alias(
                "hapax_vocab_share"
            ),
            F.col("doc_id").alias("worst_doc"),
            F.round(F.col("n_hapax").cast("double") / F.col("n_tok").cast("double"), 6).alias(
                "worst_doc_hapax_share"
            ),
        )
    )
