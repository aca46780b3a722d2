"""Round-6 wave 101: RSI momentum oscillator (SMA variant, exact
integer gain/loss frames), per-group AUC fairness audit
(histogram-rank AUC per source with the max subgroup gap), and a
daily load-volume anomaly monitor. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_rsi",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    ch AS (
        SELECT day,
               GREATEST(v - LAG(v) OVER (ORDER BY day), 0) AS gain,
               GREATEST(LAG(v) OVER (ORDER BY day) - v, 0) AS loss
        FROM d),
    f AS (
        SELECT day,
               SUM(gain) OVER w AS g, SUM(loss) OVER w AS l,
               CAST(COUNT(gain) OVER w AS BIGINT) AS n
        FROM ch
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT day,
           ROUND(100.0 * CAST(g AS DOUBLE)
                 / (CAST(g AS DOUBLE) + CAST(l AS DOUBLE)), 6) AS rsi_14
    FROM f WHERE n = 14 AND g + l > 0 ORDER BY day
    """,
)
def q_ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (relative strength index, Cutler's SMA variant —
    the recursive Wilder smoothing is order-sequential; the SMA form
    is the distributable one) over daily revenue: 100·ΣGain/(ΣGain +
    ΣLoss) per trailing 14 observed days — the bounded momentum
    oscillator (>70 overbought / <30 oversold in trading, equally
    useful as a demand-momentum flag). Gains/losses are exact integer
    clamps of day deltas; one frame pass; frames with a lag gap or
    all-zero movement are excluded exactly.

    Scale: day-grain lag + one rolling frame — dimension-sized, the
    documented single-partition day-series contract."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    ch = d.select(
        "day",
        F.greatest(F.col("v") - F.lag("v").over(w), F.lit(0)).alias("gain"),
        F.greatest(F.lag("v").over(w) - F.col("v"), F.lit(0)).alias("loss"),
    )
    fr = Window.orderBy("day").rowsBetween(-13, 0)
    f = ch.select(
        "day",
        F.sum("gain").over(fr).alias("g"),
        F.sum("loss").over(fr).alias("l"),
        F.count("gain").over(fr).alias("n"),
    )
    return (
        f.filter((F.col("n") == 14) & (F.col("g") + F.col("l") > 0))
        .select(
            "day",
            F.round(
                100.0 * F.col("g").cast("double")
                / (F.col("g").cast("double") + F.col("l").cast("double")),
                6,
            ).alias("rsi_14"),
        )
        .orderBy("day")
    )


@register(
    "q_ml_auc_fairness",
    oracle="""
    WITH x AS (
        SELECT source, CAST(n_chars AS BIGINT) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
    h AS (
        SELECT source, s, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(pos) AS BIGINT) AS cp
        FROM x GROUP BY source, s),
    r AS (
        SELECT source, s, c, cp,
               2 * COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS avg2
        FROM h),
    g AS (
        SELECT source,
               CAST(SUM(cp) AS BIGINT) AS np,
               CAST(SUM(c - cp) AS BIGINT) AS nn,
               CAST(SUM(cp * avg2) AS BIGINT) AS r2p
        FROM r GROUP BY source),
    a AS (
        SELECT source, np, nn,
               (CAST(r2p AS DOUBLE) / 2 - CAST(np AS DOUBLE)
                    * (CAST(np AS DOUBLE) + 1) / 2)
               / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc
        FROM g WHERE np > 0 AND nn > 0),
    mm AS (SELECT MAX(auc) - MIN(auc) AS gap FROM a)
    SELECT a.source, a.np AS n_pos, a.nn AS n_neg,
           ROUND(a.auc, 6) AS auc,
           ROUND(mm.gap, 6) AS max_auc_gap
    FROM a CROSS JOIN mm ORDER BY a.source
    """,
)
def q_ml_auc_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subgroup AUC fairness audit: the length-score's
    English-detection AUC computed independently per source via the
    rank-sum (Mann-Whitney) identity on a per-group value histogram
    with exact mid-ranks, plus the max subgroup gap — the audit that
    catches a classifier that works on average but fails a slice
    (the gap IS the fairness metric regulators ask for). Twice-mid-
    rank integerization keeps every rank sum exact, so per-group AUC
    is one double division.

    Scale: the histogram keys on (source × bounded score domain); the
    rank window partitions by source — no per-row global sort, the
    same histogram-rank machinery as Kruskal-Wallis and the global
    AUC (q_ml_roc_auc), sliced."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    h = x.groupBy("source", "s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("cp")
    )
    w = Window.partitionBy("source").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "source",
        "c",
        "cp",
        (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias("avg2"),
    )
    g = r.groupBy("source").agg(
        F.sum("cp").alias("np"),
        F.sum(F.col("c") - F.col("cp")).alias("nn"),
        F.sum(F.col("cp") * F.col("avg2")).alias("r2p"),
    )
    npd = F.col("np").cast("double")
    a = g.filter((F.col("np") > 0) & (F.col("nn") > 0)).select(
        "source",
        "np",
        "nn",
        (
            (F.col("r2p").cast("double") / 2 - npd * (npd + 1) / 2)
            / (npd * F.col("nn").cast("double"))
        ).alias("auc"),
    )
    mm = a.agg((F.max("auc") - F.min("auc")).alias("gap"))
    return (
        a.crossJoin(F.broadcast(mm))
        .select(
            "source",
            F.col("np").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            F.round("auc", 6).alias("auc"),
            F.round("gap", 6).alias("max_auc_gap"),
        )
        .orderBy("source")
    )


@register(
    "q_dq_volume_anomaly",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s,
               SQRT(CAST(COUNT(*) AS DOUBLE)
                    * CAST(SUM(CAST(c * c AS DECIMAL(38, 0))) AS DOUBLE)
                    - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                   AS t_unit
        FROM d),
    z AS (
        SELECT d.day, d.c,
               CAST(d.c * m.n - m.s AS DOUBLE) / m.t_unit AS z
        FROM d CROSS JOIN m),
    agg AS (
        SELECT CAST(SUM(CASE WHEN ABS(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_anomalous_days
        FROM z),
    worst AS (
        SELECT day, c, z FROM z ORDER BY ABS(z) DESC, day LIMIT 1)
    SELECT agg.n_anomalous_days, worst.day AS worst_day,
           worst.c AS worst_day_rows, ROUND(worst.z, 6) AS worst_z
    FROM agg CROSS JOIN worst
    """,
)
def q_dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily load-volume anomaly monitor: z-score each day's order
    ROW COUNT against the series mean/std (the exact-integer
    comparison trick — v·n − S over √(n·Σv² − S²)), report how many
    days breach |z| > 3 and the single worst day — the first-line
    "did yesterday's load drop half its rows?" check every warehouse
    schedules, complementing value-level audits with a volume-level
    one. Exactly oracled.

    Scale: one count-per-day aggregate, three scalar moments, one
    bounded pass — runs in O(one scan) at any history length."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sqrt(
            F.count(F.lit(1)).cast("double")
            * F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).cast("double")
            - F.sum("c").cast("double") * F.sum("c").cast("double")
        ).alias("t_unit"),
    )
    z = d.crossJoin(F.broadcast(m)).select(
        "day",
        "c",
        ((F.col("c") * F.col("n") - F.col("s")).cast("double") / F.col("t_unit")).alias("z"),
    )
    agg = z.agg(
        F.sum(F.when(F.abs("z") > 3, 1).otherwise(0)).alias("n_anomalous_days")
    )
    worst = z.orderBy(F.desc(F.abs("z")), "day").limit(1)
    return (
        agg.crossJoin(F.broadcast(worst))
        .select(
            "n_anomalous_days",
            F.col("day").alias("worst_day"),
            F.col("c").alias("worst_day_rows"),
            F.round("z", 6).alias("worst_z"),
        )
    )
