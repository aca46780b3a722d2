"""Round-6 wave 86: exact average precision / PR-AUC over a discrete
score domain (histogram grain, no global sort), unique-key discovery
(the data-catalog primitive symmetric to FK inference), and circular
time-of-day statistics (literal trig table, exact integer resultant
sums). All exactly DuckDB-oracled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_average_precision",
    oracle="""
    WITH scored AS (
        SELECT CAST(l_quantity AS BIGINT) AS score,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem),
    h AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS p
        FROM scored GROUP BY score),
    cum AS (
        SELECT score, n, p,
               SUM(n) OVER (ORDER BY score DESC) AS cn,
               SUM(p) OVER (ORDER BY score DESC) AS cp,
               SUM(p) OVER () AS pt
        FROM h),
    terms AS (
        -- positives inside a tied-score block contribute the block's
        -- interpolated precision: avg over positions is replaced by
        -- the standard tie handling AP = sum over blocks of
        -- p_block * (cp_mid / cn_mid) with mid = trapezoid of the
        -- block; we use the exact pessimistic-tie convention
        -- (precision evaluated at the END of each block), identical
        -- in both engines.
        SELECT p * (CAST(cp AS DOUBLE) / cn) AS t, p, pt
        FROM cum WHERE p > 0)
    SELECT CAST(MAX(pt) AS BIGINT) AS n_positives,
           ROUND(SUM(CAST(ROUND(t * 1000000) AS BIGINT))
                 / CAST(MAX(pt) AS DOUBLE) / 1000000.0, 6)
               AS average_precision
    FROM terms
    """,
)
def q_ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (PR-AUC) of quantity as a returned-
    lineitem classifier, computed at score-histogram grain: ranking
    by a discrete score means precision only changes at block
    boundaries, so AP = Σ_blocks pos_in_block · precision(end of
    block) / total_pos — the end-of-block tie convention, identical
    in both engines, with per-block terms micro-quantized before the
    sum. Completes the ranking-eval family (ROC-AUC, PR curve at
    deciles → exact AP).

    Scale: one histogram aggregate over the bounded score domain, a
    window over ≤50 rows — never a global sort of the fact, the same
    trick as the distributed AUC.
    """
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(F.col("l_quantity").cast("long").alias("score")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("p"),
    )
    wd = Window.orderBy(F.col("score").desc())
    wt = Window.partitionBy()
    cum = h.select(
        "p",
        F.sum("n").over(wd).alias("cn"),
        F.sum("p").over(wd).alias("cp"),
        F.sum("p").over(wt).alias("pt"),
    )
    terms = cum.filter(F.col("p") > 0).select(
        "p",
        "pt",
        F.round(
            F.col("p") * (F.col("cp").cast("double") / F.col("cn")) * 1000000
        )
        .cast("long")
        .alias("t6"),
    )
    return terms.agg(
        F.max("pt").alias("n_positives"),
        F.round(
            F.sum("t6") / F.max("pt").cast("double") / 1000000.0, 6
        ).alias("average_precision"),
    )


@register(
    "q_dq_key_discovery",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
    cand AS (
        SELECT 'l_orderkey' AS key_cols,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey',
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_orderkey,l_linenumber',
               CAST(COUNT(DISTINCT l_orderkey * 1000 + l_linenumber)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_orderkey,l_partkey',
               CAST(COUNT(DISTINCT (l_orderkey * 4294967296
                                    + l_partkey)) AS BIGINT)
        FROM lineitem)
    SELECT c.key_cols, c.ndv, n.n AS n_rows,
           ROUND(CAST(c.ndv AS DOUBLE) / n.n, 6) AS uniqueness,
           CAST(c.ndv = n.n AS BIGINT) AS is_key
    FROM cand c CROSS JOIN n
    ORDER BY c.key_cols
    """,
)
def q_dq_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-key discovery over candidate column sets of lineitem:
    distinct-count-to-row-count ratios decide which candidates are
    true keys ((orderkey, linenumber) is; orderkey alone is not) —
    the data-catalog primitive symmetric to the registered
    foreign-key inference, and the check every MERGE/upsert pipeline
    should run before trusting its join key. Composite candidates
    pack into a single integer (linenumber < 1000, partkey < 2³²) so
    the distinct is one column in both engines.

    Scale: each candidate is one distinct-aggregate over the fact
    (map-side partial dedup); candidates share the single scan via
    the union. At 100 TB swap exact NDV for the registered HLL
    sketch at the same plan shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cands = [
        ("l_orderkey", F.col("l_orderkey")),
        ("l_partkey", F.col("l_partkey")),
        (
            "l_orderkey,l_linenumber",
            F.col("l_orderkey") * 1000 + F.col("l_linenumber"),
        ),
        (
            "l_orderkey,l_partkey",
            F.col("l_orderkey") * 4294967296 + F.col("l_partkey"),
        ),
    ]
    # Persist the 4-column CANDIDATE projection, not the whole fact:
    # the four NDV passes then read 32 bytes/row from cache instead of
    # re-materializing all 16 lineitem columns, and the count rides on
    # the same cache. (A single multi-distinct aggregate was tried
    # first — Spark plans it as Expand×4 + 5-key partial aggregate and
    # it measured 2.7× SLOWER than the separate passes at sf0.1, so the
    # per-candidate passes stay; guide §1.1: measure, then keep what
    # wins.)
    proj = li.select(
        *[expr.alias(f"c{i}") for i, (_, expr) in enumerate(cands)]
    ).persist()
    n = proj.agg(F.count(F.lit(1)).alias("n"))
    parts = None
    for i, (name, _) in enumerate(cands):
        one = proj.agg(F.countDistinct(f"c{i}").alias("ndv")).select(
            F.lit(name).alias("key_cols"), "ndv"
        )
        parts = one if parts is None else parts.unionAll(one)
    return (
        parts.crossJoin(F.broadcast(n))
        .select(
            "key_cols",
            "ndv",
            F.col("n").alias("n_rows"),
            F.round(F.col("ndv").cast("double") / F.col("n"), 6).alias(
                "uniqueness"
            ),
            (F.col("ndv") == F.col("n")).cast("long").alias("is_key"),
        )
        .orderBy("key_cols")
    )


_TRIG = [
    (
        h,
        round(math.sin(2 * math.pi * h / 24) * 1_000_000),
        round(math.cos(2 * math.pi * h / 24) * 1_000_000),
    )
    for h in range(24)
]
_TRIG_VALUES = ", ".join(f"({h}, {s}, {c})" for h, s, c in _TRIG)


@register(
    "q_ts_circular_mean",
    oracle=f"""
    WITH trig AS (
        SELECT CAST(h AS BIGINT) AS h, CAST(s AS BIGINT) AS s,
               CAST(c AS BIGINT) AS c
        FROM (VALUES {_TRIG_VALUES}) t(h, s, c)),
    e AS (
        SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
        FROM events WHERE event_type = 'purchase'),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t.s) AS BIGINT) AS ss,
               CAST(SUM(t.c) AS BIGINT) AS sc
        FROM e JOIN trig t ON t.h = e.h)
    SELECT n AS n_purchases,
           ROUND(((ATAN2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
                   / (2 * PI()) * 24.0) + 24.0) % 24.0, 6)
               AS circular_mean_hour,
           ROUND(SQRT(CAST(ss AS DOUBLE) * ss + CAST(sc AS DOUBLE) * sc)
                 / n / 1000000.0, 6) AS resultant_length
    FROM agg
    """,
)
def q_ts_circular_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular mean purchase hour: hours map to unit-circle angles
    via a 24-entry LITERAL micro-unit sin/cos table (no runtime trig
    in the aggregate), the resultant vector (ΣS, ΣC) accumulates as
    exact integers, and the mean direction/concentration come from
    one ATAN2/SQRT at the end. The correct "peak hour" statistic —
    an arithmetic mean of hours puts the peak of a 23:00/01:00
    distribution at noon; circular statistics put it at midnight.

    Scale: a broadcast join against the 24-row trig dimension and
    one integer aggregate — the transcendental surface is two calls
    on one row.
    """
    ev = load_table(spark, sf_dir, "events")
    trig = F.broadcast(
        spark.createDataFrame(_TRIG, "h: long, s: long, c: long")
    )
    e = ev.filter(F.col("event_type") == "purchase").select(
        F.hour("ts").cast("long").alias("h")
    )
    agg = e.join(trig, "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("ss"),
        F.sum("c").alias("sc"),
    )
    two_pi = 2 * math.pi
    return agg.select(
        F.col("n").alias("n_purchases"),
        F.round(
            (
                F.atan2(F.col("ss").cast("double"), F.col("sc").cast("double"))
                / two_pi
                * 24.0
                + 24.0
            )
            % 24.0,
            6,
        ).alias("circular_mean_hour"),
        F.round(
            F.sqrt(
                F.col("ss").cast("double") * F.col("ss")
                + F.col("sc").cast("double") * F.col("sc")
            )
            / F.col("n")
            / 1000000.0,
            6,
        ).alias("resultant_length"),
    )
