"""Round-6 wave 14: top event-path trigrams (sequence mining), Wilson
score confidence intervals for proportions, inter-arrival-time
statistics (exponential-fit diagnostics), and a zone-map pruning
simulation (the file-level min/max skipping a 100 TB scan relies on).
All exactly DuckDB-oracled from exact-integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_path_trigrams",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    t AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path
        FROM o WHERE e3 IS NOT NULL)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def q_evt_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining: the 10 most frequent 3-event paths across all
    user journeys, via LEAD over the (ts, event_id)-ordered per-user
    stream — the event_id tie-break makes every trigram deterministic
    under equal timestamps, and the (count, path) sort makes the
    top-10 cut engine-stable.

    Scale: the window is keyed by user (bounded partitions, no global
    sort); trigram counting is a map-side-combining aggregate over a
    tiny path domain; top-10 compiles to TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        o.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@register(
    "q_stat_wilson_ci",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM orders GROUP BY 1),
    d AS (
        SELECT o_orderpriority, n, k,
               CAST(k AS DOUBLE) / n AS p, CAST(n AS DOUBLE) AS nd
        FROM c)
    SELECT o_orderpriority, n, k, ROUND(p, 6) AS p_hat,
           ROUND((p + 1.9599639845400545 * 1.9599639845400545 / (2 * nd)
                  - 1.9599639845400545
                    * SQRT(p * (1 - p) / nd
                           + 1.9599639845400545 * 1.9599639845400545
                             / (4 * nd * nd)))
                 / (1 + 1.9599639845400545 * 1.9599639845400545 / nd), 6)
               AS ci_low,
           ROUND((p + 1.9599639845400545 * 1.9599639845400545 / (2 * nd)
                  + 1.9599639845400545
                    * SQRT(p * (1 - p) / nd
                           + 1.9599639845400545 * 1.9599639845400545
                             / (4 * nd * nd)))
                 / (1 + 1.9599639845400545 * 1.9599639845400545 / nd), 6)
               AS ci_high
    FROM d
    """,
)
def q_stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for a proportion (share of
    finalized orders per priority class) — the interval that behaves at
    small n and extreme p where the normal approximation fails. Inputs
    are exact integer counts, and both engines evaluate the identical
    closed-form expression (z spelled as the same 17-digit literal), so
    the bounds are bit-identical before rounding.

    Scale: one map-side-combining count aggregate; the interval math is
    constant-time per group — the monitoring-metric shape (rate +
    honest uncertainty) a pipeline dashboard computes per batch."""
    z = 1.9599639845400545
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    nd = F.col("n").cast("double")
    half = z * F.sqrt(p * (1 - p) / nd + z * z / (4 * nd * nd))
    center = p + z * z / (2 * nd)
    denom = 1 + z * z / nd
    return c.select(
        "o_orderpriority",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_low"),
        F.round((center + half) / denom, 6).alias("ci_high"),
    )


@register(
    "q_ts_interarrival",
    oracle="""
    WITH g AS (
        SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(gap_us) AS sg,
               SUM(CAST(gap_us AS DECIMAL(19, 0))
                   * CAST(gap_us AS DECIMAL(19, 0))) AS sg2
        FROM g WHERE gap_us IS NOT NULL)
    SELECT n,
           ROUND(CAST(sg AS DOUBLE) / n / 1e6, 6) AS mean_gap_s,
           ROUND(3.6e9 * n / CAST(sg AS DOUBLE), 6) AS lambda_per_hr,
           ROUND(SQRT(CAST(n AS DOUBLE) * CAST(sg2 AS DOUBLE)
                      - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                 / CAST(sg AS DOUBLE), 6) AS cv
    FROM s
    """,
)
def q_ts_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time statistics over per-user event streams: mean
    gap, the exponential-MLE event rate (per hour), and the coefficient
    of variation (CV ≈ 1 under a Poisson process; ≫1 = bursty). Gaps
    are exact microsecond integers; the squared-gap sum runs in
    DECIMAL(38,0) (a day-long gap squared exceeds int64), so every
    statistic divides bit-identical operands.

    Scale: a user-keyed LAG window (bounded partitions) feeding one
    global three-sum aggregate — the arrival-process diagnostic a
    stream-ingest pipeline computes per batch to detect burstiness."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select((us - F.lag(us).over(w)).alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    s = g.agg(
        F.count("*").alias("n"),
        F.sum("gap_us").alias("sg"),
        F.sum(
            F.col("gap_us").cast("decimal(19,0)")
            * F.col("gap_us").cast("decimal(19,0)")
        ).alias("sg2"),
    )
    nd = F.col("n").cast("double")
    sgd = F.col("sg").cast("double")
    return s.select(
        "n",
        F.round(sgd / F.col("n") / 1e6, 6).alias("mean_gap_s"),
        F.round(F.lit(3.6e9) * F.col("n") / sgd, 6).alias("lambda_per_hr"),
        F.round(
            F.sqrt(nd * F.col("sg2").cast("double") - sgd * sgd) / sgd, 6
        ).alias("cv"),
    )


@register(
    "q_scan_zonemap",
    oracle="""
    WITH files AS (
        SELECT l_orderkey // 187500 AS file_id,
               MIN(CAST(l_shipdate AS DATE)) AS min_ship,
               MAX(CAST(l_shipdate AS DATE)) AS max_ship,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1)
    SELECT CAST(file_id AS BIGINT) AS file_id, min_ship, max_ship, n_rows,
           CASE WHEN max_ship < DATE '1997-01-01' THEN 1 ELSE 0 END AS pruned,
           CASE WHEN max_ship < DATE '1997-01-01' THEN n_rows
                ELSE CAST(0 AS BIGINT) END AS rows_skipped
    FROM files
    """,
)
def q_scan_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file-statistics) pruning simulation: partition the
    fact into synthetic 'files' by order-key range, compute each file's
    min/max ship date — exactly the footer statistics parquet keeps —
    and report which files a `l_shipdate >= 1997-01-01` scan would
    skip without opening. This is the mechanism behind `PushedFilters`
    actually saving I/O at 100 TB: the predicate prunes FILES via
    min/max, not rows via decode.

    Scale: one map-side-combining aggregate at file grain; the real
    engine reads these stats from footers (metadata-only), so the
    report itself costs no data I/O — here we derive them from rows to
    make the simulation exactly oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01").cast("date")
    files = li.groupBy(
        F.floor(F.col("l_orderkey") / 187500).cast("long").alias("file_id")
    ).agg(
        F.min(F.col("l_shipdate").cast("date")).alias("min_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("max_ship"),
        F.count("*").alias("n_rows"),
    )
    pruned = F.when(F.col("max_ship") < cutoff, 1).otherwise(0)
    return files.select(
        "file_id",
        "min_ship",
        "max_ship",
        "n_rows",
        pruned.cast("int").alias("pruned"),
        F.when(F.col("max_ship") < cutoff, F.col("n_rows"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rows_skipped"),
    )
