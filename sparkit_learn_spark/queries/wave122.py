"""Round-6 wave 122: record-highs randomness test (count of running
maxima vs the harmonic expectation, micro-quantized exactly),
timestamp-artifact audit (batch-stamped / duplicated clock values),
and cost-sensitive classifier valuation against trivial policies.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_record_highs",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    r AS (
        SELECT day, v,
               MAX(v) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max,
               ROW_NUMBER() OVER (ORDER BY day) AS k
        FROM d),
    rec AS (
        SELECT CAST(SUM(CASE WHEN prev_max IS NULL OR v > prev_max
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r),
    harm AS (
        SELECT CAST(SUM(CAST(ROUND(1000000000.0 / k) AS BIGINT)) AS BIGINT)
                   AS h9,
               CAST(SUM(CAST(ROUND(1000000000.0 / k) AS BIGINT)
                        - CAST(ROUND(1000000000.0 / (CAST(k AS DOUBLE)
                              * CAST(k AS DOUBLE))) AS BIGINT)) AS BIGINT)
                   AS v9
        FROM r)
    SELECT rec.n_records, rec.n AS n_days,
           ROUND(CAST(harm.h9 AS DOUBLE) / 1e9, 6) AS expected_records,
           ROUND((CAST(rec.n_records AS DOUBLE)
                  - CAST(harm.h9 AS DOUBLE) / 1e9)
                 / SQRT(CAST(harm.v9 AS DOUBLE) / 1e9), 6) AS z_score
    FROM rec CROSS JOIN harm
    """,
)
def q_ts_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-highs test: count the days that set a new all-time
    revenue high and compare with the exchangeability expectation
    H_n = Σ 1/k (variance Σ(1/k − 1/k²)) — far more records than
    ~ln n means genuine growth, far fewer means early outliers or a
    capped metric; the records process is the classic distribution-
    free growth test. Records come from a running-max window;
    harmonic terms are micro-quantized to nano-units BEFORE summation
    so the expectation is an exact integer sum in both engines.

    Scale: one running-max window + one per-rank fold over the day
    grain."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    r = d.select(
        "v",
        F.max("v").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("prev_max"),
        F.row_number().over(w).alias("k"),
    )
    rec = r.agg(
        F.sum(
            F.when(F.col("prev_max").isNull() | (F.col("v") > F.col("prev_max")), 1).otherwise(0)
        ).alias("n_records"),
        F.count(F.lit(1)).alias("n"),
    )
    h_term = F.round(1000000000.0 / F.col("k")).cast("long")
    h2_term = F.round(
        1000000000.0 / (F.col("k").cast("double") * F.col("k").cast("double"))
    ).cast("long")
    harm = r.agg(
        F.sum(h_term).alias("h9"),
        F.sum(h_term - h2_term).alias("v9"),
    )
    return (
        rec.crossJoin(F.broadcast(harm))
        .select(
            "n_records",
            F.col("n").alias("n_days"),
            F.round(F.col("h9").cast("double") / 1e9, 6).alias("expected_records"),
            F.round(
                (F.col("n_records").cast("double") - F.col("h9").cast("double") / 1e9)
                / F.sqrt(F.col("v9").cast("double") / 1e9),
                6,
            ).alias("z_score"),
        )
    )


@register(
    "q_dq_timestamp_artifacts",
    oracle="""
    WITH e AS (
        SELECT ts,
               EPOCH(ts) AS sec,
               CAST(DATE_PART('hour', ts) AS BIGINT) AS hr,
               CAST(DATE_PART('minute', ts) AS BIGINT) AS mi,
               CAST(DATE_PART('second', ts) AS BIGINT) AS se
        FROM events),
    dup AS (
        SELECT CAST(SUM(c - 1) AS BIGINT) AS extra_rows,
               CAST(COUNT(*) AS BIGINT) AS distinct_ts
        FROM (SELECT ts, COUNT(*) AS c FROM e GROUP BY ts)),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
    SELECT n.n AS n_events,
           dup.extra_rows AS duplicated_timestamp_rows,
           ROUND(CAST(dup.extra_rows AS DOUBLE) / CAST(n.n AS DOUBLE), 6)
               AS dup_ts_share,
           (SELECT CAST(SUM(CASE WHEN hr = 0 AND mi = 0 AND se = 0
                           THEN 1 ELSE 0 END) AS BIGINT) FROM e)
               AS midnight_exact_rows,
           (SELECT ROUND(CAST(SUM(CASE WHEN mi = 0 AND se = 0
                              THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE), 6) FROM e)
               AS on_the_hour_share
    FROM n CROSS JOIN dup
    """,
)
def q_dq_timestamp_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-artifact audit: rows sharing an EXACT timestamp with
    another row (collision mass), midnight-exact rows, and the
    on-the-hour share — the screens that catch batch-stamped backfills
    (one clock value for a whole file), truncated precision, and
    default-value timestamps, which silently corrupt sessionization
    and every latency metric downstream. Organic event streams at
    microsecond precision should show ~zero on all three. Exact
    integer counts.

    Scale: one distinct-count pass + one conditional pass — per-load
    monitor cost."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "ts",
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("se"),
    ).persist()
    dup = (
        e.groupBy("ts")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") - 1).alias("extra_rows"),
            F.count(F.lit(1)).alias("distinct_ts"),
        )
    )
    n = e.agg(F.count(F.lit(1)).alias("n"))
    mid = e.agg(
        F.sum(
            F.when((F.col("hr") == 0) & (F.col("mi") == 0) & (F.col("se") == 0), 1).otherwise(0)
        ).alias("midnight_exact_rows"),
        F.round(
            F.sum(F.when((F.col("mi") == 0) & (F.col("se") == 0), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("on_the_hour_share"),
    )
    return (
        n.crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(mid))
        .select(
            F.col("n").alias("n_events"),
            F.col("extra_rows").alias("duplicated_timestamp_rows"),
            F.round(F.col("extra_rows").cast("double") / F.col("n").cast("double"), 6).alias(
                "dup_ts_share"
            ),
            "midnight_exact_rows",
            "on_the_hour_share",
        )
    )


@register(
    "q_ml_expected_cost",
    oracle="""
    WITH c AS (
        SELECT CAST(SUM(CASE WHEN n_chars >= 300 AND lang = 'en'
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN n_chars >= 300 AND lang <> 'en'
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN n_chars < 300 AND lang = 'en'
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN n_chars < 300 AND lang <> 'en'
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents)
    SELECT tp, fp, fn, tn,
           ROUND((1.0 * fp + 5.0 * fn) / CAST(n AS DOUBLE), 6)
               AS model_cost_per_doc,
           ROUND(5.0 * CAST(tp + fn AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS all_negative_cost,
           ROUND(1.0 * CAST(fp + tn AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS all_positive_cost,
           ROUND(1 - ((1.0 * fp + 5.0 * fn) / CAST(n AS DOUBLE))
                     / LEAST(5.0 * CAST(tp + fn AS DOUBLE)
                             / CAST(n AS DOUBLE),
                             1.0 * CAST(fp + tn AS DOUBLE)
                             / CAST(n AS DOUBLE)), 6) AS cost_skill
    FROM c
    """,
)
def q_ml_expected_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive valuation of the English detector under an
    asymmetric cost matrix (FP = 1, FN = 5 — missing an English doc
    costs 5× a false alarm): expected cost per document vs the two
    trivial policies (flag-nothing, flag-everything) and the cost
    skill (1 − model/best-trivial) — positive skill is the ship/kill
    criterion accuracy and F1 cannot give when errors have different
    prices. Integer cells; literal cost algebra.

    Scale: one confusion pass, constant output — the decision-theory
    wrapper to put on every production threshold."""
    docs = load_table(spark, sf_dir, "documents")
    pred = F.col("n_chars") >= 300
    gold = F.col("lang") == "en"
    c = docs.agg(
        F.sum(F.when(pred & gold, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~gold, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & gold, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~gold, 1).otherwise(0)).alias("tn"),
        F.count(F.lit(1)).alias("n"),
    )
    nd = F.col("n").cast("double")
    model = (1.0 * F.col("fp") + 5.0 * F.col("fn")) / nd
    allneg = 5.0 * (F.col("tp") + F.col("fn")).cast("double") / nd
    allpos = 1.0 * (F.col("fp") + F.col("tn")).cast("double") / nd
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(model, 6).alias("model_cost_per_doc"),
        F.round(allneg, 6).alias("all_negative_cost"),
        F.round(allpos, 6).alias("all_positive_cost"),
        F.round(1 - model / F.least(allneg, allpos), 6).alias("cost_skill"),
    )
