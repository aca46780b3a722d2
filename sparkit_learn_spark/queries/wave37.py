"""Round-6 wave 37: SLO burn-rate monitoring (windowed error-budget
consumption), last-observation-carried-forward gap fill on a calendar
spine, and a dedup-method impact report (exact-hash vs fingerprint
reductions side by side). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_slo_burn_rate",
    oracle="""
    WITH h AS (
        SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors
        FROM events GROUP BY 1)
    SELECT hour, total, errors,
           ROUND(errors / CAST(total AS DOUBLE), 6) AS error_ratio,
           ROUND(errors / CAST(total AS DOUBLE) / 0.01, 6) AS burn_rate,
           CASE WHEN errors * 100 >= 2 * total THEN 1 ELSE 0 END
               AS breach
    FROM h
    """,
)
def q_evt_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn-rate monitor: hourly error-budget consumption against
    a 1% error-rate objective — burn_rate = observed ratio / budget,
    with the 2× fast-burn alert evaluated as the INTEGER inequality
    errors·100 ≥ 2·total (no float threshold can flip between
    engines). The multiwindow burn-rate alert rule SRE handbooks
    prescribe, at its hourly grain.

    Scale: one map-side-combining aggregate at hour grain; the alert
    predicate is row-local on the tiny hourly series. Extend to the
    1h/6h/3d multiwindow rule by reusing this aggregate under three
    trailing windows — still series-sized."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    ).agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errors"),
    )
    ratio = F.col("errors") / F.col("total").cast("double")
    return h.select(
        "hour",
        "total",
        "errors",
        F.round(ratio, 6).alias("error_ratio"),
        F.round(ratio / 0.01, 6).alias("burn_rate"),
        F.when(
            F.col("errors") * 100 >= 2 * F.col("total"), 1
        )
        .otherwise(0)
        .alias("breach"),
    )


@register(
    "q_win_gap_fill_locf",
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
    spine AS (
        SELECT CAST(u.g AS TIMESTAMP) AS day
        FROM bounds,
             unnest(generate_series(bounds.d0, bounds.d1,
                                    INTERVAL 1 DAY)) AS u(g)),
    joined AS (
        SELECT s.day, d.n,
               CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS is_filled
        FROM spine s LEFT JOIN d ON d.day = s.day)
    SELECT day,
           CAST(LAST_VALUE(n IGNORE NULLS) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_locf,
           CAST(is_filled AS BIGINT) AS is_filled
    FROM joined
    """,
)
def q_win_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by last observation carried forward: the daily
    purchase-count series densified onto a full calendar spine, with
    missing days inheriting the most recent observed value (and
    flagged) — the step-function gap-fill for metrics that persist
    until changed (inventory, settings, last-known state), the
    counterpart of q_ts_interpolate's linear fill. Counts stay exact
    integers; no float arithmetic at all.

    Scale: the spine is generated at day grain (series-sized, not
    data-sized), the observed series comes from one map-side
    aggregate, and the LOCF is a single IGNORE NULLS window over the
    spine — at 100 TB partition the window by series key; each key's
    spine is still tiny."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    d = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    bounds = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day")
    )
    joined = spine.join(d, "day", "left").select(
        "day",
        "n",
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_filled"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        F.last("n", ignorenulls=True).over(w).cast("long").alias("n_locf"),
        F.col("is_filled").cast("long").alias("is_filled"),
    )


@register(
    "q_llm_dedup_impact",
    oracle="""
    WITH t AS (
        SELECT doc_id, n_chars,
               sha256(lower(trim(text))) AS exact_key,
               array_to_string(list_sort(list_distinct(
                   string_split(lower(text), ' '))), ' ') AS fp_key
        FROM documents),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars FROM t),
    ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(SUM(k_chars) AS BIGINT) AS chars_after
        FROM (SELECT arg_min(n_chars, doc_id) AS k_chars
              FROM t GROUP BY exact_key)),
    fp AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(SUM(k_chars) AS BIGINT) AS chars_after
        FROM (SELECT arg_min(n_chars, doc_id) AS k_chars
              FROM t GROUP BY fp_key))
    SELECT m.method, t.n_docs AS docs_before, m.n_after AS docs_after,
           t.n_docs - m.n_after AS docs_removed,
           t.chars AS chars_before, m.chars_after,
           ROUND((t.chars - m.chars_after) / CAST(t.chars AS DOUBLE), 6)
               AS char_reduction
    FROM (SELECT 'exact_sha' AS method, * FROM ex
          UNION ALL SELECT 'fingerprint', * FROM fp) m
    CROSS JOIN tot t
    """,
)
def q_llm_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method impact report: exact-hash and fingerprint-key
    dedup applied side by side, each keeping the min-id document per
    group, reporting surviving doc counts, char mass, and the char
    reduction each method buys — the comparison table a pipeline
    owner reads before choosing where on the recall/cost ladder to
    run (fingerprint always ⊇ exact's removals). Exact integers
    throughout; the kept doc's char count selects by (doc_id) order
    in both engines.

    Scale: two independent digest-grain aggregates over one shared
    row-local feature pass — the same shuffle profile as exact dedup
    itself, twice; methods are embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "n_chars",
        F.sha2(F.lower(F.trim("text")), 256).alias("exact_key"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.split(F.lower(F.col("text")), " "))
            ),
            " ",
        ).alias("fp_key"),
    )
    tot = t.agg(
        F.count("*").alias("docs_before"), F.sum("n_chars").alias("chars_before")
    )

    def method(key: str, name: str) -> DataFrame:
        kept = (
            t.select(
                key,
                F.struct("doc_id", "n_chars").alias("rec"),
            )
            .groupBy(key)
            .agg(F.min("rec").alias("k"))
            .select(F.col("k.n_chars").alias("k_chars"))
        )
        return kept.agg(
            F.count("*").alias("docs_after"),
            F.sum("k_chars").alias("chars_after"),
        ).select(F.lit(name).alias("method"), "docs_after", "chars_after")

    m = method("exact_key", "exact_sha").unionByName(
        method("fp_key", "fingerprint")
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "method",
        "docs_before",
        "docs_after",
        (F.col("docs_before") - F.col("docs_after")).alias("docs_removed"),
        "chars_before",
        "chars_after",
        F.round(
            (F.col("chars_before") - F.col("chars_after"))
            / F.col("chars_before").cast("double"),
            6,
        ).alias("char_reduction"),
    )
