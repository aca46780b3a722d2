"""Round-6 wave 115: disparate-impact fairness audit (selection-rate
parity and the four-fifths rule), session bounce rate (single-event
session share per entry type), and categorical drift (chi-square +
Cramér's V on priority-mix shift between eras). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_disparate_impact",
    oracle="""
    WITH p AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                    AS BIGINT) AS selected
        FROM documents GROUP BY source),
    r AS (
        SELECT source, n, selected,
               CAST(selected AS DOUBLE) / CAST(n AS DOUBLE) AS rate
        FROM p),
    mm AS (SELECT MAX(rate) AS mx, MIN(rate) AS mn FROM r)
    SELECT r.source, r.n, r.selected,
           ROUND(r.rate, 6) AS selection_rate,
           ROUND(r.rate / mm.mx, 6) AS impact_ratio,
           CAST(CASE WHEN r.rate / mm.mx < 0.8 THEN 1 ELSE 0 END
                AS BIGINT) AS fails_four_fifths
    FROM r CROSS JOIN mm ORDER BY r.source
    """,
)
def q_ml_disparate_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparate-impact audit of the length≥300 selection filter
    across sources: per-group selection rate, the impact ratio
    against the most-selected group, and the four-fifths-rule flag
    (ratio < 0.8 = adverse impact under the EEOC guideline) — the
    selection-parity complement to the per-group AUC audit
    (q_ml_auc_fairness measures ranking quality; this measures WHO
    gets through the gate). Integer cells, closed-form ratios.

    Scale: one conditional aggregate to group grain + one max/min
    broadcast — the audit to schedule beside every data filter."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0)).alias("selected"),
    )
    r = p.select(
        "source", "n", "selected",
        (F.col("selected").cast("double") / F.col("n").cast("double")).alias("rate"),
    )
    mm = r.agg(F.max("rate").alias("mx"), F.min("rate").alias("mn"))
    return (
        r.crossJoin(F.broadcast(mm))
        .select(
            "source",
            "n",
            "selected",
            F.round("rate", 6).alias("selection_rate"),
            F.round(F.col("rate") / F.col("mx"), 6).alias("impact_ratio"),
            F.when(F.col("rate") / F.col("mx") < 0.8, 1)
            .otherwise(0)
            .cast("long")
            .alias("fails_four_fifths"),
        )
        .orderBy("source")
    )


@register(
    "q_evt_bounce_rate",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_type, event_id,
               CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                        > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sid AS (
        SELECT user_id, ts, event_type, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS session_no
        FROM s),
    sid2 AS (
        SELECT user_id, session_no, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                   ORDER BY ts, event_id) AS rn
        FROM sid),
    sess AS (
        SELECT user_id, session_no,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type
        FROM sid2 GROUP BY user_id, session_no),
    g AS (
        SELECT entry_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS bounces
        FROM sess GROUP BY entry_type)
    SELECT entry_type, n_sessions, bounces,
           ROUND(CAST(bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
               AS bounce_rate
    FROM g ORDER BY entry_type
    """,
)
def q_evt_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry type: sessionize with a 30-minute
    inactivity gap (the standard cumulative-new-session-flag
    sessionizer), then per ENTRY event type the share of
    single-event sessions — the engagement metric that tells you
    which entry points attract visitors who leave immediately.
    Entry type is the deterministic (ts, event_id)-min of the
    session; counts exact.

    Scale: per-user ordered windows (bounded partitions) for
    sessionization, session-grain aggregate after — the canonical
    two-window funnel with no self-join."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wu)) > 1800)
            | F.lag("ts").over(wu).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sid = s.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        F.sum("new_session").over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("session_no"),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    sid2 = sid.select(
        "user_id",
        "session_no",
        "event_type",
        F.row_number().over(ws).alias("rn"),
    )
    sess = sid2.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("entry_type"),
    )
    g = sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("bounces"),
    )
    return g.select(
        "entry_type",
        "n_sessions",
        "bounces",
        F.round(F.col("bounces").cast("double") / F.col("n_sessions").cast("double"), 6).alias(
            "bounce_rate"
        ),
    ).orderBy("entry_type")


@register(
    "q_dq_categorical_drift",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority AS cat,
               CASE WHEN o_orderdate < DATE '1998-04-01' THEN 0 ELSE 1 END
                   AS era
        FROM orders),
    g AS (
        SELECT cat, era, CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY cat, era),
    t AS (SELECT era, CAST(SUM(n) AS BIGINT) AS tot FROM g GROUP BY era),
    tt AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM g),
    ct AS (SELECT cat, CAST(SUM(n) AS BIGINT) AS ctot FROM g GROUP BY cat),
    chi AS (
        SELECT SUM(POW(CAST(g.n AS DOUBLE)
                       - CAST(ct.ctot AS DOUBLE) * CAST(t.tot AS DOUBLE)
                         / CAST(tt.grand AS DOUBLE), 2)
                   / (CAST(ct.ctot AS DOUBLE) * CAST(t.tot AS DOUBLE)
                      / CAST(tt.grand AS DOUBLE))) AS chi2,
               MAX(CAST(tt.grand AS DOUBLE)) AS grand
        FROM g JOIN t ON t.era = g.era JOIN ct ON ct.cat = g.cat
             CROSS JOIN tt)
    SELECT g.cat AS o_orderpriority,
           MAX(CASE WHEN g.era = 0 THEN g.n END) AS n_era1,
           MAX(CASE WHEN g.era = 1 THEN g.n END) AS n_era2,
           ROUND((SELECT chi2 FROM chi), 6) AS chi2,
           ROUND(SQRT((SELECT chi2 FROM chi) / (SELECT grand FROM chi)), 6)
               AS cramers_v
    FROM g GROUP BY g.cat ORDER BY g.cat
    """,
)
def q_dq_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift monitor: has the order-PRIORITY mix shifted
    between eras? The chi-square independence test of (category ×
    era) with Cramér's V effect size — the categorical complement to
    the numeric PSI monitors (q_ml_psi, q_dq_drift), catching a mix
    change in enum-valued columns that value-range profiles miss
    entirely. Exact integer cells; expected counts are products of
    exact marginals.

    Scale: (category × 2)-grain cells from one conditional pass —
    schedule per column per load at any scale."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderdate") < F.lit("1998-04-01").cast("date"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = b.groupBy("cat", "era").agg(F.count(F.lit(1)).alias("n"))
    t = g.groupBy("era").agg(F.sum("n").alias("tot"))
    ct = g.groupBy("cat").agg(F.sum("n").alias("ctot"))
    tt = g.agg(F.sum("n").alias("grand"))
    j = (
        g.join(F.broadcast(t), "era")
        .join(F.broadcast(ct), "cat")
        .crossJoin(F.broadcast(tt))
    )
    exp = F.col("ctot").cast("double") * F.col("tot").cast("double") / F.col("grand").cast("double")
    chi = j.agg(
        F.sum(F.pow(F.col("n").cast("double") - exp, F.lit(2)) / exp).alias("chi2"),
        F.max(F.col("grand").cast("double")).alias("grand"),
    )
    out = (
        g.groupBy("cat")
        .agg(
            F.max(F.when(F.col("era") == 0, F.col("n"))).alias("n_era1"),
            F.max(F.when(F.col("era") == 1, F.col("n"))).alias("n_era2"),
        )
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("cat").alias("o_orderpriority"),
            "n_era1",
            "n_era2",
            F.round("chi2", 6).alias("chi2"),
            F.round(F.sqrt(F.col("chi2") / F.col("grand")), 6).alias("cramers_v"),
        )
        .orderBy("o_orderpriority")
    )
    return out
