"""Round-6 wave 121: Cochran-Armitage trend test (ordered-category
proportions), enum drift detection (categorical values appearing /
vanishing between eras), and attribution-window sensitivity (how
attributed conversions move as the lookback window widens). All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_cochran_armitage",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(n_chars AS BIGINT) // 200, 4) AS bin,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
    g AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS r
        FROM b GROUP BY bin),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                 CAST(SUM(r) AS BIGINT) AS rt,
                 CAST(SUM(bin * n) AS BIGINT) AS sn,
                 SUM(CAST(bin * bin * n AS DECIMAL(38, 0))) AS snn,
                 CAST(SUM(bin * r) AS BIGINT) AS sr
          FROM g)
    SELECT g.bin AS length_bin, g.n, g.r,
           ROUND(CAST(g.r AS DOUBLE) / CAST(g.n AS DOUBLE), 6)
               AS positive_rate,
           ROUND((CAST(t.sr AS DOUBLE) - CAST(t.rt AS DOUBLE)
                      * CAST(t.sn AS DOUBLE) / CAST(t.nt AS DOUBLE))
                 / SQRT(CAST(t.rt AS DOUBLE)
                        * (CAST(t.nt AS DOUBLE) - CAST(t.rt AS DOUBLE))
                        / CAST(t.nt AS DOUBLE)
                        * (CAST(t.snn AS DOUBLE)
                           - CAST(t.sn AS DOUBLE) * CAST(t.sn AS DOUBLE)
                             / CAST(t.nt AS DOUBLE))
                        / CAST(t.nt AS DOUBLE)), 6) AS ca_z
    FROM g CROSS JOIN t ORDER BY length_bin
    """,
)
def q_stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the English share rise
    MONOTONICALLY across ordered 200-char length bins? The
    ordered-alternative test that beats the omnibus chi-square
    exactly when the hypothesis is a dose-response trend (here:
    longer → more likely English), using integer bin scores. All
    moments are exact integers; the z statistic is one closed-form
    double.

    Scale: one pass to 5 ordered bins, constant algebra — the
    ordinal upgrade to WOE/chi2 feature screening at zero extra
    cost."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.least(F.expr("CAST(n_chars AS BIGINT) div 200"), F.lit(4)).alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    g = b.groupBy("bin").agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("r"))
    t = g.agg(
        F.sum("n").alias("nt"),
        F.sum("r").alias("rt"),
        F.sum(F.col("bin") * F.col("n")).alias("sn"),
        F.sum((F.col("bin") * F.col("bin") * F.col("n")).cast("decimal(38,0)")).alias("snn"),
        F.sum(F.col("bin") * F.col("r")).alias("sr"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    num = dd("sr") - dd("rt") * dd("sn") / dd("nt")
    den = F.sqrt(
        dd("rt") * (dd("nt") - dd("rt")) / dd("nt")
        * (dd("snn") - dd("sn") * dd("sn") / dd("nt"))
        / dd("nt")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            F.col("bin").alias("length_bin"),
            "n",
            "r",
            F.round(F.col("r").cast("double") / F.col("n").cast("double"), 6).alias(
                "positive_rate"
            ),
            F.round(num / den, 6).alias("ca_z"),
        )
        .orderBy("length_bin")
    )


@register(
    "q_dq_enum_drift",
    oracle="""
    WITH e AS (
        SELECT p_brand AS val,
               CASE WHEN l.l_shipdate < DATE '1998-04-01' THEN 0 ELSE 1 END
                   AS era
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    g AS (
        SELECT val,
               CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
        FROM e GROUP BY val)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(CASE WHEN n1 = 0 AND n2 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS new_values,
           CAST(SUM(CASE WHEN n1 > 0 AND n2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS vanished_values,
           CAST(SUM(CASE WHEN n1 > 0 AND n2 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS stable_values,
           ROUND(CAST(SUM(CASE WHEN n1 = 0 AND n2 > 0 THEN n2
                          ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(n2) AS DOUBLE), 6) AS new_value_row_share
    FROM g
    """,
)
def q_dq_enum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum drift detection: which categorical values (part brands in
    shipped lines) APPEAR or VANISH between eras — the schema-level
    drift that share-based monitors (q_dq_categorical_drift, PSI)
    blur away: a brand-new enum value is an upstream contract change,
    not a mix shift, and usually breaks downstream CASE logic first.
    Reports new / vanished / stable value counts and the row share
    carried by new values. Exact integers.

    Scale: one conditional pass to value grain — the monitor per
    enum column per load."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    e = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")), li["l_partkey"] == p["p_partkey"]
    ).select(
        F.col("p_brand").alias("val"),
        F.when(F.col("l_shipdate") < F.lit("1998-04-01").cast("date"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = e.groupBy("val").agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).alias("n2"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.when((F.col("n1") == 0) & (F.col("n2") > 0), 1).otherwise(0)).alias(
            "new_values"
        ),
        F.sum(F.when((F.col("n1") > 0) & (F.col("n2") == 0), 1).otherwise(0)).alias(
            "vanished_values"
        ),
        F.sum(F.when((F.col("n1") > 0) & (F.col("n2") > 0), 1).otherwise(0)).alias(
            "stable_values"
        ),
        F.round(
            F.sum(F.when((F.col("n1") == 0) & (F.col("n2") > 0), F.col("n2")).otherwise(0)).cast(
                "double"
            )
            / F.sum("n2").cast("double"),
            6,
        ).alias("new_value_row_share"),
    )


@register(
    "q_evt_attribution_sweep",
    oracle="""
    WITH pur AS (
        SELECT user_id, ts AS pts, event_id
        FROM events WHERE event_type = 'purchase'),
    vw AS (
        SELECT user_id, ts AS vts
        FROM events WHERE event_type = 'view'),
    gap AS (
        SELECT p.user_id, p.event_id,
               MIN(EPOCH(p.pts) - EPOCH(v.vts)) AS best_gap_s
        FROM pur p JOIN vw v
          ON v.user_id = p.user_id AND v.vts <= p.pts
        GROUP BY p.user_id, p.event_id),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM pur),
    w AS (SELECT UNNEST([1, 3, 7]) AS win_days)
    SELECT CAST(w.win_days AS BIGINT) AS window_days,
           CAST(SUM(CASE WHEN gap.best_gap_s <= w.win_days * 86400
                    THEN 1 ELSE 0 END) AS BIGINT) AS attributed,
           n.n_purchases,
           ROUND(CAST(SUM(CASE WHEN gap.best_gap_s <= w.win_days * 86400
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(n.n_purchases AS DOUBLE), 6) AS attribution_rate
    FROM w CROSS JOIN gap CROSS JOIN n
    GROUP BY w.win_days, n.n_purchases ORDER BY window_days
    """,
)
def q_evt_attribution_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: the share of purchases with a
    prior view within 1, 3, and 7 days — computed from ONE pass that
    finds each purchase's closest preceding view, then thresholds it
    at every window (not one join per window). If the attribution
    rate jumps between 1 and 7 days, the reported 'marketing-driven
    revenue' is an artifact of the window choice — this sweep is the
    sensitivity disclosure attribution reporting should ship with.
    Exact integer second gaps.

    Scale: the view-purchase join is user-keyed (bounded per-user
    partitions); the window sweep reuses the single gap column —
    adding windows costs zero extra joins."""
    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "event_id"
    )
    vw = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    gap = (
        pur.join(vw, (F.col("vu") == F.col("user_id")) & (F.col("vts") <= F.col("pts")))
        .groupBy("user_id", "event_id")
        .agg(F.min(F.unix_timestamp("pts") - F.unix_timestamp("vts")).alias("best_gap_s"))
    )
    n = pur.agg(F.count(F.lit(1)).alias("n_purchases"))
    w = spark.createDataFrame([(1,), (3,), (7,)], ["win_days"])
    return (
        w.crossJoin(gap)
        .crossJoin(F.broadcast(n))
        .groupBy("win_days", "n_purchases")
        .agg(
            F.sum(
                F.when(F.col("best_gap_s") <= F.col("win_days") * 86400, 1).otherwise(0)
            ).alias("attributed")
        )
        .select(
            F.col("win_days").cast("long").alias("window_days"),
            "attributed",
            "n_purchases",
            F.round(
                F.col("attributed").cast("double") / F.col("n_purchases").cast("double"), 6
            ).alias("attribution_rate"),
        )
        .orderBy("window_days")
    )
