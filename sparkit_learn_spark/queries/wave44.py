"""Round-6 wave 44: alert incident compaction (flap suppression via
islands over breach hours), single-aggregate argmax (MAX_BY /
arg_max, the window-free top-1), and the Brown–Forsythe variance-
homogeneity test (ANOVA on absolute deviations from group medians).
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_incident_compaction",
    oracle="""
    WITH h AS (
        SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors
        FROM events GROUP BY 1),
    breach AS (
        SELECT hour, errors, total
        FROM h WHERE errors * 100 >= 2 * total),
    isl AS (
        SELECT hour, errors, total,
               hour - ROW_NUMBER() OVER (ORDER BY hour) AS grp
        FROM breach)
    SELECT MIN(hour) AS start_hour, MAX(hour) AS end_hour,
           CAST(COUNT(*) AS BIGINT) AS duration_hours,
           CAST(SUM(errors) AS BIGINT) AS total_errors,
           ROUND(MAX(errors / CAST(total AS DOUBLE)), 6) AS peak_ratio
    FROM isl GROUP BY grp
    """,
)
def q_evt_incident_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert flap suppression: consecutive SLO-breach hours (the same
    integer 2×-burn predicate as q_evt_slo_burn_rate) collapse into
    single INCIDENTS via the hour-minus-rank island idiom, each with
    its span, error volume, and peak ratio — one incident page
    instead of an hourly alert storm, the dedup step between a
    monitoring rule and a pager. Exact integers; peak ratio is the
    only float, rounded.

    Scale: breaches live at hour grain (series-sized) — the island
    window and incident rollup cost nothing after the one fact-grain
    aggregate; per-service extension partitions the window by
    service key."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    ).agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errors"),
    )
    breach = h.filter(F.col("errors") * 100 >= 2 * F.col("total"))
    isl = breach.select(
        "*",
        (F.col("hour") - F.row_number().over(Window.orderBy("hour"))).alias(
            "grp"
        ),
    )
    return isl.groupBy("grp").agg(
        F.min("hour").alias("start_hour"),
        F.max("hour").alias("end_hour"),
        F.count("*").alias("duration_hours"),
        F.sum("errors").alias("total_errors"),
        F.round(
            F.max(F.col("errors") / F.col("total").cast("double")), 6
        ).alias("peak_ratio"),
    ).drop("grp")


@register(
    "q_agg_argmax_maxby",
    oracle="""
    SELECT c.c_nationkey AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           arg_max(o.o_orderkey,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   * 100000000 - o.o_orderkey) AS top_orderkey,
           CAST(MAX(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS top_cents,
           arg_min(o.o_orderkey,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   * 100000000 + o.o_orderkey) AS bottom_orderkey
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def q_agg_argmax_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free argmax/argmin: each nation's highest- and
    lowest-value order selected by MAX_BY/MIN_BY-style aggregates in
    ONE partial+final aggregation — no per-group window sort, no
    rank, no second pass. Ties break deterministically by packing the
    key into an integer comparator (cents·10⁸ ∓ key — exact while
    keys stay below 10⁸ and order values below ~9·10⁹ cents), so
    both engines pick the identical order. The scalable form of
    'top-1 per group': an aggregate combines map-side, a window
    cannot.

    Scale: COUNT(*)-shaped shuffle carrying one comparator integer
    per group — compare q_win_topk_group, which must sort every
    group's rows; at k=1 the aggregate always wins."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.col("o_orderkey").alias("okey"),
        cents.alias("cents"),
    )
    return j.groupBy("nation").agg(
        F.count("*").alias("n_orders"),
        F.max_by(
            "okey", F.col("cents") * 100000000 - F.col("okey")
        ).alias("top_orderkey"),
        F.max("cents").alias("top_cents"),
        F.min_by(
            "okey", F.col("cents") * 100000000 + F.col("okey")
        ).alias("bottom_orderkey"),
    )


@register(
    "q_stat_levene",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS grp,
               CAST(l_quantity AS BIGINT) AS x
        FROM lineitem),
    med AS (
        SELECT grp, x AS m FROM (
            SELECT grp, x,
                   ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM base)
        WHERE rn = (n + 1) // 2),
    dev AS (
        SELECT b.grp, ABS(b.x - med.m) AS z
        FROM base b JOIN med ON med.grp = b.grp),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(z * z) AS BIGINT) AS szz
        FROM dev GROUP BY grp),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(sz) AS BIGINT) AS tsz,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g),
    parts AS (
        SELECT t.nn, t.k,
               SUM(g.sz * (g.sz / CAST(g.n AS DOUBLE)))
                 - (t.tsz * (t.tsz / CAST(t.nn AS DOUBLE))) AS ssb,
               SUM(g.szz - g.sz * (g.sz / CAST(g.n AS DOUBLE))) AS ssw
        FROM g CROSS JOIN tot t GROUP BY t.nn, t.k, t.tsz)
    SELECT k AS n_groups, nn AS n_rows,
           ROUND((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat
    FROM parts
    """,
)
def q_stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with medians): are quantity
    variances homogeneous across return flags — a one-way ANOVA run
    on each row's ABSOLUTE DEVIATION from its group MEDIAN, the
    robust precondition check for the pooled-variance assumptions
    ANOVA and the t-family make. Medians select deterministically
    (rank (n+1)/2), deviations are exact integers, and the F
    statistic assembles from exact sums in one double step.

    Scale: a per-group rank window for the median, a broadcast of k
    medians back onto the fact, then one moment aggregate — the same
    two-pass profile as any median-centered statistic; at 100 TB
    swap the exact median for the histogram-crossing form."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
    )
    wr = Window.partitionBy("grp").orderBy("x")
    wc = Window.partitionBy("grp")
    med = (
        base.select(
            "grp",
            "x",
            F.row_number().over(wr).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("grp", F.col("x").alias("m"))
    )
    dev = base.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("x") - F.col("m")).alias("z")
    )
    g = dev.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("sz").alias("tsz"),
        F.count("*").alias("k"),
    )
    parts = g.crossJoin(F.broadcast(tot)).groupBy("nn", "k", "tsz").agg(
        (
            F.sum(F.col("sz") * (F.col("sz") / F.col("n").cast("double")))
        ).alias("sb_raw"),
        F.sum(
            F.col("szz")
            - F.col("sz") * (F.col("sz") / F.col("n").cast("double"))
        ).alias("ssw"),
    )
    ssb = F.col("sb_raw") - (
        F.col("tsz") * (F.col("tsz") / F.col("nn").cast("double"))
    )
    return parts.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        F.round(
            (ssb / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )
