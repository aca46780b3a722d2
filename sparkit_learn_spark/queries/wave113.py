"""Round-6 wave 113: Kitagawa (Oaxaca-Blinder) rate decomposition
(conversion change = within-segment effect + mix-shift effect),
near-duplicate ROW detection on the orders fact (the data-entry twin
of document dedup), and brand share-shift within part types. All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_kitagawa",
    oracle="""
    WITH u AS (
        SELECT user_id,
               user_id % 4 AS segment,
               CASE WHEN CAST(MIN(ts) AS DATE) < DATE '2024-01-16'
                    THEN 0 ELSE 1 END AS era,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id),
    g AS (
        SELECT era, segment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS conv
        FROM u GROUP BY era, segment),
    t AS (SELECT era, CAST(SUM(n) AS BIGINT) AS tot FROM g GROUP BY era),
    w AS (
        SELECT g.segment,
               MAX(CASE WHEN g.era = 0 THEN CAST(g.n AS DOUBLE)
                   / CAST(t.tot AS DOUBLE) END) AS w0,
               MAX(CASE WHEN g.era = 1 THEN CAST(g.n AS DOUBLE)
                   / CAST(t.tot AS DOUBLE) END) AS w1,
               MAX(CASE WHEN g.era = 0 THEN CAST(g.conv AS DOUBLE)
                   / CAST(g.n AS DOUBLE) END) AS r0,
               MAX(CASE WHEN g.era = 1 THEN CAST(g.conv AS DOUBLE)
                   / CAST(g.n AS DOUBLE) END) AS r1
        FROM g JOIN t ON t.era = g.era
        GROUP BY g.segment)
    SELECT CAST(segment AS BIGINT) AS segment,
           ROUND(r1 - r0, 6) AS rate_change,
           ROUND((r1 - r0) * (w0 + w1) / 2, 6) AS within_effect,
           ROUND((w1 - w0) * (r0 + r1) / 2, 6) AS mix_effect,
           ROUND(SUM((r1 - r0) * (w0 + w1) / 2) OVER (), 6)
               AS total_within,
           ROUND(SUM((w1 - w0) * (r0 + r1) / 2) OVER (), 6) AS total_mix
    FROM w ORDER BY segment
    """,
)
def q_evt_kitagawa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitagawa / Oaxaca-Blinder decomposition of the conversion-rate
    change between the two observation fortnights: per user segment,
    how much of the overall rate delta comes from segments CONVERTING
    differently (within effect, symmetric weights) vs the population
    MIX shifting toward different segments (mix effect) — the
    decomposition that stops "conversion dropped 2pts" from being
    misread when really the traffic mix changed. The two effect
    columns sum exactly to the overall delta by construction. Exact
    integer cells; each effect is a closed-form double.

    Scale: user-grain aggregate → (era × segment) cells → a
    segment-grain pivot; decomposition is algebra over bounded
    cells."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.when(F.min("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
            .otherwise(1)
            .alias("era"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
        )
        .withColumn("segment", F.col("user_id") % 4)
    )
    g = u.groupBy("era", "segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    t = g.groupBy("era").agg(F.sum("n").alias("tot"))
    j = g.join(F.broadcast(t), "era")
    w = j.groupBy("segment").agg(
        F.max(
            F.when(F.col("era") == 0, F.col("n").cast("double") / F.col("tot").cast("double"))
        ).alias("w0"),
        F.max(
            F.when(F.col("era") == 1, F.col("n").cast("double") / F.col("tot").cast("double"))
        ).alias("w1"),
        F.max(
            F.when(F.col("era") == 0, F.col("conv").cast("double") / F.col("n").cast("double"))
        ).alias("r0"),
        F.max(
            F.when(F.col("era") == 1, F.col("conv").cast("double") / F.col("n").cast("double"))
        ).alias("r1"),
    )
    from pyspark.sql import Window

    within = (F.col("r1") - F.col("r0")) * (F.col("w0") + F.col("w1")) / 2
    mix = (F.col("w1") - F.col("w0")) * (F.col("r0") + F.col("r1")) / 2
    wall = Window.partitionBy()
    return w.select(
        F.col("segment").cast("long").alias("segment"),
        F.round(F.col("r1") - F.col("r0"), 6).alias("rate_change"),
        F.round(within, 6).alias("within_effect"),
        F.round(mix, 6).alias("mix_effect"),
        F.round(F.sum(within).over(wall), 6).alias("total_within"),
        F.round(F.sum(mix).over(wall), 6).alias("total_mix"),
    ).orderBy("segment")


@register(
    "q_dq_near_dup_rows",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(ROUND(o_totalprice) / 100) AS BIGINT) AS price_bin,
               o_orderdate AS day
        FROM orders),
    p AS (
        SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
               CAST(DATEDIFF('day', a.day, b.day) AS BIGINT) AS day_gap
        FROM o a JOIN o b
          ON b.o_custkey = a.o_custkey AND b.price_bin = a.price_bin
         AND b.o_orderkey > a.o_orderkey
         AND b.day BETWEEN a.day - INTERVAL 3 DAY
                       AND a.day + INTERVAL 3 DAY),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM o),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(COUNT(DISTINCT key_a) AS BIGINT) AS n_flagged
          FROM p)
    SELECT s.n_pairs, s.n_flagged, n.n_orders,
           ROUND(CAST(s.n_flagged AS DOUBLE) / CAST(n.n_orders AS DOUBLE),
                 6) AS flagged_share
    FROM s CROSS JOIN n
    """,
)
def q_dq_near_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate ROW audit on the orders fact: pairs from the
    same customer, in the same $100 price band, within ±3 days —
    the double-submission / retry-artifact screen every ingest
    pipeline wants (exact-duplicate checks miss retries that differ
    by cents or a day). Blocking on (customer, price_bin) keeps the
    self-join linear — the entity-resolution blocking pattern applied
    to data quality. Exact integer pair counts.

    Scale: the self-join is blocked on a composite key whose groups
    are tiny (orders per customer per band), never all-pairs; the
    date band is a residual predicate inside the block."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.round("o_totalprice") / 100).cast("long").alias("price_bin"),
        F.col("o_orderdate").alias("day"),
    )
    a = o.select(
        F.col("o_orderkey").alias("key_a"),
        F.col("o_custkey").alias("ca"),
        F.col("price_bin").alias("pa"),
        F.col("day").alias("da"),
    )
    b = o.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_custkey").alias("cb"),
        F.col("price_bin").alias("pb"),
        F.col("day").alias("db"),
    )
    p = a.join(
        b,
        (F.col("cb") == F.col("ca"))
        & (F.col("pb") == F.col("pa"))
        & (F.col("key_b") > F.col("key_a"))
        & (F.col("db") >= F.date_sub(F.col("da"), 3))
        & (F.col("db") <= F.date_add(F.col("da"), 3)),
    )
    n = o.agg(F.count(F.lit(1)).alias("n_orders"))
    s = p.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("key_a").alias("n_flagged"),
    )
    return (
        s.crossJoin(F.broadcast(n))
        .select(
            "n_pairs",
            "n_flagged",
            "n_orders",
            F.round(F.col("n_flagged").cast("double") / F.col("n_orders").cast("double"), 6).alias(
                "flagged_share"
            ),
        )
    )


@register(
    "q_fin_brand_share_shift",
    oracle="""
    WITH j AS (
        SELECT p.p_type AS ptype, p.p_brand AS brand,
               CASE WHEN l.l_shipdate < DATE '1998-04-01' THEN 0 ELSE 1 END
                   AS era,
               CAST(ROUND(l.l_extendedprice) AS BIGINT) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    g AS (
        SELECT ptype, brand, era, CAST(SUM(rev) AS BIGINT) AS rev
        FROM j GROUP BY 1, 2, 3),
    t AS (SELECT ptype, era, CAST(SUM(rev) AS BIGINT) AS tot
          FROM g GROUP BY 1, 2),
    s AS (
        SELECT g.ptype, g.brand,
               MAX(CASE WHEN g.era = 0 THEN CAST(g.rev AS DOUBLE)
                   / CAST(t.tot AS DOUBLE) END) AS share0,
               MAX(CASE WHEN g.era = 1 THEN CAST(g.rev AS DOUBLE)
                   / CAST(t.tot AS DOUBLE) END) AS share1
        FROM g JOIN t ON t.ptype = g.ptype AND t.era = g.era
        GROUP BY g.ptype, g.brand
        HAVING MAX(CASE WHEN g.era = 0 THEN 1 END) IS NOT NULL
           AND MAX(CASE WHEN g.era = 1 THEN 1 END) IS NOT NULL)
    SELECT ptype, brand,
           ROUND(share0, 6) AS share_era1,
           ROUND(share1, 6) AS share_era2,
           ROUND(share1 - share0, 6) AS share_shift
    FROM s
    ORDER BY ABS(ROUND(share1 - share0, 6)) DESC, ptype, brand LIMIT 15
    """,
)
def q_fin_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand substitution screen: within each part TYPE (the
    competitive arena), each brand's revenue share before vs after
    the era cut, ranked by absolute shift — brand A gaining exactly
    what brand B loses inside one type is substitution;
    across-the-board gains are market growth. Top-15 shifts with
    deterministic tie-breaks; brands present in both eras only (a
    share shift needs both endpoints). Exact integer revenues.

    Scale: one fact pass with a broadcast part join to (type × brand
    × era) grain — bounded cells; shares and shifts are algebra over
    the cell table."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(p.select("p_partkey", "p_type", "p_brand")),
        li["l_partkey"] == p["p_partkey"],
    ).select(
        F.col("p_type").alias("ptype"),
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_shipdate") < F.lit("1998-04-01").cast("date"), 0)
        .otherwise(1)
        .alias("era"),
        F.round("l_extendedprice").cast("long").alias("rev"),
    )
    g = j.groupBy("ptype", "brand", "era").agg(F.sum("rev").alias("rev"))
    t = g.groupBy("ptype", "era").agg(F.sum("rev").alias("tot"))
    s = (
        g.join(t, ["ptype", "era"])
        .groupBy("ptype", "brand")
        .agg(
            F.max(
                F.when(F.col("era") == 0, F.col("rev").cast("double") / F.col("tot").cast("double"))
            ).alias("share0"),
            F.max(
                F.when(F.col("era") == 1, F.col("rev").cast("double") / F.col("tot").cast("double"))
            ).alias("share1"),
        )
        .filter(F.col("share0").isNotNull() & F.col("share1").isNotNull())
    )
    return (
        s.select(
            "ptype",
            "brand",
            F.round("share0", 6).alias("share_era1"),
            F.round("share1", 6).alias("share_era2"),
            F.round(F.col("share1") - F.col("share0"), 6).alias("share_shift"),
        )
        .orderBy(F.desc(F.abs(F.col("share_shift"))), "ptype", "brand")
        .limit(15)
    )
