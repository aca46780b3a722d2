"""Round-6 wave 18: ratio-to-report hierarchy shares (the OLAP
share-of-parent pattern), seasonally-adjusted daily outliers (top-k by
deseasonalized residual), repeat-purchase interval analysis, and a
feature-hashing collision audit. All exactly DuckDB-oracled; every
ranking cut orders on values derived from exact integers with explicit
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_share_of_parent",
    oracle="""
    WITH n AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2)
    SELECT region, nation, ROUND(rev_c / 100.0, 2) AS revenue,
           ROUND(rev_c / CAST(SUM(rev_c) OVER (PARTITION BY region)
                              AS DOUBLE), 6) AS share_of_region,
           ROUND(rev_c / CAST(SUM(rev_c) OVER () AS DOUBLE), 6)
               AS share_of_total,
           ROUND(SUM(rev_c) OVER (PARTITION BY region)
                 / CAST(SUM(rev_c) OVER () AS DOUBLE), 6)
               AS region_share_of_total
    FROM n
    """,
)
def q_agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report over the region→nation hierarchy: each nation's
    revenue as a share of its region, of the grand total, and the
    region's share of the total — the OLAP share-of-parent pattern
    that RATIO_TO_REPORT named. Revenue is exact integer cents at
    every level, so all three ratios divide identical bigints.

    Scale: the fact aggregates once to (region, nation) grain with
    broadcast dimension joins; the share windows then run over the
    25-row hierarchy — window-over-aggregate, never window-over-fact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
        )
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return base.select(
        "region",
        "nation",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(
            F.col("rev_c") / F.sum("rev_c").over(wr).cast("double"), 6
        ).alias("share_of_region"),
        F.round(
            F.col("rev_c") / F.sum("rev_c").over(wt).cast("double"), 6
        ).alias("share_of_total"),
        F.round(
            F.sum("rev_c").over(wr) / F.sum("rev_c").over(wt).cast("double"), 6
        ).alias("region_share_of_total"),
    )


@register(
    "q_ts_seasonal_outliers",
    oracle="""
    WITH day_rev AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1),
    tr AS (
        SELECT d, rev_c,
               SUM(rev_c) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7_c,
               COUNT(*) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
        FROM day_rev),
    det AS (
        SELECT d, isodow(d) AS dow, 7 * rev_c - t7_c AS det7
        FROM tr WHERE n7 = 7),
    seas AS (
        SELECT dow, SUM(det7) AS s_det, CAST(COUNT(*) AS BIGINT) AS n_d
        FROM det GROUP BY dow),
    r AS (
        SELECT det.d, det.dow,
               ABS(CAST(det.det7 AS DOUBLE) / 700.0
                   - CAST(s.s_det AS DOUBLE) / (s.n_d * 700.0)) AS resid
        FROM det JOIN seas s ON s.dow = det.dow)
    SELECT d AS day, CAST(dow AS BIGINT) AS dow, ROUND(resid, 6) AS resid
    FROM r ORDER BY resid DESC, d LIMIT 10
    """,
)
def q_ts_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly ranking: the 10 days whose
    detrended revenue deviates most from their day-of-week's seasonal
    index — outliers AFTER removing both trend (centered 7-day MA) and
    weekly seasonality, so a busy-but-normal Saturday doesn't alert.
    Detrended values stay exact integers until the final residual,
    which both engines derive from identical bigints; ties break on
    the day.

    Scale: fact → day grain map-side; the MA window and the dow join
    run over the ~2.4k-day dimension; top-10 is
    TakeOrderedAndProject. The decomposition itself is
    q_ts_decompose; this is its anomaly-detection consumer."""
    o = load_table(spark, sf_dir, "orders")
    day_rev = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = day_rev.select(
        "d",
        "rev_c",
        F.sum("rev_c").over(w7).alias("t7_c"),
        F.count("*").over(w7).alias("n7"),
    )
    det = tr.filter(F.col("n7") == 7).select(
        "d",
        (F.weekday("d") + 1).cast("long").alias("dow"),
        (7 * F.col("rev_c") - F.col("t7_c")).alias("det7"),
    )
    seas = det.groupBy("dow").agg(
        F.sum("det7").alias("s_det"), F.count("*").alias("n_d")
    )
    r = det.join(F.broadcast(seas), "dow").select(
        "d",
        "dow",
        F.abs(
            F.col("det7").cast("double") / 700.0
            - F.col("s_det").cast("double") / (F.col("n_d") * 700.0)
        ).alias("resid_raw"),
    )
    return (
        r.orderBy(F.col("resid_raw").desc(), "d")
        .limit(10)
        .select(
            F.col("d").alias("day"),
            "dow",
            F.round(F.col("resid_raw"), 6).alias("resid"),
        )
    )


@register(
    "q_join_repeat_purchase",
    oracle="""
    WITH seq AS (
        SELECT c.c_nationkey AS nk, o.o_custkey,
               DATE_DIFF('day',
                   LAG(CAST(o.o_orderdate AS DATE)) OVER
                       (PARTITION BY o.o_custkey
                        ORDER BY o.o_orderdate, o.o_orderkey),
                   CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT nk AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_repeat_orders,
           CAST(SUM(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS within_30d,
           ROUND(SUM(gap_days) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_gap_days
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY nk
    """,
)
def q_join_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase analysis: per nation, how many orders are
    repeats (the customer ordered before), how many arrive within 30
    days of the previous order, and the average inter-order gap —
    from a customer-keyed LAG over (date, orderkey)-ordered history
    (the orderkey tie-break pins equal-date orders). Gap days are
    exact integers.

    Scale: the window is keyed by customer (bounded partitions; no
    global sort), the dimension join broadcasts, and the final
    aggregate is 25 rows — the retention-economics query at any
    fact size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nk"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    )
    return (
        seq.filter(F.col("gap_days").isNotNull())
        .groupBy(F.col("nk").alias("c_nationkey"))
        .agg(
            F.count("*").alias("n_repeat_orders"),
            F.sum(F.when(F.col("gap_days") <= 30, 1).otherwise(0)).alias(
                "within_30d"
            ),
            F.round(
                F.sum("gap_days") / F.count("*").cast("double"), 6
            ).alias("avg_gap_days"),
        )
    )


@register(
    "q_ml_hash_collisions",
    oracle="""
    WITH v AS (
        SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE t.tok <> '' GROUP BY t.tok),
    b AS (
        SELECT (hash_k * 2654435761) % 4294967296 % 1024 AS bucket,
               freq
        FROM (SELECT freq,
                     CAST(LENGTH(tok) AS BIGINT) * 131
                     + CAST(ASCII(tok) AS BIGINT) * 7
                     + CAST(ASCII(REVERSE(tok)) AS BIGINT) AS hash_k
              FROM v)),
    s AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_terms,
               SUM(freq) AS mass
        FROM b GROUP BY bucket)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(CASE WHEN n_terms > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_colliding_buckets,
           CAST(SUM(CASE WHEN n_terms > 1 THEN n_terms ELSE 0 END) AS BIGINT)
               AS n_colliding_terms,
           CAST(MAX(n_terms) AS BIGINT) AS worst_bucket_terms,
           ROUND(SUM(CASE WHEN n_terms > 1 THEN mass ELSE 0 END)
                 / CAST(SUM(mass) AS DOUBLE), 6) AS colliding_mass_share
    FROM s
    """,
)
def q_ml_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing collision audit: bucket the corpus vocabulary
    into 1024 hashed features with a portable arithmetic hash (length,
    first/last char codes through a Knuth multiplier — chosen because
    engine-native string hashes are not cross-engine comparable) and
    report how many buckets collide, the worst bucket, and the share
    of token MASS sitting in collided buckets — the statistic that
    decides whether q_ml_hashing_tf's dimensionality is safe or
    quietly merging frequent features.

    Scale: vocabulary-grain arithmetic after a map-side-combining
    wordcount; the audit aggregate is 1024 rows. The deliberately
    weak-but-portable hash makes the collision structure itself
    exactly oracle-checkable; production would use the engine hash
    and accept rows-only checks."""
    d = load_table(spark, sf_dir, "documents")
    v = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    hash_k = (
        F.length("tok").cast("long") * 131
        + F.ascii("tok").cast("long") * 7
        + F.ascii(F.reverse(F.col("tok"))).cast("long")
    )
    b = v.select(
        ((hash_k * 2654435761) % 4294967296 % 1024).alias("bucket"), "freq"
    )
    s = b.groupBy("bucket").agg(
        F.count("*").alias("n_terms"), F.sum("freq").alias("mass")
    )
    colliding = F.when(F.col("n_terms") > 1, F.col("mass")).otherwise(F.lit(0))
    return s.agg(
        F.count("*").alias("n_buckets_used"),
        F.sum(F.when(F.col("n_terms") > 1, 1).otherwise(0)).alias(
            "n_colliding_buckets"
        ),
        F.sum(
            F.when(F.col("n_terms") > 1, F.col("n_terms")).otherwise(0)
        ).alias("n_colliding_terms"),
        F.max("n_terms").alias("worst_bucket_terms"),
        F.round(
            F.sum(colliding) / F.sum("mass").cast("double"), 6
        ).alias("colliding_mass_share"),
    )
