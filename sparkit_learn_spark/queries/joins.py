"""Join operators (SURVEY.md §2B — q_join_*).

Join strategy at scale (SURVEY §4.2): dimension tables (region,
nation) are explicitly ``broadcast()`` — no shuffle of the fact side;
fact-fact joins shuffle on the join key and AQE picks sort-merge vs
shuffled-hash and splits skewed partitions at runtime. The as-of join
is implemented union-style (single shuffle on user, no candidate-pair
explosion) rather than pairwise — the O(n·m) window form would not
survive 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: dim ⋈ dim — the region side ships to every
    executor; zero shuffle of the probe side."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner"
    ).select("n_nationkey", "n_name", "r_name")


@register(
    "q_join_shuffle",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber,
           ROUND(l.l_extendedprice * (1 - l.l_discount), 6) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large equi join: both sides exchange on orderkey; AQE selects
    the physical strategy (and may demote to broadcast at small SF)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "inner").select(
        "o_orderkey",
        "o_orderdate",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
    )


@register(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table chain: local-supplier revenue by nation.

    Fact tables shuffle on their FK chain; nation/region broadcast;
    the date filter is pushed to the orders scan. Catalyst is free to
    reorder the chain (CBO/AQE) since it's declared, not scheduled.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — customers without 'P' orders keep NULL sides."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "P")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_full",
    oracle="""
    WITH big AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big
      FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey
    ),
    neg AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS bal
      FROM customer WHERE c_acctbal < 0
    )
    SELECT neg.c_custkey, neg.bal, big.o_custkey, big.n_big
    FROM neg FULL OUTER JOIN big ON neg.c_custkey = big.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two partially-overlapping keyed sets."""
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    neg = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey", F.round("c_acctbal", 6).alias("bal"))
    )
    return neg.join(big, neg.c_custkey == big.o_custkey, "full").select(
        "c_custkey", "bal", "o_custkey", "n_big"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 'F' order (no duplication —
    the probe row emits at most once)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no 2001 orders (churn-candidate
    list). The unrestricted "no orders at all" variant was empty below
    sf0.1 — every fixture customer buys eventually — so the driver's
    sf0.01 oracle check was trivially green; the recency window keeps
    the anti-join value-exercised at every SF (65/615/6156 rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of a tiny dimension with itself (ordered pairs)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("ak") != F.col("bk")).select(
        "from_region", "to_region"
    )


@register(
    "q_join_theta_range",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >  o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join anchored on an equi key: ship within 90 days
    of order. Because an equi conjunct exists, this stays a hash/SMJ
    join with the range as a post-probe filter — NOT a cartesian; it
    scales like the plain equi join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAY"))
    )
    return li.join(o, cond, "inner").select(
        "l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"
    )


@register(
    "q_join_asof",
    oracle="""
    SELECT event_id, user_id, ts AS purchase_ts, last_click_ts
    FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events
    ) WHERE event_type = 'purchase'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, union-style: for each purchase, the user's most
    recent strictly-prior click.

    Implementation deliberately avoids the pairwise purchase×click
    join (candidate explosion, O(P·C) per user). Instead both event
    kinds flow through ONE window sorted by (user, ts): last(click_ts,
    ignoreNulls) over rows [unbounded, -1]. One shuffle on user_id,
    linear state — survives 100×. Cf. ASOF JOIN in DuckDB/kdb.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "last_click_ts")
    )


@register(
    "q_join_bucketed",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT)      AS n_orders,
           ROUND(SUM(o.o_totalprice), 6) AS sum_price
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE fact join via bucketed tables: customer and orders
    are written once bucketed (and sorted) on custkey with the same
    bucket count, then joined and aggregated — the sort-merge join
    reads co-located buckets with ZERO Exchange on either side, and
    the per-customer aggregate inherits the bucket partitioning and
    skips its shuffle too (asserted in tests/test_plans.py).

    This is the 100 TB strategy for repeated fact-fact joins: the
    write-side shuffle is paid once and amortized across every
    subsequent run; on a cluster the same plan reads co-located HDFS/
    object-store buckets. The one-time bucketed write happens inline
    here so the operator is self-contained and idempotent.
    """
    import re

    from ..operators.bucketing import read_bucketed, write_bucketed

    # Per-scale-factor table names: write_bucketed mutates catalog
    # state (DROP + overwrite), so namespacing keeps runs at different
    # sf_dirs from clobbering each other's buckets.
    ns = re.sub(r"\W", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1]).lower()
    tc, to = f"bkt_customer_{ns}", f"bkt_orders_{ns}"
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(c, tc, ["c_custkey"], n_buckets=8, sort_by=["c_custkey"])
    write_bucketed(o, to, ["o_custkey"], n_buckets=8, sort_by=["o_custkey"])
    bc, bo = read_bucketed(spark, tc), read_bucketed(spark, to)
    return (
        bc.hint("merge")  # force SMJ: broadcast would mask the bucket-join proof
        .join(bo, bc.c_custkey == bo.o_custkey, "inner")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
        )
    )


@register(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
      SELECT NULLIF(lang, 'de') AS k, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    b AS (
      SELECT NULLIF(lang, 'de') AS k, CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1
    )
    SELECT a.k, a.n_docs, b.chars
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics a plain
    equi join silently loses. Keys are derived with NULLIF so the
    fixture genuinely exercises the NULL bucket.

    Scale: <=> is still hash-joinable (NULL hashes to one bucket), so
    the plan stays a shuffled hash join — but that SAME property makes
    a null-heavy key the canonical skew case: at 100 TB, pre-filter or
    salt the NULL bucket if it dominates."""
    d = load_table(spark, sf_dir, "documents")
    key = F.nullif(F.col("lang"), F.lit("de"))
    a = d.groupBy(key.alias("k")).agg(F.count("*").alias("n_docs"))
    b = d.groupBy(key.alias("kb")).agg(
        F.sum("n_chars").cast("long").alias("chars"))
    return (
        a.join(b, a["k"].eqNullSafe(b["kb"]))
        .select("k", "n_docs", "chars")
    )
