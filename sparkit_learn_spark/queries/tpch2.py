"""TPC-H-style composites, part 2 (Q4/Q6/Q8/Q13/Q14/Q15/Q17/Q19/Q22)
— adapted to the fixture schema where the spec needs columns the
fixture lacks (no l_commitdate/l_receiptdate/l_shipmode, no
p_container, no c_phone, no partsupp; nations are NATION_0..24).
Each adaptation keeps the query's defining SHAPE (the operator
composition the planner must get right), swapping only the filter
columns. All exactly DuckDB-oracled.

Determinism notes (cross-engine FP): thresholds derived from
aggregates are computed in integer space where the comparison could
flip on a last-ulp difference (Q22 balance cents; Q17 relies on
integral l_quantity so the group sums are exact in double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Q4 window + lateness threshold (days from order to first late ship).
Q4_LO, Q4_HI = "1996-01-01", "1996-07-01"
Q4_LATE_DAYS = 60

#: Q6 parameters: shipdate year, discount band, quantity cap.
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_MAX_QTY = 24

#: Q8 parameters: market region, the nation whose share we track,
#: the part type, and the two-year order window.
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_5"
Q8_TYPE = "ECONOMY"
Q8_LO, Q8_HI = "1996-01-01", "1997-12-31"

#: Q14 window: one month of shipments.
Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"

#: Q15 window: one quarter of shipments.
Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"

#: Q17 brand + the below-fraction-of-average-quantity threshold.
Q17_BRAND = "Brand#13"
Q17_FRACTION = 0.2

#: Q22 adaptation: "inactive" = no order on/after this date.
Q22_INACTIVE_SINCE = "2000-01-01"


@register(
    "q_tpch_q4",
    oracle=f"""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO}'
      AND o.o_orderdate <  TIMESTAMP '{Q4_HI}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND date_diff('day', o.o_orderdate, l.l_shipdate)
              > {Q4_LATE_DAYS}
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: count orders per
    priority that had at least one lineitem shipped more than
    {Q4_LATE_DAYS} days late (spec uses commitdate<receiptdate; the
    fixture has neither, so lateness is ship-vs-order). The defining
    shape — correlated EXISTS decorrelated to a semi join whose
    condition spans both tables — is intact.

    Scale: the date filter prunes orders at the scan; the semi join
    shuffles both sides on orderkey but emits each order AT MOST once
    (no lineitem fan-out reaches the aggregate), so the post-join agg
    input is bounded by |orders in window|."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    late = (o.o_orderkey == li.l_orderkey) & (
        F.datediff(li.l_shipdate, o.o_orderdate) > Q4_LATE_DAYS)
    return (
        o.join(li, late, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_q6",
    oracle=f"""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
      AND l_shipdate <  TIMESTAMP '{Q6_HI}'
      AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
      AND l_quantity < {Q6_MAX_QTY}
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-
    aggregate query — revenue that would vanish if discounts in a
    band were dropped. No join, no groupBy key.

    Scale: ALL three predicates reach the parquet scan (shipdate,
    discount band, quantity — verified PushedFilters); the global sum
    is a partial aggregate per partition + a 1-row final merge, so
    the shuffle carries one row per task regardless of data size.
    This is the query where scan throughput IS the query — at 100 TB
    it is bandwidth-bound and embarrassingly parallel."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp_ntz"))
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_MAX_QTY)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
        .alias("revenue")
    )


@register(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = '{Q8_NATION}' THEN volume
                          ELSE 0 END) / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
        AND o.o_orderdate BETWEEN TIMESTAMP '{Q8_LO}'
                              AND TIMESTAMP '{Q8_HI}'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of
    region-wide revenue for a part type, per order year — the 8-table
    join with nation in TWO roles (customer market region vs supplier
    nationality) and a conditional-share aggregate.

    Scale: part is filtered on type then broadcast-joined into
    lineitem FIRST — it is the most selective dim, so the fact rows
    die earliest; nation×2 and region broadcast (schema-bounded);
    supplier/customer stay shuffle joins (they scale with SF). The
    share is ONE aggregation pass (conditional numerator + full
    denominator fold into the same hash agg — no second scan)."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == Q8_TYPE).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit(Q8_HI).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION)
    # customer-side nation restricted to the region BEFORE broadcast
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nk1"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"),
                  F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("nation") == Q8_NATION, vol)
                  .otherwise(F.lit(0.0)))
            / F.sum(vol), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by
    how many orders they placed — the double aggregate with a LEFT
    join so zero-order customers land in the c_count=0 bucket
    (COUNT(o_orderkey) skips the NULL of an unmatched left row).

    Scale: first agg shuffles on custkey (the join's own key, so with
    AQE the join output is already partitioned correctly — no second
    exchange between join and agg); second agg's input is one row per
    customer and its key space (distinct order counts) is tiny, so
    the final shuffle is negligible. The known hazard at 100 TB is
    order-count skew (a few mega-customers) — irrelevant here because
    the count itself is the aggregate, not a row expansion."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch_q14",
    oracle=f"""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
           AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
      AND l.l_shipdate <  TIMESTAMP '{Q14_HI}'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from PROMO-type parts (fixture p_type is the bare family name, so
    the spec's LIKE 'PROMO%%' is equality here — same shape, the
    conditional share over a dim-attribute join).

    Scale: the month filter reaches the lineitem scan; part broadcasts
    as a (partkey, is_promo) projection; numerator and denominator
    fold into one aggregation pass, final result is a single row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0.0)))
            / F.sum(rev), 4).alias("promo_revenue"))
    )


@register(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
        AND l_shipdate <  TIMESTAMP '{Q15_HI}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with the maximum
    quarterly revenue — an aggregate reused twice (per-supplier
    revenue AND its global max) with an aggregate-derived scalar
    filter. Revenue is rounded to 2dp BEFORE the max so the
    equality filter compares identical doubles in both engines.

    Scale: per-supplier revenue is one partial+final agg over the
    window-filtered fact; the global max is a 1-row aggregate of that
    (supplier-count-sized) result, cross-joined back as a broadcast
    scalar — the revenue relation is computed ONCE in the plan and
    the max never touches lineitem again. supplier joins the tiny
    winners set via broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp_ntz"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    winners = (
        revenue.join(F.broadcast(mx),
                     F.col("total_revenue") == F.col("mx"))
        .select("supplier_no", "total_revenue")
    )
    return (
        s.join(F.broadcast(winners), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q17",
    oracle=f"""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, {Q17_FRACTION} * AVG(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
      AND l.l_quantity < t.qty_thresh
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost if
    orders below {Q17_FRACTION}×average-quantity-for-the-part were
    dropped — the correlated scalar subquery (per-part average)
    decorrelated into a self-join against a per-key aggregate.
    Cross-engine determinism: l_quantity is integral in the fixture,
    so each per-part SUM is exact in double and AVG is identical in
    any summation order — the threshold comparison cannot flip on an
    engine's aggregation order.

    Scale: the per-part average is a partial+final agg over lineitem
    (one row per partkey out); the brand filter cuts part to ~1/20
    and broadcasts; the agg side shuffles on partkey to meet the
    fact rows. The spec's correlated form would rescan lineitem per
    row — the decorrelated form scans it exactly twice."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND).select("p_partkey")
    thresh = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(Q17_FRACTION) * F.avg("l_quantity"))
             .alias("qty_thresh"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresh, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
             .alias("avg_yearly"))
    )


#: Q19 disjunctive (brand, size-band, quantity-band) triples.
Q19_ARMS = (
    ("Brand#1", 1, 10, 1, 11),
    ("Brand#2", 10, 20, 10, 20),
    ("Brand#3", 20, 30, 20, 30),
)


@register(
    "q_tpch_q19",
    oracle=f"""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE
      (p.p_brand = '{Q19_ARMS[0][0]}'
        AND p.p_size BETWEEN {Q19_ARMS[0][1]} AND {Q19_ARMS[0][2]}
        AND l.l_quantity BETWEEN {Q19_ARMS[0][3]} AND {Q19_ARMS[0][4]})
      OR (p.p_brand = '{Q19_ARMS[1][0]}'
        AND p.p_size BETWEEN {Q19_ARMS[1][1]} AND {Q19_ARMS[1][2]}
        AND l.l_quantity BETWEEN {Q19_ARMS[1][3]} AND {Q19_ARMS[1][4]})
      OR (p.p_brand = '{Q19_ARMS[2][0]}'
        AND p.p_size BETWEEN {Q19_ARMS[2][1]} AND {Q19_ARMS[2][2]}
        AND l.l_quantity BETWEEN {Q19_ARMS[2][3]} AND {Q19_ARMS[2][4]})
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    join filter — three (brand, size-band, quantity-band) arms OR'd
    together, where each arm mixes columns from BOTH join sides
    (fixture has no p_container/l_shipmode; brand+size+quantity keep
    the cross-side disjunction that defines Q19).

    Scale: Catalyst extracts the single-side residues of the OR —
    part keeps only rows matching SOME brand+size arm, lineitem only
    rows in SOME quantity band — so both scans prune before the join
    and the full disjunction re-checks only joined survivors. The
    filtered part side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    arm = None
    for brand, slo, shi, qlo, qhi in Q19_ARMS:
        this = ((F.col("p_brand") == brand)
                & F.col("p_size").between(slo, shi)
                & F.col("l_quantity").between(qlo, qhi))
        arm = this if arm is None else (arm | this)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm)
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@register(
    "q_tpch_q22",
    oracle=f"""
    WITH thresh AS (
      SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS cents
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, thresh
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > thresh.cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_INACTIVE_SINCE}'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: rich-but-lapsed
    customers — balance above the positive-balance average AND no
    order since {Q22_INACTIVE_SINCE} — grouped by market segment
    (fixture has no c_phone, so segment replaces country code; every
    fixture customer has SOME order, so the spec's no-orders-ever
    anti join becomes no-RECENT-orders). The defining shape —
    aggregate-derived scalar threshold + anti join + group-agg —
    is intact. The threshold is compared in integer cents: AVG over
    exact bigints is order-independent, so the cut cannot flip on
    engine summation order (same hazard class as the r4 argmax fix).

    Scale: the threshold is a 1-row aggregate broadcast into the
    filter (no collect); the anti join shuffles customer against the
    date-filtered orders projection on custkey; the final agg has
    segment-many groups."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(cents).alias("cents"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        >= F.lit(Q22_INACTIVE_SINCE).cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(thresh))
        .filter(cents > F.col("cents"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )
