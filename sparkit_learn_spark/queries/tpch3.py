"""TPC-H wave 3 (round 6): the six remaining composites — Q2, Q9,
Q11, Q16, Q20, Q21 — adapted to the fixture schema (no partsupp
table: the lineitem (l_partkey, l_suppkey) pairs play its role, unit
cost = min(l_extendedprice / l_quantity); no l_receiptdate: lateness
is l_shipdate > o_orderdate + 60 days). Shapes preserved: Q2's
correlated-min, Q11's aggregate-vs-global-share HAVING (computed in
exact integer cents — a float ratio could flip at the last ulp),
Q16's distinct-count with NOT IN exclusion, Q20's nested-IN
reduction, Q21's EXISTS / NOT EXISTS self-join on the fact table.
This completes all 22 TPC-H query shapes in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _unit_cost(li: DataFrame) -> DataFrame:
    """lineitem-derived partsupp stand-in: min unit price per
    (partkey, suppkey). The division is computed identically (IEEE
    double) in both engines, so MIN and equality joins on it are
    bit-safe."""
    return (
        li.groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )


@register(
    "q_tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    mins AS (SELECT pk, MIN(cost) AS mc FROM cost GROUP BY pk)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           ROUND(c.cost, 6) AS supplycost
    FROM part p
    JOIN cost c   ON c.pk = p.p_partkey
    JOIN mins m   ON m.pk = c.pk AND c.cost = m.mc
    JOIN supplier s ON s.s_suppkey = c.sk
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: the correlated MIN subquery
    decorrelated into a per-part min join (cost = mins shape). Dims
    broadcast; the only fact-sized work is the (part, supp) cost
    aggregation. Ties at the min emit every tying supplier (set
    semantics, deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = _unit_cost(li)
    mins = cost.groupBy("pk").agg(F.min("cost").alias("mc"))
    # p_size <= 15 (not the TPC-H = 25): the fixture has NO size-25
    # STANDARD part below sf0.1, and even at sf0.01 the 2 such parts'
    # min-cost suppliers are non-European — the r6 query was 0 rows at
    # the driver's SF (caught by the r7 non-degeneracy gate). <=15
    # keeps the shape and yields 7/19/188 rows across the SFs.
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        cost.join(mins, (cost.pk == mins.pk) & (cost.cost == mins.mc))
        .drop(mins.pk)
        .join(F.broadcast(p), F.col("pk") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.round("cost", 6).alias("supplycost"))
    )


@register(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * l.l_quantity * p.p_retailprice), 4) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%blue%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit by nation and year (supply cost stood in
    by 0.5·retailprice). Parts/suppliers/nations broadcast; orders is
    the one fact-fact shuffle. The part-name filter prunes the fact
    rows straight after its broadcast join — before the expensive
    orders shuffle. Fixture part names are '<color> <noun>' with
    colors {small,hot,red,blue,large,old,cold,new} — '%green%'
    matched nothing (r6 vacuous-oracle defect); '%blue%' selects
    ~255/2000 parts at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("l_quantity") * F.col("p_retailprice")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_19'
      GROUP BY 1
    )
    SELECT pk AS p_partkey,
           ROUND(cents / 100.0, 2) AS value
    FROM v WHERE cents * 10000 > (SELECT SUM(cents) FROM v)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-part value exceeding a global-share
    threshold. The value and the threshold comparison run in EXACT
    INTEGER CENTS (cents·10⁴ > Σcents) — a float share comparison
    could flip for a part within one ulp of the cutoff, the r4
    q_agg_corr failure class. The global total is a broadcast scalar
    (one-row cross join), never a driver round-trip. NATION_19 is the
    fixture nation with suppliers at every SF (the original GERMANY
    literal selected nothing — r6 vacuous-oracle defect)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    v = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(cents).alias("cents"))
    )
    total = v.agg(F.sum("cents").alias("t"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("cents") * 10000 > F.col("t"))
        .select(F.col("pk").alias("p_partkey"),
                F.round(F.col("cents") / 100.0, 2).alias("value"))
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier count by part attributes, excluding complained-
    about suppliers (negative balance stands in for the comment
    filter). The NOT IN is an anti join against a tiny broadcast
    list; the distinct count is the only shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    heavy AS (
      SELECT l_suppkey
      FROM lineitem JOIN red_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey
      HAVING CAST(SUM(l_quantity) AS BIGINT) > 100
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN heavy h  ON h.l_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_19'
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 excess-stock suppliers: the double-nested IN reduced to a
    semi-join chain — red parts (broadcast) restrict lineitem, the
    quantity HAVING (exact integer sum) picks heavy suppliers, and
    suppliers semi-join that set. No subquery re-execution anywhere.
    NATION_19 has heavy red-part suppliers at every fixture SF (the
    original FRANCE literal selected nothing — r6 vacuous-oracle
    defect)."""
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select(F.col("p_partkey").alias("l_partkey"))
    heavy = (
        li.join(F.broadcast(red), "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("q"))
        .filter(F.col("q") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    return (
        s.join(heavy, "s_suppkey", "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "q_tpch_q21",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    per AS (
      SELECT l_orderkey, l_suppkey, MAX(late) AS late
      FROM li GROUP BY 1, 2
    ),
    stats AS (
      SELECT l_orderkey,
             COUNT(*)        AS n_supps,
             SUM(late)       AS n_late
      FROM per GROUP BY 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per p
    JOIN stats t ON t.l_orderkey = p.l_orderkey
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    WHERE p.late = 1 AND t.n_supps > 1 AND t.n_late = 1
    GROUP BY 1
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept multi-supplier orders waiting (lateness
    = shipped >60 days after order; no receipt/commit dates in the
    fixture). The EXISTS (another supplier on the order) and NOT
    EXISTS (no OTHER late supplier) pair is rewritten as ONE
    per-order aggregation (supplier count + late count) joined back —
    two shuffles total on the order key, versus the naive triple
    self-join of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 60)
        .cast("timestamp"), 1
    ).otherwise(0)
    per = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    stats = per.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count("*").alias("n_supps"), F.sum("late").alias("n_late")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per.join(stats, per.l_orderkey == stats.ok)
        .filter((F.col("late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
