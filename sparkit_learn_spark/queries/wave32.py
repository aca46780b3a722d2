"""Round-6 wave 32: recursive-CTE hierarchy traversal (Spark 4 WITH
RECURSIVE), MATCH_RECOGNIZE-style row-pattern detection (V-shape
decline/recovery runs via sign islands), and largest-remainder budget
proration with exact penny reconciliation. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_sql_recursive",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT p_partkey AS part, p_partkey AS cur,
               0 AS depth, CAST(p_partkey AS BIGINT) AS path_sum
        FROM part
        UNION ALL
        SELECT part, cur // 7, depth + 1, path_sum + (cur // 7)
        FROM walk WHERE cur > 0)
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(path_sum) AS BIGINT) AS sum_path
    FROM walk WHERE cur = 0
    GROUP BY depth
    """,
)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): every part walks its
    synthetic containment hierarchy parent(k) = k div 7 up to the
    root, accumulating depth and the ancestor-key path sum — the BOM
    explosion / org-chart rollup shape — then terminal rows aggregate
    to a depth histogram. Identical recursive SQL runs on both
    engines; this is the iterate-until-empty fixpoint the engine
    executes as repeated joins.

    Scale: each recursion level is one narrow projection of the
    previous level's frontier (no joins here; a parent-table walk
    would be one broadcast join per level), levels are logarithmic in
    the key space, and the frontier never grows — the same plan
    profile as label-propagation connected components."""
    # accumulated CTE rows = n_parts × depth (linear, ~7 levels);
    # Spark's default 1e6-row recursion guardrail trips at sf≥1, so
    # raise it to the linear bound this walk actually needs.
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(200_000_000))
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_rec_v")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT p_partkey AS part, p_partkey AS cur,
                   0 AS depth, CAST(p_partkey AS BIGINT) AS path_sum
            FROM part_rec_v
            UNION ALL
            SELECT part, cur div 7, depth + 1, path_sum + (cur div 7)
            FROM walk WHERE cur > 0)
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(path_sum) AS BIGINT) AS sum_path
        FROM walk WHERE cur = 0
        GROUP BY depth
        """
    )


@register(
    "q_win_pattern_vshape",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY o_orderdate),
    diffed AS (
        SELECT d, rev,
               rev - LAG(rev) OVER (ORDER BY d) AS diff
        FROM day),
    signed AS (
        SELECT d, diff, SIGN(diff) AS s,
               ROW_NUMBER() OVER (ORDER BY d)
                 - ROW_NUMBER() OVER (PARTITION BY SIGN(diff)
                                      ORDER BY d) AS isl
        FROM diffed WHERE diff IS NOT NULL),
    islands AS (
        SELECT s, isl, MIN(d) AS start_d, MAX(d) AS end_d,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(SUM(diff) AS BIGINT) AS total
        FROM signed GROUP BY s, isl),
    seq AS (
        SELECT s, start_d, end_d, len, total,
               LEAD(s)     OVER (ORDER BY start_d) AS next_s,
               LEAD(len)   OVER (ORDER BY start_d) AS next_len,
               LEAD(total) OVER (ORDER BY start_d) AS next_total
        FROM islands)
    SELECT start_d AS decline_start, end_d AS decline_end,
           len AS decline_days, -total AS depth_cents,
           next_len AS recovery_days, next_total AS recovery_cents
    FROM seq
    WHERE s = -1 AND len >= 2 AND next_s = 1
    """,
)
def q_win_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern recognition (MATCH_RECOGNIZE emulation): find every
    V-shape in the daily-revenue series — a maximal run of ≥2 strictly
    declining observed days immediately followed by a rising run —
    reporting decline span/depth and the recovery's length/height.
    Pattern = DOWN{2,} UP+ in MATCH_RECOGNIZE terms, compiled to
    Spark's window algebra: sign of day-over-day diff → run islands
    (row_number minus per-sign row_number) → island summary → LEAD
    adjacency. Revenue in exact cents; a flat day (diff = 0) breaks
    the pattern by forming its own island — strict V contract.

    Scale: everything after the first aggregate runs at DAY grain
    (series-sized, thousands of rows per century of data); the
    pattern automaton is two windows over that series, not a
    quadratic self-join — the standard distributed compilation of
    row-pattern queries."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    diffed = day.select(
        "d", (F.col("rev") - F.lag("rev").over(Window.orderBy("d"))).alias("diff")
    ).filter(F.col("diff").isNotNull())
    signed = diffed.select(
        "d",
        "diff",
        F.signum("diff").cast("int").alias("s"),
    ).select(
        "*",
        (
            F.row_number().over(Window.orderBy("d"))
            - F.row_number().over(Window.partitionBy("s").orderBy("d"))
        ).alias("isl"),
    )
    islands = signed.groupBy("s", "isl").agg(
        F.min("d").alias("start_d"),
        F.max("d").alias("end_d"),
        F.count("*").alias("len"),
        F.sum("diff").alias("total"),
    )
    wseq = Window.orderBy("start_d")
    seq = islands.select(
        "*",
        F.lead("s").over(wseq).alias("next_s"),
        F.lead("len").over(wseq).alias("next_len"),
        F.lead("total").over(wseq).alias("next_total"),
    )
    return seq.filter(
        (F.col("s") == -1) & (F.col("len") >= 2) & (F.col("next_s") == 1)
    ).select(
        F.col("start_d").alias("decline_start"),
        F.col("end_d").alias("decline_end"),
        F.col("len").alias("decline_days"),
        (-F.col("total")).alias("depth_cents"),
        F.col("next_len").alias("recovery_days"),
        F.col("next_total").alias("recovery_cents"),
    )


@register(
    "q_fin_proration",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
    nat AS (
        SELECT nation, CAST(SUM(cents) AS BIGINT) AS nat_cents
        FROM cust GROUP BY nation),
    alloc AS (
        SELECT cu.nation, cu.cust,
               CAST((1000000 * CAST(cu.cents AS HUGEINT))
                    // na.nat_cents AS BIGINT) AS base,
               CAST((1000000 * CAST(cu.cents AS HUGEINT))
                    % na.nat_cents AS BIGINT) AS frac
        FROM cust cu JOIN nat na USING (nation)),
    rem AS (
        SELECT nation,
               CAST(1000000 - SUM(base) AS BIGINT) AS n_bump
        FROM alloc GROUP BY nation),
    final AS (
        SELECT a.nation,
               a.base + CASE WHEN ROW_NUMBER() OVER (
                                PARTITION BY a.nation
                                ORDER BY a.frac DESC, a.cust)
                             <= r.n_bump
                        THEN 1 ELSE 0 END AS alloc
        FROM alloc a JOIN rem r USING (nation))
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(alloc) AS BIGINT) AS sum_alloc,
           CAST(MIN(alloc) AS BIGINT) AS min_alloc,
           CAST(MAX(alloc) AS BIGINT) AS max_alloc
    FROM final GROUP BY nation
    """,
)
def q_fin_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: a fixed 1,000,000-unit budget per
    nation allocated to its customers proportional to exact order
    revenue, with floor division and the leftover units granted to the
    largest fractional remainders (revenue-cent remainder rank, id
    tie-break) — the allocation rule that makes prorated pennies SUM
    EXACTLY to the budget (sum_alloc ≡ 1,000,000 per nation, asserted
    by the oracle compare). Pure integer arithmetic end to end; the
    128-bit intermediate (budget × cents) avoids overflow in both
    engines (HUGEINT / DECIMAL(38,0)).

    Scale: revenue rolls up customer-grain first (map-side combine),
    nation totals broadcast back, and the remainder rank is a
    per-nation window over customer grain — no fact-grain windows, no
    driver arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    nat = cust.groupBy("nation").agg(F.sum("cents").alias("nat_cents"))
    # 1e6 × per-customer cents stays far under 2^63, so the base/frac
    # split is pure BIGINT floor-division — no decimal quotient whose
    # engine-specific rounding could flip a floor at the boundary.
    alloc = cust.join(F.broadcast(nat), "nation").select(
        "nation",
        "cust",
        F.expr("(1000000 * cents) div nat_cents").alias("base"),
        F.expr("(1000000 * cents) % nat_cents").alias("frac"),
    )
    rem = alloc.groupBy("nation").agg(
        (F.lit(1000000) - F.sum("base")).alias("n_bump")
    )
    wr = Window.partitionBy("nation").orderBy(F.col("frac").desc(), "cust")
    final = (
        alloc.join(F.broadcast(rem), "nation")
        .select(
            "nation",
            (
                F.col("base")
                + F.when(
                    F.row_number().over(wr) <= F.col("n_bump"), 1
                ).otherwise(0)
            ).alias("alloc"),
        )
    )
    return final.groupBy(F.col("nation").cast("long").alias("nation")).agg(
        F.count("*").alias("n_custs"),
        F.sum("alloc").alias("sum_alloc"),
        F.min("alloc").alias("min_alloc"),
        F.max("alloc").alias("max_alloc"),
    )
