"""Join surface, wave 3 (round 6): skew-salted join, interval-overlap
join, MERGE-upsert semantics, SCD type-2 history build, and
snapshot diff — the remaining join-shaped patterns a warehouse
migration expects. All exactly DuckDB-oracled: the salted/optimized
variants must return byte-identical results to their naive SQL, which
is precisely what makes them safe to deploy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_SALTS = 8


@register(
    "q_join_skew_salted",
    oracle="""
    SELECT o.o_orderstatus,
           ROUND(SUM(l.l_extendedprice), 6) AS revenue,
           CAST(COUNT(*) AS BIGINT)         AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join, oracled against the UNSALTED join:
    the fact side gets a deterministic salt pmod(xxhash64(key), 8) and
    the build side explodes ×8, so one hot key's rows spread over 8
    shuffle partitions instead of one straggler task. The oracle
    proves salting is a pure physical rewrite — identical results.

    Scale: this is the manual fallback when AQE's skew-join split
    can't help (e.g. a skewed AGGREGATION key after the join, or a
    build side too large to split). Cost: build side replicated ×8 in
    the shuffle — chosen, bounded amplification."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(_SALTS)).alias("salt"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))).alias("salt"),
    )
    j = li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
    return j.groupBy("o_orderstatus").agg(
        F.round(F.sum("l_extendedprice"), 6).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q_join_interval_overlap",
    oracle="""
    WITH grid AS (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '2001-10-01',
                                    INTERVAL 3 MONTH))::DATE AS q_start
    ),
    iv AS (
      SELECT l_shipdate::DATE AS s,
             (l_shipdate + INTERVAL (l_linenumber * 7) DAY)::DATE AS e,
             l_quantity
      FROM lineitem
    )
    SELECT g.q_start,
           CAST(COUNT(*) AS BIGINT)               AS n_overlap,
           CAST(SUM(iv.l_quantity) AS BIGINT)     AS qty
    FROM grid g JOIN iv
      ON iv.s < g.q_start + INTERVAL 3 MONTH AND iv.e >= g.q_start
    GROUP BY g.q_start
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each lineitem's [ship, ship+7·linenumber
    days] interval joined to every calendar quarter it overlaps
    (half-open grid cells, closed intervals). The tiny quarter grid is
    generated with sequence() and BROADCAST — the fact side never
    shuffles; each fact row fans out only to the quarters it overlaps.

    Scale: broadcast-range join with bounded fan-out (an interval
    spans ≤ ceil(len/90d)+1 quarters). The anti-pattern is the
    pairwise theta join of two BIG interval sets — that needs
    bucketing by coarse time bin first (cf. q_join_theta_range)."""
    grid = spark.range(1).select(
        F.explode(F.sequence(
            F.lit("1995-01-01").cast("date"),
            F.lit("2001-10-01").cast("date"),
            F.expr("interval 3 months"),
        )).alias("q_start")
    )
    iv = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(F.col("l_shipdate").cast("date"),
                   (F.col("l_linenumber") * 7).cast("int")).alias("e"),
        "l_quantity",
    )
    j = iv.join(
        F.broadcast(grid),
        (F.col("s") < F.add_months("q_start", 3)) & (F.col("e") >= F.col("q_start")),
    )
    return j.groupBy("q_start").agg(
        F.count("*").alias("n_overlap"),
        F.sum("l_quantity").cast("long").alias("qty"),
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0
    ),
    source AS (
      SELECT o_custkey AS c_custkey,
             SUM(o_totalprice) AS delta,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           ROUND(COALESCE(t.c_acctbal, 0) + COALESCE(s.delta, 0), 6)
             AS new_balance,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN s.c_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM target t FULL OUTER JOIN source s USING (c_custkey)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a pure DataFrame rewrite — the upsert
    every incremental pipeline needs, without a table format: target
    (even-keyed customers) merged with source (recent order totals);
    WHEN MATCHED -> balance += delta, WHEN NOT MATCHED BY TARGET ->
    insert, WHEN NOT MATCHED BY SOURCE -> keep. One full-outer
    shuffle join on the merge key.

    Scale: this is exactly the copy-on-write MERGE a lakehouse format
    executes; at 100 TB partition the target by key range so only
    touched partitions rewrite (here: the join itself is the
    contract)."""
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_acctbal")
    source = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum("o_totalprice").alias("delta"),
             F.count("*").alias("n_orders"))
    )
    t, s = target.alias("t"), source.alias("s")
    return (
        t.join(s, "c_custkey", "full_outer")
        .select(
            "c_custkey",
            F.round(
                F.coalesce(F.col("c_acctbal"), F.lit(0.0))
                + F.coalesce(F.col("delta"), F.lit(0.0)), 6
            ).alias("new_balance"),
            F.when(F.col("t.c_acctbal").isNull(), "insert")
             .when(F.col("s.delta").isNull(), "keep")
             .otherwise("update").alias("action"),
        )
    )


@register(
    "q_scd2_history",
    oracle="""
    SELECT o_custkey,
           o_orderpriority AS attr,
           o_orderdate     AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER w IS NULL
                THEN 1 ELSE 0 END   AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each customer's order
    stream becomes validity intervals [valid_from, valid_to) with the
    open current row flagged — ONE window pass (lead over the change
    key), no self-join. Tie-break includes the unique o_orderkey so
    same-day changes order deterministically.

    Scale: one shuffle on the dimension key; state per key is one
    row of lookahead. The self-join formulation (t1 ⋈ t2 ON t2.date >
    t1.date) is O(n²) per key and never acceptable."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.when(F.lead("o_orderdate").over(w).isNull(), 1)
         .otherwise(0).cast("int").alias("is_current"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey
    ),
    b AS (
      SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
      FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
      GROUP BY l_orderkey
    )
    SELECT CASE WHEN a.l_orderkey IS NULL THEN 'insert'
                WHEN a.qty <> b.qty THEN 'update'
                ELSE 'same' END AS change,
           CAST(COUNT(*) AS BIGINT)                    AS n_orders,
           CAST(SUM(b.qty - COALESCE(a.qty, 0)) AS BIGINT) AS qty_delta
    FROM b LEFT JOIN a USING (l_orderkey)
    GROUP BY 1
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC classification: the per-order quantity
    state at two ship-date cutoffs, outer-joined on the key and
    classified insert / update / same (b ⊇ a here, so no deletes —
    the left join direction encodes that). The single-scan trick:
    BOTH snapshots come from one read via conditional aggregation,
    not two scans of the fact table.

    Scale: one scan + one shuffle on the key; the join disappears
    entirely (the conditional agg computes both snapshots per key),
    which is the honest 100 TB form of a snapshot diff when snapshots
    are filters of one table."""
    li = load_table(spark, sf_dir, "lineitem")
    cut_a = F.lit("1998-01-01").cast("timestamp")
    cut_b = F.lit("2000-01-01").cast("timestamp")
    per_key = (
        li.filter(F.col("l_shipdate") < cut_b)
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < cut_a, F.col("l_quantity"))
                  ).cast("long").alias("qty_a"),
            F.sum("l_quantity").cast("long").alias("qty_b"),
        )
    )
    return (
        per_key.select(
            F.when(F.col("qty_a").isNull(), "insert")
             .when(F.col("qty_a") != F.col("qty_b"), "update")
             .otherwise("same").alias("change"),
            "qty_a", "qty_b",
        )
        .groupBy("change")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("qty_b") - F.coalesce(F.col("qty_a"), F.lit(0)))
             .cast("long").alias("qty_delta"),
        )
    )
