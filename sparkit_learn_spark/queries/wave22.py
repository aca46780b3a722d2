"""Round-6 wave 22: gaps-and-islands over integer key sequences (the
value-minus-rank idiom) and a nearest-value join (1D nearest-neighbor
via the union-sort-window rewrite of a cross-table |a−b| argmin).
Both exactly DuckDB-oracled in integer space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_id_islands",
    oracle="""
    WITH k AS (SELECT DISTINCT o_orderkey AS okey FROM orders),
    g AS (
        SELECT okey,
               okey - ROW_NUMBER() OVER (ORDER BY okey) AS grp
        FROM k),
    i AS (
        SELECT MIN(okey) AS island_start, MAX(okey) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS island_len
        FROM g GROUP BY grp)
    SELECT island_start, island_end, island_len
    FROM i ORDER BY island_len DESC, island_start LIMIT 10
    """,
)
def q_agg_id_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the order-key sequence: contiguous runs
    of present keys found with the value-minus-rank idiom (consecutive
    keys share `key − row_number()`), reporting the 10 longest islands
    — the id-census query that audits allocation patterns and finds
    deletion scars (TPC-H keys are deliberately sparse, so the island
    structure is non-trivial). Pure integer arithmetic; ties break on
    the island start.

    Scale: the global rank is the one inherently ordered step — at
    100 TB run it range-partitioned (sort within key ranges, then
    merge islands that touch partition boundaries, a 2-row-per-
    partition fixup); the island aggregate and top-10
    (TakeOrderedAndProject) are ordinary distributed ops."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    g = o.select(
        F.col("o_orderkey").alias("okey"),
        (F.col("o_orderkey") - F.row_number().over(Window.orderBy("o_orderkey"))).alias(
            "grp"
        ),
    )
    i = g.groupBy("grp").agg(
        F.min("okey").alias("island_start"),
        F.max("okey").alias("island_end"),
        F.count("*").alias("island_len"),
    )
    return (
        i.select("island_start", "island_end", "island_len")
        .orderBy(F.col("island_len").desc(), "island_start")
        .limit(10)
    )


@register(
    "q_join_nearest_value",
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders WHERE o_orderkey % 1000 = 0),
    p AS (
        SELECT DISTINCT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS pv
        FROM part),
    u AS (
        SELECT pv AS val, 0 AS is_probe, pv AS pv_val,
               CAST(NULL AS BIGINT) AS okey
        FROM p
        UNION ALL
        SELECT v, 1, CAST(NULL AS BIGINT), o_orderkey FROM o),
    w AS (
        SELECT okey, val, is_probe,
               MAX(CASE WHEN is_probe = 0 THEN pv_val END) OVER
                   (ORDER BY val, is_probe
                    ROWS UNBOUNDED PRECEDING) AS below,
               MIN(CASE WHEN is_probe = 0 THEN pv_val END) OVER
                   (ORDER BY val, is_probe
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS above
        FROM u),
    m AS (
        SELECT okey, val,
               CASE WHEN below IS NULL THEN above
                    WHEN above IS NULL THEN below
                    WHEN val - below <= above - val THEN below
                    ELSE above END AS nearest
        FROM w WHERE is_probe = 1)
    SELECT okey AS o_orderkey, ROUND(val / 100.0, 2) AS order_price,
           ROUND(nearest / 100.0, 2) AS nearest_retail,
           ABS(val - nearest) AS dist_cents
    FROM m
    """,
)
def q_join_nearest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-value join: each probe order's total price matched to
    the CLOSEST part retail price — the 1D nearest-neighbor join —
    via the union-sort-window rewrite: tag both sides, sort once by
    value (reference rows before probes at equal values), take the
    running max of reference values (nearest below) and the reverse
    running min (nearest at-or-above), then pick the closer side
    (ties to the lower value). Exact integer cents throughout.

    Scale: this turns a cross-table |a−b| argmin — quadratic as a
    theta join — into ONE sort of the unioned value stream plus two
    linear window passes; at 100 TB, range-partition by value and fix
    up partition edges with each partition's boundary reference values
    (2 rows per partition). The same union trick as q_join_asof, on
    the VALUE axis instead of time."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
    )
    p = (
        load_table(spark, sf_dir, "part")
        .select(
            F.round(F.col("p_retailprice") * 100).cast("long").alias("pv")
        )
        .distinct()
    )
    ref = p.select(
        F.col("pv").alias("val"),
        F.lit(0).alias("is_probe"),
        F.col("pv").alias("pv_val"),
        F.lit(None).cast("long").alias("okey"),
    )
    probe = o.select(
        F.col("v").alias("val"),
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("pv_val"),
        F.col("o_orderkey").alias("okey"),
    )
    u = ref.unionByName(probe)
    wb = (
        Window.orderBy("val", "is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = (
        Window.orderBy("val", "is_probe")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ref_val = F.when(F.col("is_probe") == 0, F.col("pv_val"))
    w = u.select(
        "okey",
        "val",
        "is_probe",
        F.max(ref_val).over(wb).alias("below"),
        F.min(ref_val).over(wa).alias("above"),
    )
    nearest = (
        F.when(F.col("below").isNull(), F.col("above"))
        .when(F.col("above").isNull(), F.col("below"))
        .when(
            F.col("val") - F.col("below") <= F.col("above") - F.col("val"),
            F.col("below"),
        )
        .otherwise(F.col("above"))
    )
    return (
        w.filter(F.col("is_probe") == 1)
        .select(
            F.col("okey").alias("o_orderkey"),
            F.round(F.col("val") / 100.0, 2).alias("order_price"),
            F.round(nearest / 100.0, 2).alias("nearest_retail"),
            F.abs(F.col("val") - nearest).alias("dist_cents"),
        )
    )
