"""Round-6 wave 27: distributed spatial operators on a deterministic
synthetic point set (coordinates derived from keys by portable integer
hashes, so both engines see identical geometry): grid-density binning
and a radius join executed as a Moore-neighborhood cell equi-join with
exact integer distance verification. Both exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# portable synthetic geometry: two independent multiplicative hashes
# map a key into a 1000x1000 integer plane; identical in both engines.
_X = "(({k} * 2654435761) % 4294967296) % 1000"
_Y = "(({k} * 40503) % 65536) % 1000"


@register(
    "q_join_spatial_bins",
    oracle=f"""
    WITH p AS (
        SELECT {_X.format(k='c_custkey')} AS x,
               {_Y.format(k='c_custkey')} AS y
        FROM customer),
    g AS (
        SELECT x // 100 AS cx, y // 100 AS cy,
               CAST(COUNT(*) AS BIGINT) AS n_points
        FROM p GROUP BY 1, 2),
    t AS (SELECT SUM(n_points) AS total FROM g)
    SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy, n_points,
           ROUND(n_points / CAST(t.total AS DOUBLE), 6) AS density
    FROM g CROSS JOIN t
    """,
)
def q_join_spatial_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid: customers mapped to a 1000×1000 plane by
    portable integer hashes, binned into a 10×10 cell grid with
    per-cell counts and density share — the heat-map / load-balancing
    view that precedes any spatial join (skewed cells predict hot
    partitions). Pure integer arithmetic.

    Scale: one map-side-combining aggregate at cell grain — the
    geohash-bucketing first step every distributed spatial engine
    (points into cells, cells are the shuffle key) takes at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    p = c.select(
        F.expr(_X.format(k="c_custkey")).alias("x"),
        F.expr(_Y.format(k="c_custkey")).alias("y"),
    )
    g = p.groupBy(
        F.expr("x div 100").alias("cx"), F.expr("y div 100").alias("cy")
    ).agg(F.count("*").alias("n_points"))
    t = g.agg(F.sum("n_points").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        F.col("cx").cast("long").alias("cx"),
        F.col("cy").cast("long").alias("cy"),
        "n_points",
        F.round(F.col("n_points") / F.col("total").cast("double"), 6).alias(
            "density"
        ),
    )


@register(
    "q_join_spatial_radius",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               {_X.format(k='c_custkey')} AS x,
               {_Y.format(k='c_custkey')} AS y
        FROM customer),
    sup AS (
        SELECT s_suppkey,
               {_X.format(k='s_suppkey')} AS x,
               {_Y.format(k='s_suppkey')} AS y
        FROM supplier),
    hits AS (
        SELECT s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_within
        FROM sup s JOIN cust c
          ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 400
        GROUP BY s.s_suppkey)
    SELECT sup.s_suppkey,
           COALESCE(hits.n_within, 0) AS n_within
    FROM sup LEFT JOIN hits ON hits.s_suppkey = sup.s_suppkey
    """,
)
def q_join_spatial_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join: for every supplier point, how many
    customer points lie within distance 20 — executed as the canonical
    distributed spatial join: customers keyed by their radius-sized
    (20-unit) grid cell, suppliers EXPANDED to their 3×3 Moore
    neighborhood of cells (radius ≤ cell size ⇒ the neighborhood
    covers every possible match), an equi-join on the cell key, then
    the exact integer squared-distance verify. The DuckDB oracle is
    the direct distance theta join — same rows, different plan.

    Scale: the theta join is quadratic; the cell equi-join shuffles
    each point O(1) times (9 cells per probe) and compares only
    within-neighborhood pairs — the grid-partitioned join every
    spatial engine runs. Cell size tracks the radius (not the plane),
    so per-cell pair counts stay bounded as density grows; suppliers
    missing any neighbor emit 0 via the left join, keeping the output
    key-complete."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cust = c.select(
        F.expr(_X.format(k="c_custkey")).alias("x"),
        F.expr(_Y.format(k="c_custkey")).alias("y"),
    ).select("x", "y", F.expr("x div 20").alias("cx"), F.expr("y div 20").alias("cy"))
    sup = s.select(
        "s_suppkey",
        F.expr(_X.format(k="s_suppkey")).alias("x"),
        F.expr(_Y.format(k="s_suppkey")).alias("y"),
    )
    neigh = sup.select(
        "s_suppkey",
        "x",
        "y",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> "
                "struct((x div 20) + dx AS cx, (y div 20) + dy AS cy))))"
            )
        ).alias("cell"),
    ).select(
        "s_suppkey",
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        F.col("cell.cx").alias("cx"),
        F.col("cell.cy").alias("cy"),
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    hits = (
        neigh.join(cust, ["cx", "cy"])
        .filter(d2 <= 400)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_within"))
    )
    return sup.select("s_suppkey").join(hits, "s_suppkey", "left").select(
        "s_suppkey", F.coalesce(F.col("n_within"), F.lit(0).cast("long")).alias("n_within")
    )
