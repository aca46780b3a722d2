"""Round-6 wave 75: point-in-polygon containment join (convex
polygons as half-plane edge tables, exact integer cross-product
tests), Deming orthogonal regression (errors-in-variables closed
form over exact integer moments), and the SQL FILTER-clause
aggregate battery. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_X = "((c_custkey * 2654435761) % 4294967296) % 1000"
_Y = "((c_custkey * 40503) % 65536) % 1000"

# convex polygons, vertices counter-clockwise on the 1000x1000 plane;
# stored as directed edges (x1,y1)->(x2,y2): a point is inside iff
# every cross product (x2-x1)(y-y1)-(y2-y1)(x-x1) >= 0.
_POLYGONS = {
    1: [(100, 100), (800, 200), (400, 900)],                # triangle
    2: [(200, 200), (700, 200), (700, 700), (200, 700)],    # square
    3: [(500, 50), (950, 350), (800, 850), (300, 800), (60, 400)],
}
_EDGES = [
    (pid, x1, y1, x2, y2)
    for pid, verts in _POLYGONS.items()
    for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1])
]
_EDGE_VALUES = ", ".join(
    f"({p}, {a}, {b}, {c}, {d})" for p, a, b, c, d in _EDGES
)
_N_EDGES = {pid: len(v) for pid, v in _POLYGONS.items()}


@register(
    "q_join_point_in_polygon",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey, {_X} AS x, {_Y} AS y FROM customer),
    edges AS (
        SELECT CAST(poly_id AS BIGINT) AS poly_id,
               CAST(x1 AS BIGINT) AS x1, CAST(y1 AS BIGINT) AS y1,
               CAST(x2 AS BIGINT) AS x2, CAST(y2 AS BIGINT) AS y2
        FROM (VALUES {_EDGE_VALUES}) t(poly_id, x1, y1, x2, y2)),
    ne AS (SELECT poly_id, CAST(COUNT(*) AS BIGINT) AS n_edges
           FROM edges GROUP BY poly_id),
    tests AS (
        SELECT p.c_custkey, e.poly_id,
               CASE WHEN (e.x2 - e.x1) * (p.y - e.y1)
                         - (e.y2 - e.y1) * (p.x - e.x1) >= 0
                    THEN 1 ELSE 0 END AS inside_edge
        FROM pts p CROSS JOIN edges e),
    contained AS (
        SELECT t.c_custkey, t.poly_id
        FROM tests t JOIN ne ON ne.poly_id = t.poly_id
        GROUP BY t.c_custkey, t.poly_id, ne.n_edges
        HAVING SUM(t.inside_edge) = ne.n_edges),
    totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pts)
    SELECT c.poly_id,
           CAST(COUNT(*) AS BIGINT) AS n_inside,
           ROUND(COUNT(*) / CAST(t.n_total AS DOUBLE), 6) AS share
    FROM contained c CROSS JOIN totals t
    GROUP BY c.poly_id, t.n_total
    ORDER BY c.poly_id
    """,
)
def q_join_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment join: customers hashed onto the
    portable 1000×1000 integer plane, tested against three convex
    polygons stored as directed-edge half-planes — a point is inside
    iff EVERY edge cross product is non-negative, an exact integer
    test (no floating-point orientation hazard, the classic
    computational-geometry pitfall). Completes the spatial family
    (grid density, radius join, kNN, closest pair → polygon
    containment).

    Scale: the polygon edge table is a broadcast literal dimension;
    each point evaluates edges map-side and reduces by (point,
    polygon) with a counting HAVING — no shuffle grows with polygon
    count. At 100 TB with many polygons, the same plan gains an
    r-tree/cell pre-filter on the polygon bounding boxes (the cell
    machinery q_join_spatial_bins already provides).
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey", F.expr(_X).alias("x"), F.expr(_Y).alias("y")
    )
    edges = F.broadcast(
        spark.createDataFrame(
            _EDGES, "poly_id: long, x1: long, y1: long, x2: long, y2: long"
        )
    )
    ne = F.broadcast(
        spark.createDataFrame(
            [(pid, n) for pid, n in _N_EDGES.items()],
            "poly_id: long, n_edges: long",
        )
    )
    tests = pts.crossJoin(edges).select(
        "c_custkey",
        "poly_id",
        F.when(
            (F.col("x2") - F.col("x1")) * (F.col("y") - F.col("y1"))
            - (F.col("y2") - F.col("y1")) * (F.col("x") - F.col("x1"))
            >= 0,
            1,
        )
        .otherwise(0)
        .alias("inside_edge"),
    )
    contained = (
        tests.join(ne, "poly_id")
        .groupBy("c_custkey", "poly_id", "n_edges")
        .agg(F.sum("inside_edge").alias("n_in"))
        .filter(F.col("n_in") == F.col("n_edges"))
    )
    totals = pts.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        contained.crossJoin(F.broadcast(totals))
        .groupBy("poly_id", "n_total")
        .agg(F.count(F.lit(1)).alias("n_inside"))
        .select(
            "poly_id",
            "n_inside",
            F.round(
                F.col("n_inside") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("poly_id")
    )


@register(
    "q_stat_deming",
    oracle="""
    WITH xy AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               CAST(n_chars AS BIGINT) AS y
        FROM documents),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM xy),
    c AS (
        SELECT n,
               CAST(sx AS DOUBLE) / n AS mx,
               CAST(sy AS DOUBLE) / n AS my,
               (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n) / n AS vxx,
               (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / n) / n AS vyy,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE) / n) / n AS vxy
        FROM m)
    SELECT n,
           ROUND((vyy - vxx + SQRT((vyy - vxx) * (vyy - vxx)
                                   + 4.0 * vxy * vxy))
                 / (2.0 * vxy), 6) AS deming_slope,
           ROUND(my - (vyy - vxx + SQRT((vyy - vxx) * (vyy - vxx)
                                        + 4.0 * vxy * vxy))
                      / (2.0 * vxy) * mx, 6) AS deming_intercept,
           ROUND(vxy / SQRT(vxx * vyy), 6) AS pearson_r
    FROM c
    """,
)
def q_stat_deming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming (orthogonal, δ=1) regression of document character
    count on whitespace word count (r ≈ 0.998 — chars-per-word is
    the natural latent slope): the errors-in-variables fit that
    treats BOTH variables as noisy — slope = (s_yy − s_xx +
    sqrt((s_yy − s_xx)² + 4s_xy²)) / 2s_xy, the closed form used for
    instrument-comparison studies. Completes the regression battery
    (OLS, per-group OLS, two-feature OLS, Theil–Sen → Deming). The
    variable pair is deliberately well-conditioned AND small-
    magnitude: every exact-integer moment stays below 2^53, so plain
    BIGINT sums suffice (whole-stage codegen, no BigDecimal path)
    and the int→double conversions are exact in both engines (on an
    ill-conditioned pair the giant slope amplified one ulp of
    decimal-conversion difference into the 6dp output; larger-valued
    pairs would move the squares into DECIMAL(38,0) as the sibling
    moment queries do).

    Scale: one map-side-combining aggregate to six exact sufficient
    statistics; the closed form is the identical IEEE double
    expression in both engines. Zero joins, zero windows.
    """
    d = load_table(spark, sf_dir, "documents")
    x = F.size(F.split("text", " ")).cast("long")
    yc = F.col("n_chars").cast("long")
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(x * yc).alias("sxy"),
    )
    n = F.col("n")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    vxx = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    ) / n
    vyy = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / n
    ) / n
    vxy = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double") / n
    ) / n
    disc = F.sqrt((vyy - vxx) * (vyy - vxx) + 4.0 * vxy * vxy)
    slope = (vyy - vxx + disc) / (2.0 * vxy)
    return m.select(
        n.alias("n"),
        F.round(slope, 6).alias("deming_slope"),
        F.round(my - slope * mx, 6).alias("deming_intercept"),
        F.round(vxy / F.sqrt(vxx * vyy), 6).alias("pearson_r"),
    )


@register(
    "q_agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
               AS n_discounted,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_quantity >= 25) AS BIGINT)
               AS bulk_cents,
           CAST(MAX(CAST(l_quantity AS BIGINT))
                FILTER (WHERE l_linestatus = 'F') AS BIGINT)
               AS max_qty_finished,
           ROUND(AVG(CAST(ROUND(l_tax * 100) AS BIGINT))
                 FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01'),
                 6) AS avg_tax_recent
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard FILTER clause on aggregates (COUNT/SUM/MAX/AVG
    each with its own predicate in one pass) — the declarative form
    of conditional aggregation that replaces CASE-WHEN pyramids and
    lets one scan feed many differently-filtered measures. Spark
    parses FILTER natively; the DataFrame equivalent is the
    when().otherwise(null) rewrite Catalyst compiles it to.

    Scale: single hash aggregate over the fact, all five measures
    computed map-side in one pass — the pattern that collapses five
    separate filtered scans into one at 100 TB.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_filter_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                   FILTER (WHERE l_quantity >= 25) AS bulk_cents,
               MAX(CAST(l_quantity AS BIGINT))
                   FILTER (WHERE l_linestatus = 'F') AS max_qty_finished,
               ROUND(AVG(CAST(ROUND(l_tax * 100) AS BIGINT))
                     FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01'),
                     6) AS avg_tax_recent
        FROM lineitem_filter_v
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )
