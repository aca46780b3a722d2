"""Round-6 wave 89: linear-counting distinct sketch (the V-occupied-
buckets estimator, cross-engine-verified like the portable HLL),
grid-DBSCAN density clustering (core cells + 8-neighbor connected
components, recursive-CTE-oracled), and SAX time-series
symbolization (z-score breakpoints compared in exact integer space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_H32 = "(({k} * 2654435761) % 4294967296)"


@register(
    "q_sketch_linear_counting",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS x FROM orders),
    occ AS (
        SELECT CAST(COUNT(DISTINCT {_H32.format(k='x')} % 65536) AS BIGINT)
                   AS v
        FROM keys),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_d FROM keys)
    SELECT occ.v AS occupied_buckets, ex.exact_d,
           ROUND(-65536.0 * LN(CAST(65536 - occ.v AS DOUBLE) / 65536.0), 6)
               AS lc_estimate,
           ROUND(ABS(-65536.0 * LN(CAST(65536 - occ.v AS DOUBLE) / 65536.0)
                     - CAST(ex.exact_d AS DOUBLE))
                 / CAST(ex.exact_d AS DOUBLE), 6) AS rel_error
    FROM occ CROSS JOIN ex
    """,
)
def q_sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting (Whang et al.): hash every distinct customer
    key into a 65536-bucket bitmap and estimate the cardinality from
    the EMPTY-bucket fraction, n̂ = −m·ln(V_empty/m) — the occupancy
    inverts through the Poisson zero-class probability. (The numpy
    cross-check in tests/test_stats_numpy.py caught the
    occupied-fraction formula both engines initially agreed on — the
    exact failure class engine-mirror oracles cannot see.) The same
    portable 32-bit
    multiplicative hash as the HLL/CMS sketches, so BOTH engines
    build the identical bitmap and the estimate is exactly oracled —
    construction-verified, not just accuracy-bounded. Linear counting
    is the regime HLL is WORST at (small n relative to m): the
    classic production pattern is LC below ~2.5m, HLL above, which is
    exactly the hybrid Spark's own approx_count_distinct uses.

    Scale: the bitmap is a 65536-bucket COUNT(DISTINCT bucket) — one
    map-side-combining aggregate; merging partial bitmaps is bucket
    union, the same merge-anywhere shape as HLL registers. The
    estimator saturates when n >> m (V→0); m=65536 keeps it valid
    through sf1's 150k customers."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("x")).distinct()
    occ = keys.select(
        (F.expr(_H32.format(k="x")) % 65536).alias("b")
    ).agg(F.countDistinct("b").alias("v"))
    ex = keys.agg(F.count(F.lit(1)).alias("exact_d"))
    est = -65536.0 * F.log((65536 - F.col("v")).cast("double") / 65536.0)
    return (
        occ.crossJoin(F.broadcast(ex))
        .select(
            F.col("v").alias("occupied_buckets"),
            "exact_d",
            F.round(est, 6).alias("lc_estimate"),
            F.round(
                F.abs(est - F.col("exact_d").cast("double"))
                / F.col("exact_d").cast("double"),
                6,
            ).alias("rel_error"),
        )
    )


_DBSCAN_ORACLE = """
WITH RECURSIVE cells AS (
    SELECT CAST(DATEDIFF('day', DATE '1992-01-01', o_orderdate) // 28
                AS BIGINT) AS cx,
           CAST(FLOOR(ROUND(o_totalprice) / 25000) AS BIGINT) AS cy,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
core AS (
    SELECT cx, cy, cnt, cx * 1000 + cy AS node
    FROM cells CROSS JOIN tot
    WHERE cnt * n_cells >= total),
edges AS (
    SELECT a.node AS src, b.node AS dst
    FROM core a JOIN core b
      ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1),
reach(node, lbl) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node),
cl AS (
    SELECT comp.comp, CAST(COUNT(*) AS BIGINT) AS n_cells_in,
           CAST(SUM(core.cnt) AS BIGINT) AS n_pts
    FROM comp JOIN core ON core.node = comp.node
    GROUP BY comp.comp)
SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n_cells_in) AS BIGINT) AS n_core_cells,
       CAST(MAX(n_cells_in) AS BIGINT) AS largest_cluster_cells,
       ROUND(CAST(SUM(n_pts) AS DOUBLE)
             / (SELECT total FROM tot), 6) AS core_point_share
FROM cl
"""


@register("q_ml_dbscan_grid", oracle=_DBSCAN_ORACLE)
def q_ml_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN over the (order month, price band) plane: cells
    with above-average density are core cells; core cells touching in
    the 8-neighborhood merge into clusters (the cell-grid
    approximation of DBSCAN, the standard way to make density
    clustering distributable — GriDBSCAN / DBSCAN-on-cells). Cluster
    merge runs through the same min-label connected-components
    operator the dedup funnel uses; the oracle closes the clusters
    with a recursive CTE, so the whole pipeline — density threshold,
    adjacency, component labels, cluster stats — is exactly verified.

    Scale: the fact collapses to grid grain FIRST (bounded: months ×
    price bands, independent of row count), the adjacency self-join
    is grid-sized, and the cluster merge uses the bounded union-find
    operator (the grid blob's diameter makes iterative min-label
    propagation need ~100 rounds; union-find on a dimension-bounded
    edge list closes it in one bounded collect) — no per-point
    distance computation anywhere, which is precisely why grid-DBSCAN
    scales where point-DBSCAN (O(n²) or index-bound) does not."""
    from ..operators.components import connected_components_bounded

    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            (F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")) / F.lit(28))
            .cast("long")
            .alias("cx"),
            (F.round("o_totalprice") / F.lit(25000)).cast("long").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cells.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_cells")
    )
    core = (
        cells.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("n_cells") >= F.col("total"))
        .select("cx", "cy", "cnt", (F.col("cx") * 1000 + F.col("cy")).alias("node"))
        .persist()
    )
    a = core.select(F.col("cx").alias("ax"), F.col("cy").alias("ay"), F.col("node").alias("src"))
    b = core.select(F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("node").alias("dst"))
    edges = a.join(
        b,
        (F.abs(F.col("ax") - F.col("bx")) <= 1) & (F.abs(F.col("ay") - F.col("by")) <= 1),
    ).select("src", "dst")
    comp = connected_components_bounded(edges)
    cl = (
        comp.join(core, core["node"] == comp["node"])
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_cells_in"), F.sum("cnt").alias("n_pts"))
    )
    return (
        cl.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("n_cells_in").alias("n_core_cells"),
            F.max("n_cells_in").alias("largest_cluster_cells"),
            F.sum("n_pts").alias("pts"),
        )
        .crossJoin(F.broadcast(tot.select("total")))
        .select(
            "n_clusters",
            "n_core_cells",
            "largest_cluster_cells",
            F.round(F.col("pts").cast("double") / F.col("total").cast("double"), 6).alias(
                "core_point_share"
            ),
        )
    )


@register(
    "q_ts_sax",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s,
               SUM(CAST(v * v AS DECIMAL(38, 0))) AS svv
        FROM d),
    sg AS (
        SELECT n, s,
               SQRT((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                   AS t_unit
        FROM m),
    sym AS (
        SELECT day,
               CASE
                 WHEN CAST(d.v * sg.n - sg.s AS DOUBLE)
                      < -0.6745 * sg.t_unit THEN 'a'
                 WHEN CAST(d.v * sg.n - sg.s AS DOUBLE) < 0 THEN 'b'
                 WHEN CAST(d.v * sg.n - sg.s AS DOUBLE)
                      < 0.6745 * sg.t_unit THEN 'c'
                 ELSE 'd'
               END AS sym
        FROM d CROSS JOIN sg),
    w AS (
        SELECT CAST(DATEDIFF('day', DATE '1992-01-01', day) // 7
                    AS BIGINT) AS week,
               STRING_AGG(sym, '' ORDER BY day) AS word
        FROM sym GROUP BY 1)
    SELECT week, word,
           CAST(LENGTH(word) AS BIGINT) AS n_days
    FROM w ORDER BY week
    """,
)
def q_ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of the daily-revenue
    series: z-score each day against the global mean/std, map to a
    4-letter alphabet at the standard Gaussian breakpoints
    (−0.6745, 0, 0.6745 — the quartiles), and emit one word per week.
    The z-score comparison never leaves exact integer space:
    z_i < b ⇔ (v_i·n − S) < b·√(n·Σv² − S²), where the left side is
    an exact integer and the right side one sqrt both engines compute
    from identical integers — so the symbolization cannot flip on
    float noise and the words are exactly oracled. SAX words are the
    entry ticket to symbolic motif/discord mining at scale.

    Scale: one fact pass to day grain, one broadcast of three scalar
    moments, and a week-grain string fold — no window over rows, no
    per-row float state; the alphabet assignment is a pure projection."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("svv"),
    )
    sg = m.select(
        "n",
        "s",
        F.sqrt(
            F.col("n").cast("double") * F.col("svv").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        ).alias("t_unit"),
    )
    c = (F.col("v") * F.col("n") - F.col("s")).cast("double")
    sym = d.crossJoin(F.broadcast(sg)).select(
        "day",
        F.when(c < -0.6745 * F.col("t_unit"), "a")
        .when(c < 0, "b")
        .when(c < 0.6745 * F.col("t_unit"), "c")
        .otherwise("d")
        .alias("sym"),
    )
    w = (
        sym.groupBy(
            (F.datediff("day", F.lit("1992-01-01").cast("date")) / F.lit(7))
            .cast("long")
            .alias("week")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("day", "sym"))),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("word")
        )
    )
    return w.select(
        "week", "word", F.length("word").cast("long").alias("n_days")
    ).orderBy("week")
