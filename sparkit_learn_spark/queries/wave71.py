"""Round-6 wave 71: FIFO allocation join (cumulative-interval
matching — the inventory/cost-basis pattern), single-source weighted
shortest paths on the near-dup graph (bounded min-plus relaxation),
and a Little's-law identity check that validates the sweep-line
concurrency integral in exact microsecond space. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_fin_fifo_allocation",
    oracle="""
    WITH supply AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
                    PARTITION BY l_partkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - CAST(l_quantity AS BIGINT) AS BIGINT) AS lo,
               CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
                    PARTITION BY l_partkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS hi,
               l_shipdate AS ship
        FROM lineitem WHERE l_returnflag = 'N'),
    demand AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
                    PARTITION BY l_partkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - CAST(l_quantity AS BIGINT) AS BIGINT) AS lo,
               CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
                    PARTITION BY l_partkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS hi,
               l_shipdate AS ship
        FROM lineitem WHERE l_returnflag = 'R'),
    alloc AS (
        SELECT s.l_partkey,
               LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS qty,
               CAST(DATEDIFF('day', s.ship, d.ship) AS BIGINT) AS lat_days
        FROM supply s JOIN demand d
          ON s.l_partkey = d.l_partkey
         AND s.lo < d.hi AND d.lo < s.hi)
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(SUM(qty) AS BIGINT) AS matched_qty,
           CAST(SUM(CASE WHEN lat_days >= 0 THEN qty ELSE 0 END)
                AS BIGINT) AS forward_qty,
           ROUND(CAST(SUM(qty * lat_days) AS DOUBLE) / SUM(qty) + 0.0, 6)
               AS avg_latency_days
    FROM alloc
    """,
)
def q_fin_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation join: per part, shipped supply lots
    (returnflag N) are matched to returned demand lots (returnflag R)
    in first-in-first-out order by mapping each side onto cumulative-
    quantity intervals [cum−qty, cum) and allocating the interval
    overlap — the lot-matching pattern behind FIFO cost basis,
    inventory consumption, and payment application. Reports matched
    quantity, the forward-in-time share, and quantity-weighted mean
    match latency.

    Scale: both cumulative windows and the overlap join are keyed by
    partkey, so the quadratic interval match is bounded per part
    (lineitems-per-part is constant in TPC-H data); work distributes
    across the part dimension with one shuffle per side. Quantities
    and latencies stay integer until the single final division.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def side(flag: str, prefix: str) -> DataFrame:
        base = li.filter(F.col("l_returnflag") == flag).select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        return base.select(
            "l_partkey",
            (F.sum("qty").over(w) - F.col("qty")).alias(f"{prefix}_lo"),
            F.sum("qty").over(w).alias(f"{prefix}_hi"),
            F.col("l_shipdate").alias(f"{prefix}_ship"),
        )

    supply = side("N", "s")
    demand = side("R", "d")
    alloc = supply.join(
        demand,
        (supply.l_partkey == demand.l_partkey)
        & (F.col("s_lo") < F.col("d_hi"))
        & (F.col("d_lo") < F.col("s_hi")),
    ).select(
        supply.l_partkey,
        (
            F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
        ).alias("qty"),
        F.datediff(F.col("d_ship"), F.col("s_ship"))
        .cast("long")
        .alias("lat_days"),
    )
    return alloc.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum("qty").alias("matched_qty"),
        F.sum(F.when(F.col("lat_days") >= 0, F.col("qty")).otherwise(0)).alias(
            "forward_qty"
        ),
        F.round(
            F.sum(F.col("qty") * F.col("lat_days")).cast("double")
            / F.sum("qty"),
            6,
        ).alias("avg_latency_days"),
    )


@register("q_graph_shortest_path")
def q_graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest paths (≤4 hops) from the
    minimum-id node of the near-dup graph, edge weight = micro-
    quantized dissimilarity (1 − jaccard)·10⁶ + 1: the similarity-
    weighted analogue of q_graph_bfs_hops, discriminating a chain of
    barely-related drifts from a tight cluster at equal hop count.
    Bounded min-plus relaxation: dist_{k+1}(v) = min(dist_k(v),
    min_u dist_k(u) + w(u,v)) — four rounds of an edge-grain join +
    node-grain min, the distributed Bellman-Ford step. Weights are
    exact integers so the min is order-free. Oracled by a DuckDB
    recursive CTE over ≤4-hop path enumeration with MIN(dist).

    Scale: per round one hash join of the node-grain frontier against
    the edge list and one node-keyed min — work is O(hops · edges),
    state node-grain; the seed is one scalar MIN, not a collect.
    """
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    wexpr = (F.round((1 - F.col("jaccard")) * 1000000) + 1).cast("long")
    half = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), wexpr.alias("w")
    )
    edges = half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).persist()
    try:
        seed = edges.agg(F.min("src")).collect()[0][0]
        dist = spark.createDataFrame(
            [(int(seed), 0)], "node: long, dist: long"
        )
        for _ in range(4):
            relaxed = (
                dist.alias("dn")
                .join(edges.alias("eg"), F.col("dn.node") == F.col("eg.src"))
                .select(
                    F.col("eg.dst").alias("node"),
                    (F.col("dn.dist") + F.col("eg.w")).alias("dist"),
                )
                .unionAll(dist)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            dist = relaxed.persist()
        return dist.select("node", "dist")
    finally:
        edges.unpersist()


set_oracle(
    "q_graph_shortest_path",
    f"""
WITH RECURSIVE pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
e AS (
    SELECT doc_a AS src, doc_b AS dst,
           CAST(ROUND((1 - jaccard) * 1000000) + 1 AS BIGINT) AS w
    FROM pairs
    UNION ALL
    SELECT doc_b, doc_a,
           CAST(ROUND((1 - jaccard) * 1000000) + 1 AS BIGINT)
    FROM pairs),
seed AS (SELECT MIN(src) AS s FROM e),
sp AS (
    SELECT s AS node, CAST(0 AS BIGINT) AS d, 0 AS hops FROM seed
    UNION
    SELECT e.dst, sp.d + e.w, sp.hops + 1
    FROM sp JOIN e ON e.src = sp.node
    WHERE sp.hops < 4)
SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM sp GROUP BY node
""",
)


@register(
    "q_evt_littles_law",
    oracle="""
    WITH visits AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS t_in, MAX(ts) AS t_out,
               CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    durs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_visits,
               CAST(SUM(CAST(DATEDIFF('microsecond', t_in, t_out)
                             AS BIGINT)) AS BIGINT) AS sum_dur_us
        FROM visits),
    bounds AS (
        SELECT CAST(DATEDIFF('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
                   AS window_us
        FROM events),
    marks AS (
        SELECT t_in AS t, CAST(1 AS BIGINT) AS delta FROM visits
        UNION ALL
        SELECT t_out AS t, CAST(-1 AS BIGINT) AS delta FROM visits),
    bnd AS (
        SELECT t, SUM(delta) AS delta FROM marks GROUP BY t),
    swept AS (
        SELECT SUM(delta) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS conc,
               CAST(DATEDIFF('microsecond', t,
                    LEAD(t) OVER (ORDER BY t)) AS BIGINT) AS gap_us
        FROM bnd),
    integral AS (
        SELECT CAST(SUM(conc * gap_us) AS BIGINT) AS conc_time_us
        FROM swept WHERE gap_us IS NOT NULL)
    SELECT d.n_visits,
           ROUND(CAST(d.n_visits AS DOUBLE) / b.window_us
                 * 3600000000.0, 6) AS lambda_per_hour,
           ROUND(CAST(d.sum_dur_us AS DOUBLE) / d.n_visits
                 / 60000000.0, 6) AS w_avg_minutes,
           ROUND(CAST(i.conc_time_us AS DOUBLE) / b.window_us, 6)
               AS l_time_avg,
           CAST(i.conc_time_us = d.sum_dur_us AS BIGINT)
               AS littles_law_exact
    FROM durs d, bounds b, integral i
    """,
)
def q_evt_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law identity check: user-day visits (≥2 events) give
    arrival rate λ, mean dwell W, and time-averaged concurrency L via
    a ±1 sweep-line integral — and the law L = λW is verified EXACTLY
    because the sweep integral of concurrency must equal the sum of
    visit durations in integer microseconds (`littles_law_exact`).
    A failing bit would mean the sweep-line machinery (the same
    pattern as q_evt_concurrency) dropped or double-counted a
    boundary.

    Scale: visits collapse the fact map-side to user-day grain; the
    sweep runs over boundary grain (2 rows per visit). The global
    ordered window is the documented single-reducer step — at 100 TB
    the standard fix is range-partitioned prefix sums with boundary
    merge, and everything up to the sweep stays keyed. All arithmetic
    is exact-integer microseconds until the three final readout
    divisions.
    """
    ev = load_table(spark, sf_dir, "events")
    visits = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.min("ts").alias("t_in"),
            F.max("ts").alias("t_out"),
            F.count(F.lit(1)).alias("n_ev"),
        )
        .filter(F.col("n_ev") >= 2)
        .persist()
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    durs = visits.agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum(us("t_out") - us("t_in")).alias("sum_dur_us"),
    )
    bounds = ev.agg(
        (F.unix_micros(F.max("ts").cast("timestamp_ltz"))
         - F.unix_micros(F.min("ts").cast("timestamp_ltz"))).alias(
            "window_us"
        )
    )
    marks = visits.select(
        F.col("t_in").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        visits.select(
            F.col("t_out").alias("t"), F.lit(-1).cast("long").alias("delta")
        )
    )
    bnd = marks.groupBy("t").agg(F.sum("delta").alias("delta"))
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_lead = Window.orderBy("t")
    swept = bnd.select(
        F.sum("delta").over(w_run).alias("conc"),
        (F.unix_micros(F.lead("t").over(w_lead).cast("timestamp_ltz"))
         - F.unix_micros(F.col("t").cast("timestamp_ltz"))).alias(
            "gap_us"
        ),
    )
    integral = swept.filter(F.col("gap_us").isNotNull()).agg(
        F.sum(F.col("conc") * F.col("gap_us")).alias("conc_time_us")
    )
    out = (
        durs.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(integral))
        .select(
            "n_visits",
            F.round(
                F.col("n_visits").cast("double")
                / F.col("window_us")
                * 3600000000.0,
                6,
            ).alias("lambda_per_hour"),
            F.round(
                F.col("sum_dur_us").cast("double")
                / F.col("n_visits")
                / 60000000.0,
                6,
            ).alias("w_avg_minutes"),
            F.round(
                F.col("conc_time_us").cast("double") / F.col("window_us"), 6
            ).alias("l_time_avg"),
            (F.col("conc_time_us") == F.col("sum_dur_us"))
            .cast("long")
            .alias("littles_law_exact"),
        )
    )
    return out
