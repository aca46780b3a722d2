"""Round-6 wave 103: nearest-tolerance as-of join (completing the
backward/forward/nearest as-of trio), the rich-club coefficient of
the near-dup graph, and quarterly HHI concentration with its trend.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH od AS (
        SELECT o_orderdate AS day,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1),
    ed AS (
        SELECT CAST(ts AS DATE) AS eday,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
    cand AS (
        SELECT od.day, od.n_orders, ed.eday, ed.n_events,
               ABS(DATEDIFF('day', ed.eday, od.day)) AS dist,
               ROW_NUMBER() OVER (PARTITION BY od.day
                   ORDER BY ABS(DATEDIFF('day', ed.eday, od.day)), ed.eday)
                   AS rn
        FROM od JOIN ed
          ON ed.eday BETWEEN od.day - INTERVAL 3 DAY
                         AND od.day + INTERVAL 3 DAY)
    SELECT day, n_orders, eday AS matched_event_day, n_events,
           CAST(dist AS BIGINT) AS day_distance
    FROM cand WHERE rn = 1 ORDER BY day
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join with tolerance: each order day matched to
    the CLOSEST event day within ±3 days (ties to the earlier day) —
    the third as-of mode after backward (q_join_asof) and forward
    (q_join_asof_forward), i.e. pandas merge_asof
    direction='nearest'. The band join bounds candidates to ≤7 per
    row, then a per-key rank picks the winner deterministically.

    Scale: both sides collapse to day grain first; the band join is
    a broadcast range join with a constant candidate fan-out, and
    the rank partitions by the left key — the standard distributed
    nearest-join shape (tolerance bounds make it linear, unlike
    unbounded nearest which needs a sort-merge)."""
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    od = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    ed = ev.groupBy(F.col("ts").cast("date").alias("eday")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    cand = od.join(
        F.broadcast(ed),
        (F.col("eday") >= F.date_sub(F.col("day"), 3))
        & (F.col("eday") <= F.date_add(F.col("day"), 3)),
    ).select(
        "day",
        "n_orders",
        "eday",
        "n_events",
        F.abs(F.datediff("day", "eday")).alias("dist"),
    )
    rn = F.row_number().over(Window.partitionBy("day").orderBy("dist", "eday"))
    return (
        cand.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "day",
            "n_orders",
            F.col("eday").alias("matched_event_day"),
            "n_events",
            F.col("dist").cast("long").alias("day_distance"),
        )
        .orderBy("day")
    )


@register("q_graph_rich_club")
def q_graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the near-dup graph: among the nodes
    with degree > k (k = 1, 2, 3), the realized fraction of possible
    edges — φ(k) = 2·E_club / (N_club·(N_club−1)). A rising φ(k)
    means high-degree documents (template hubs) preferentially
    near-duplicate EACH OTHER — one shared boilerplate family, not
    independent clusters; that changes the dedup keep-policy. Exact
    integer degrees, club membership, and edge counts.

    Scale: degrees are an edge-grain aggregate; club edges come from
    two broadcast semi-joins of the (small) club set against the edge
    list — never all-pairs; one row per k."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).distinct().persist()
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    out = None
    for k in (1, 2, 3):
        club = deg.filter(F.col("deg") > k).select("n")
        nclub = club.agg(F.count(F.lit(1)).alias("n_club"))
        ca = club.select(F.col("n").alias("a"))
        cb = club.select(F.col("n").alias("b"))
        eclub = (
            e.join(F.broadcast(ca), "a").join(F.broadcast(cb), "b")
            .agg(F.count(F.lit(1)).alias("e_club"))
        )
        row = (
            nclub.crossJoin(F.broadcast(eclub))
            .select(
                F.lit(k).cast("long").alias("k"),
                "n_club",
                "e_club",
                F.round(
                    F.when(F.col("n_club") >= 2,
                           2.0 * F.col("e_club").cast("double")
                           / (F.col("n_club").cast("double")
                              * (F.col("n_club").cast("double") - 1)))
                    .otherwise(F.lit(0.0)),
                    6,
                ).alias("phi"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("k")


set_oracle("q_graph_rich_club", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
e AS (SELECT DISTINCT doc_a AS a, doc_b AS b FROM pairs),
deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
  GROUP BY n),
ks AS (SELECT UNNEST(range(1, 4)) AS k),
club AS (
  SELECT ks.k, deg.n FROM ks JOIN deg ON deg.deg > ks.k),
nclub AS (
  SELECT ks.k, CAST(COUNT(club.n) AS BIGINT) AS n_club
  FROM ks LEFT JOIN club ON club.k = ks.k GROUP BY ks.k),
eclub AS (
  SELECT c1.k, CAST(COUNT(*) AS BIGINT) AS e_club
  FROM e
  JOIN club c1 ON c1.n = e.a
  JOIN club c2 ON c2.n = e.b AND c2.k = c1.k
  GROUP BY c1.k)
SELECT CAST(n.k AS BIGINT) AS k, n.n_club,
       COALESCE(ec.e_club, 0) AS e_club,
       ROUND(CASE WHEN n.n_club >= 2 THEN
                 2.0 * CAST(COALESCE(ec.e_club, 0) AS DOUBLE)
                 / (CAST(n.n_club AS DOUBLE) * (CAST(n.n_club AS DOUBLE) - 1))
             ELSE 0.0 END, 6) AS phi
FROM nclub n LEFT JOIN eclub ec ON ec.k = n.k
ORDER BY k
""")


@register(
    "q_fin_hhi_trend",
    oracle="""
    WITH q AS (
        SELECT DATE_TRUNC('quarter', o.o_orderdate) AS quarter,
               c.c_nationkey AS nat,
               SUM(CAST(ROUND(o.o_totalprice) AS BIGINT)) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
    t AS (SELECT quarter, CAST(SUM(rev) AS BIGINT) AS tot FROM q GROUP BY 1),
    h AS (
        SELECT q.quarter,
               SUM((CAST(q.rev AS DOUBLE) / CAST(t.tot AS DOUBLE))
                   * (CAST(q.rev AS DOUBLE) / CAST(t.tot AS DOUBLE)))
                   AS hhi,
               ROW_NUMBER() OVER (ORDER BY q.quarter) - 1 AS i
        FROM q JOIN t ON t.quarter = q.quarter
        GROUP BY q.quarter),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(i) AS si, SUM(hhi) AS sh,
               SUM(i * i) AS sii, SUM(i * hhi) AS sih
        FROM h)
    SELECT h.quarter, ROUND(h.hhi, 6) AS hhi,
           ROUND((m.sih - m.si * m.sh / m.n) / (m.sii - m.si * m.si / m.n),
                 8) AS hhi_trend_per_quarter
    FROM h CROSS JOIN m ORDER BY h.quarter
    """,
)
def q_fin_hhi_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration trend: the Herfindahl-Hirschman index of
    national revenue shares per QUARTER, with the OLS slope across
    quarters — is the customer base concentrating (rising HHI, fewer
    markets carrying revenue) or diversifying? The time-series
    upgrade of the single-shot q_agg_hhi that turns a level into an
    alarm. Quarterly revenue is exact integers; each HHI is a
    25-term share fold; the trend is a closed-form slope over
    ~28 quarters.

    Scale: (quarter × nation)-grain aggregate with broadcast
    dimension join — bounded state; the trend regression is over the
    quarter domain."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    q = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.date_trunc("quarter", "o_orderdate").alias("quarter"),
            F.col("c_nationkey").alias("nat"),
        )
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("rev"))
    )
    t = q.groupBy("quarter").agg(F.sum("rev").alias("tot"))
    share = F.col("rev").cast("double") / F.col("tot").cast("double")
    h = (
        q.join(F.broadcast(t), "quarter")
        .groupBy("quarter")
        .agg(F.sum(share * share).alias("hhi"))
        .select(
            "quarter",
            "hhi",
            (F.row_number().over(Window.orderBy("quarter")) - 1).alias("i"),
        )
    )
    m = h.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("i").cast("double").alias("si"),
        F.sum("hhi").alias("sh"),
        F.sum(F.col("i") * F.col("i")).cast("double").alias("sii"),
        F.sum(F.col("i") * F.col("hhi")).alias("sih"),
    )
    return (
        h.crossJoin(F.broadcast(m))
        .select(
            "quarter",
            F.round("hhi", 6).alias("hhi"),
            F.round(
                (F.col("sih") - F.col("si") * F.col("sh") / F.col("n"))
                / (F.col("sii") - F.col("si") * F.col("si") / F.col("n")),
                8,
            ).alias("hhi_trend_per_quarter"),
        )
        .orderBy("quarter")
    )
