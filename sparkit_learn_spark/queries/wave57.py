"""Round-6 wave 57: global clustering coefficient of the near-dup
graph (wedges vs triangles — oracle embeds the jaccard pair CTE), an
exactly-oracled AMS F₂ sign sketch (join-size / skew estimation),
and volatility clustering (autocorrelation of squared returns). All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle
from .llm_pipeline2 import q_llm_ngram_jaccard


@register("q_graph_clustering_coef")
def q_graph_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient of the near-dup graph:
    3·triangles / wedges (paths of length 2) — near 1 means the
    similarity threshold is transitively consistent (duplicate
    clusters are cliques), low values mean chained borderline pairs
    (a~b~c but a̸~c) that make cluster membership threshold-fragile —
    the audit to run before trusting connected components as
    duplicate groups. The GLOBAL transitivity ratio, complementing
    q_graph_clustering_coeff's per-node local coefficients (a few
    dense nodes can drag the global number far from the local mean).
    Exact integer counts.

    Scale: wedges from degree counts (Σ d·(d−1)/2 — one explode +
    aggregate), triangles via the edge-edge-edge join over the
    candidate-bounded pair list with id-ordered endpoints —
    edge-grain joins, never all-pairs; both quantities are the
    standard distributed formulations."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2)
        .cast("long")
        .alias("n_wedges")
    )
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )
    m = pairs.agg(F.count("*").alias("n_edges"))
    return (
        m.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") > 0,
                   F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
            .otherwise(F.lit(0.0))
            .alias("clustering_coef"),
        )
    )


set_oracle(
    "q_graph_clustering_coef",
    f"""
    WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT doc_a AS v FROM pairs
              UNION ALL SELECT doc_b FROM pairs)
        GROUP BY v),
    w AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
          FROM deg),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e2.doc_a = e1.doc_b
        JOIN pairs e3 ON e3.doc_a = e1.doc_a
                     AND e3.doc_b = e2.doc_b),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs)
    SELECT m.n_edges, w.n_wedges, tri.n_triangles,
           CASE WHEN w.n_wedges > 0
                THEN ROUND(3.0 * tri.n_triangles / w.n_wedges, 6)
                ELSE 0.0 END AS clustering_coef
    FROM m CROSS JOIN w CROSS JOIN tri
    """,
)


@register(
    "q_sketch_ams_f2",
    oracle="""
    WITH ev AS (SELECT user_id AS x FROM events),
    f AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS fx
          FROM ev GROUP BY x),
    exact AS (SELECT CAST(SUM(fx * fx) AS BIGINT) AS f2 FROM f),
    h AS (SELECT CAST(u.g AS BIGINT) AS j FROM unnest(range(0, 16)) u(g)),
    z AS (
        SELECT h.j,
               CAST(SUM(CASE WHEN ((f.x * (2 * h.j + 1) * 2654435761)
                                   % 4294967296) % 2 = 0
                             THEN f.fx ELSE -f.fx END) AS BIGINT) AS zj
        FROM f CROSS JOIN h GROUP BY h.j),
    est AS (
        SELECT CAST(SUM(zj * zj) AS BIGINT) AS sum_z2,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM z)
    SELECT e.f2 AS exact_f2,
           CAST(est.sum_z2 / est.k AS BIGINT) AS ams_estimate,
           ROUND((est.sum_z2 / CAST(est.k AS DOUBLE) - e.f2) / e.f2, 6)
               AS rel_error
    FROM exact e CROSS JOIN est
    """,
)
def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-verified AMS F₂ sketch: the second frequency
    moment Σf² of per-user event counts — the self-join-size / skew
    predictor a planner consults before shuffling on a key —
    estimated by 16 portable ±1 sign hashes (Z_j = Σ s_j(x)·f(x),
    mean of Z² unbiasedly estimates F₂) and reported beside the
    exact F₂. Integer arithmetic end to end; both engines build the
    identical sign vectors, completing the sketch battery
    (HLL / Bloom / CMS / MinHash / KMV / AMS).

    Scale: the sign sums are a k-row aggregate with map-side
    combining over key-grain counts (Z merge = addition, the AMS
    union law); the exact side is the oracle's measurement."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy(F.col("user_id").alias("x")).agg(
        F.count("*").alias("fx")
    )
    exact = f.agg(F.sum(F.col("fx") * F.col("fx")).alias("f2"))
    h = spark.range(0, 16).select(F.col("id").alias("j"))
    sign_is_pos = (
        (F.col("x") * (2 * F.col("j") + 1) * 2654435761) % 4294967296
    ) % 2 == 0
    z = (
        f.crossJoin(F.broadcast(h))
        .groupBy("j")
        .agg(
            F.sum(
                F.when(sign_is_pos, F.col("fx")).otherwise(-F.col("fx"))
            ).alias("zj")
        )
    )
    est = z.agg(
        F.sum(F.col("zj") * F.col("zj")).alias("sum_z2"),
        F.count("*").alias("k"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        F.col("f2").alias("exact_f2"),
        F.expr("sum_z2 div k").alias("ams_estimate"),
        F.round(
            (F.col("sum_z2") / F.col("k").cast("double") - F.col("f2"))
            / F.col("f2"),
            6,
        ).alias("rel_error"),
    )


@register(
    "q_ts_vol_clustering",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    ret AS (
        SELECT d,
               CAST(FLOOR((rev - LAG(rev) OVER (ORDER BY d))
                          / 100.0) AS BIGINT) AS chg
        FROM day),
    sq AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS i,
               chg * chg AS v
        FROM ret WHERE chg IS NOT NULL),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(a.v AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(b.v AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(a.v AS HUGEINT) * a.v) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(b.v AS HUGEINT) * b.v) AS DOUBLE) AS syy
        FROM sq a JOIN sq b ON b.i = a.i + 1)
    SELECT n AS n_days,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx)
                    * SQRT(n * syy - sy * sy)), 6)
               AS vol_autocorr_lag1
    FROM m
    """,
)
def q_ts_vol_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility clustering (the ARCH effect): the lag-1
    autocorrelation of SQUARED day-over-day revenue changes —
    significantly positive means turbulent days cluster (variance is
    predictable even when the level is not), the stylized fact GARCH
    models exist for and the test that separates homoskedastic noise
    from regime-switching series. Changes FLOOR to integer dollars
    (floor, not truncate — Spark's div and DuckDB's // disagree on
    negatives) so the 4th-power-scale moment sums stay inside 128-bit
    accumulators; exact until the final correlation.

    Scale: day-grain series after one map-side aggregate; one
    self-join on the shifted index over the tiny series."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    ret = day.select(
        "d",
        F.expr(
            "cast(floor((rev - lag(rev) over (order by d)) / 100.0)"
            " as bigint)"
        ).alias("chg"),
    ).filter(F.col("chg").isNotNull())
    sq = ret.select(
        F.row_number().over(Window.orderBy("d")).alias("i"),
        (F.col("chg") * F.col("chg")).cast("decimal(19,0)").alias("v"),
    )
    a = sq.select(F.col("i").alias("ia"), F.col("v").alias("va"))
    b = sq.select(F.col("i").alias("ib"), F.col("v").alias("vb"))
    m = a.join(b, F.col("ib") == F.col("ia") + 1).agg(
        F.count("*").alias("n"),
        F.sum("va").cast("double").alias("sx"),
        F.sum("vb").cast("double").alias("sy"),
        F.sum(F.col("va") * F.col("vb")).cast("double").alias("sxy"),
        F.sum(F.col("va") * F.col("va")).cast("double").alias("sxx"),
        F.sum(F.col("vb") * F.col("vb")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("vol_autocorr_lag1"),
    )
