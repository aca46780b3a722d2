"""Round-6 wave 111: portable log-bucket quantile sketch (with exact
error audit), square (4-cycle) counting on the near-dup graph, and
adstock carryover correlation (geometric-decay transform vs raw
same-day correlation). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_sketch_logbucket_quantile",
    oracle="""
    WITH x AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v FROM orders),
    h AS (
        SELECT CAST(FLOOR(LN(CAST(v AS DOUBLE)) * 16) AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM x GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS n_buckets FROM h),
    cum AS (SELECT b, c, SUM(c) OVER (ORDER BY b) AS cc FROM h),
    med AS (
        SELECT MIN(b) AS mb FROM cum CROSS JOIN n
        WHERE cc >= (n.n + 1) // 2),
    est AS (
        SELECT EXP((CAST(mb AS DOUBLE) + 0.5) / 16) AS q50_est FROM med),
    exact AS (
        SELECT MIN(v) AS q50_exact
        FROM (SELECT v, SUM(1) OVER (ORDER BY v) AS r FROM x) t
             CROSS JOIN n
        WHERE r >= (n.n + 1) // 2)
    SELECT n.n AS n_rows, n.n_buckets,
           ROUND(est.q50_est, 6) AS q50_sketch,
           CAST(exact.q50_exact AS BIGINT) AS q50_exact,
           ROUND(ABS(est.q50_est - CAST(exact.q50_exact AS DOUBLE))
                 / CAST(exact.q50_exact AS DOUBLE), 6) AS rel_error
    FROM n CROSS JOIN est CROSS JOIN exact
    """,
)
def q_sketch_logbucket_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable log-bucket quantile sketch (DDSketch-style,
    γ-buckets b = ⌊16·ln v⌋ giving ≤ ~3.2% relative error by
    construction): estimate the median from the bucket histogram's
    cumulative crossing and audit it against the exact median — a
    mergeable, fixed-size quantile sketch BOTH engines build
    identically (unlike engine-native approx_percentile/t-digest,
    whose internals differ and force rows-only checks). The audit
    column IS the relative-error guarantee, verified not assumed.

    Scale: the sketch is a ~150-bucket histogram with map-side
    combine; merging shards is bucket-wise addition — the
    mergeability that makes it the production quantile path where
    exact medians would need a full sort/histogram of the value
    domain."""
    o = load_table(spark, sf_dir, "orders")
    x = o.select(F.round("o_totalprice").cast("long").alias("v"))
    h = x.groupBy(
        F.floor(F.log(F.col("v").cast("double")) * 16).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = h.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_buckets"))
    cum = h.select("b", F.sum("c").over(Window.orderBy("b")).alias("cc"))
    med = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .agg(F.min("b").alias("mb"))
    )
    est = med.select(F.exp((F.col("mb").cast("double") + 0.5) / 16).alias("q50_est"))
    hx = x.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cumx = hx.select("v", F.sum("c").over(Window.orderBy("v")).alias("r"))
    exact = (
        cumx.crossJoin(F.broadcast(n))
        .filter(F.col("r") >= F.expr("(n + 1) div 2"))
        .agg(F.min("v").alias("q50_exact"))
    )
    return (
        n.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("n").alias("n_rows"),
            "n_buckets",
            F.round("q50_est", 6).alias("q50_sketch"),
            F.col("q50_exact").cast("long").alias("q50_exact"),
            F.round(
                F.abs(F.col("q50_est") - F.col("q50_exact").cast("double"))
                / F.col("q50_exact").cast("double"),
                6,
            ).alias("rel_error"),
        )
    )


@register("q_graph_squares")
def q_graph_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square (4-cycle) census of the near-dup graph: the number of
    4-cycles via the wedge identity (1/2)·Σ_{u<v} C(common(u,v), 2) over
    non-adjacent AND adjacent pairs minus degenerate paths — reported
    as the raw square count plus the square-to-triangle ratio, the
    motif signature separating bipartite-ish template families
    (squares, no triangles) from clique blobs (both). Exact integer
    wedge counts.

    Scale: the wedge join is Σ deg² (df-capped upstream); squares
    come from a C(c,2) fold over pair common-neighbor counts — never
    an explicit 4-path enumeration."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    sym = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .distinct()
        .persist()
    )
    e1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("v"))
    e2 = sym.select(F.col("src").alias("v2"), F.col("dst").alias("b"))
    wedges = (
        e1.join(e2, (F.col("v") == F.col("v2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sq = wedges.agg(
        F.expr("sum(common * (common - 1) div 2) div 2").alias("n_squares"),
        F.count(F.lit(1)).alias("n_wedge_pairs"),
    )
    tri = (
        wedges.join(
            sym.filter(F.col("src") < F.col("dst")).select(
                F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(1).alias("adj")
            ),
            ["a", "b"],
        )
        .agg((F.sum("common") / 3).cast("long").alias("n_triangles"))
    )
    return (
        sq.crossJoin(F.broadcast(tri))
        .select(
            "n_squares",
            "n_wedge_pairs",
            "n_triangles",
            F.round(
                F.col("n_squares").cast("double")
                / F.greatest(F.col("n_triangles").cast("double"), F.lit(1.0)),
                6,
            ).alias("square_triangle_ratio"),
        )
    )


set_oracle("q_graph_squares", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
wedges AS (
  SELECT e1.src AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS common
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src AND e1.src < e2.dst
  GROUP BY 1, 2),
sq AS (
  SELECT CAST(SUM(common * (common - 1) // 2) // 2 AS BIGINT) AS n_squares,
         CAST(COUNT(*) AS BIGINT) AS n_wedge_pairs
  FROM wedges),
tri AS (
  SELECT CAST(SUM(w.common) // 3 AS BIGINT) AS n_triangles
  FROM wedges w JOIN edges e ON e.src = w.a AND e.dst = w.b)
SELECT sq.n_squares, sq.n_wedge_pairs, tri.n_triangles,
       ROUND(CAST(sq.n_squares AS DOUBLE)
             / GREATEST(CAST(tri.n_triangles AS DOUBLE), 1.0), 6)
           AS square_triangle_ratio
FROM sq CROSS JOIN tri
""")


@register(
    "q_evt_adstock_correlation",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'view'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY 1),
    r AS (
        SELECT day, x, y,
               ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn
        FROM d),
    ad AS (
        SELECT day, x, y,
               POW(0.5, rn) * SUM(CAST(x AS DOUBLE) * POW(2.0, rn))
                   OVER (ORDER BY rn) AS adstock
        FROM r),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(CAST(x AS DOUBLE)) AS sx, SUM(CAST(y AS DOUBLE)) AS sy,
               SUM(adstock) AS sa,
               SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx,
               SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy,
               SUM(adstock * adstock) AS saa,
               SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS sxy,
               SUM(adstock * CAST(y AS DOUBLE)) AS say
        FROM ad)
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
               AS corr_same_day,
           ROUND((n * say - sa * sy)
                 / (SQRT(n * saa - sa * sa) * SQRT(n * syy - sy * sy)), 6)
               AS corr_adstock
    FROM m
    """,
)
def q_evt_adstock_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adstock carryover analysis: transform daily view value with a
    geometric-decay carryover (λ=0.5 — today's exposure is half as
    potent tomorrow) via the closed-form prefix trick (adstock_t =
    λ^t · Σ x_k·λ^(−k), ONE ordered window, no recurrence loop), and
    compare its correlation with purchases against the naive same-day
    correlation — the marketing-mix question "does exposure act with
    a lag?" answered without an iterative fit. Ordered-window
    cumulative sums are sequence-deterministic in both engines; the
    30-day horizon keeps the 2^rn reweighting far from double
    overflow (documented EWMA contract).

    Scale: day-grain window + one moment fold; the geometric prefix
    trick is what makes recursive carryover distributable at all."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).alias("y"),
    )
    r = d.select("day", "x", "y", (F.row_number().over(Window.orderBy("day")) - 1).alias("rn"))
    ws = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ad = r.select(
        "x",
        "y",
        (
            F.pow(F.lit(0.5), F.col("rn"))
            * F.sum(F.col("x").cast("double") * F.pow(F.lit(2.0), F.col("rn"))).over(ws)
        ).alias("adstock"),
    )
    xd = F.col("x").cast("double")
    yd = F.col("y").cast("double")
    m = ad.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum("adstock").alias("sa"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(F.col("adstock") * F.col("adstock")).alias("saa"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(F.col("adstock") * yd).alias("say"),
    )
    n2 = F.col("n")
    corr1 = (n2 * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n2 * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n2 * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    corr2 = (n2 * F.col("say") - F.col("sa") * F.col("sy")) / (
        F.sqrt(n2 * F.col("saa") - F.col("sa") * F.col("sa"))
        * F.sqrt(n2 * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        n2.cast("long").alias("n_days"),
        F.round(corr1, 6).alias("corr_same_day"),
        F.round(corr2, 6).alias("corr_adstock"),
    )
