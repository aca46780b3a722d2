"""Round-6 wave 114: iterative proportional fitting (survey raking,
two unrolled rounds), dedup-cluster purity/NMI against source labels,
and Theil's U2 forecast-skill ratio (seasonal-naive vs naive). All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_stat_ipf_raking",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment AS seg, c_nationkey % 5 AS reg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS target
        FROM customer GROUP BY 1, 2),
    mrow AS (SELECT seg, CAST(SUM(target) AS DOUBLE) AS m FROM c GROUP BY seg),
    mcol AS (SELECT reg, CAST(SUM(target) AS DOUBLE) AS m FROM c GROUP BY reg),
    r1 AS (
        SELECT c.seg, c.reg, c.target,
               CAST(c.n AS DOUBLE) * mrow.m
                   / SUM(CAST(c.n AS DOUBLE)) OVER (PARTITION BY c.seg)
                   AS w
        FROM c JOIN mrow ON mrow.seg = c.seg),
    r2 AS (
        SELECT r1.seg, r1.reg, r1.target,
               r1.w * mcol.m / SUM(r1.w) OVER (PARTITION BY r1.reg) AS w
        FROM r1 JOIN mcol ON mcol.reg = r1.reg),
    fit AS (
        SELECT seg, CAST(SUM(target) AS DOUBLE) AS m, SUM(w) AS fitted
        FROM r2 GROUP BY seg)
    SELECT r2.seg, CAST(r2.reg AS BIGINT) AS reg,
           ROUND(r2.w, 6) AS raked_weight,
           ROUND(MAX(ABS(fit.fitted - fit.m)) OVER (), 6)
               AS worst_row_marginal_gap
    FROM r2 JOIN fit ON fit.seg = r2.seg
    ORDER BY r2.seg, reg
    """,
)
def q_stat_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (survey raking), two unrolled
    rounds: start from the observed (segment × region) customer
    counts and rake them to match the positive-balance population's
    row then column marginals — the post-stratification weighting
    every survey/experimentation team uses to fix non-response bias.
    Two rounds = one row-scaling + one column-scaling (IPF converges
    geometrically; the residual row-marginal gap is REPORTED, not
    hidden). Integer cells; each scaling is one windowed ratio.

    Scale: the contingency table is (5 segments × 5 regions) —
    bounded; each IPF round is one partitioned window over it, so
    raking costs nothing beyond the first aggregate even with many
    more cells."""
    c = load_table(spark, sf_dir, "customer")
    base = c.groupBy(
        F.col("c_mktsegment").alias("seg"), (F.col("c_nationkey") % 5).alias("reg")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).alias("target"),
    )
    mrow = base.groupBy("seg").agg(F.sum("target").cast("double").alias("mr"))
    mcol = base.groupBy("reg").agg(F.sum("target").cast("double").alias("mc"))
    wseg = Window.partitionBy("seg")
    r1 = base.join(F.broadcast(mrow), "seg").select(
        "seg",
        "reg",
        "target",
        (F.col("n").cast("double") * F.col("mr") / F.sum(F.col("n").cast("double")).over(wseg)).alias("w"),
    )
    wreg = Window.partitionBy("reg")
    r2 = r1.join(F.broadcast(mcol), "reg").select(
        "seg",
        "reg",
        "target",
        (F.col("w") * F.col("mc") / F.sum("w").over(wreg)).alias("w"),
    )
    fit = r2.groupBy("seg").agg(
        F.sum("target").cast("double").alias("m"), F.sum("w").alias("fitted")
    )
    wall = Window.partitionBy()
    return (
        r2.join(F.broadcast(fit), "seg")
        .select(
            "seg",
            F.col("reg").cast("long").alias("reg"),
            F.round("w", 6).alias("raked_weight"),
            F.round(F.max(F.abs(F.col("fitted") - F.col("m"))).over(wall), 6).alias(
                "worst_row_marginal_gap"
            ),
        )
        .orderBy("seg", "reg")
    )


@register("q_llm_cluster_purity")
def q_llm_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purity of the near-dup clusters against source labels: for
    every multi-document cluster, the share of members from its
    majority source, plus the aggregate purity — near-dups
    overwhelmingly SHOULD share a source (templates live in one
    crawl); low purity means the dedup threshold is merging unrelated
    text, the cheapest external validation a dedup pipeline gets.
    Cluster labels come from the min-label components; majority ties
    break on source name. Exact integers end-to-end.

    Scale: components at edge grain, then a (cluster × source) count
    and an argmax per cluster — validation costs one aggregate over
    cluster members."""
    from ..operators.components import connected_components

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    m = comp.join(docs, comp["node"] == docs["doc_id"]).select(
        F.col("comp").alias("cluster"), "source"
    )
    cs = m.groupBy("cluster", "source").agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(
        Window.partitionBy("cluster").orderBy(F.desc("n"), "source")
    )
    top = cs.withColumn("rn", rn).filter(F.col("rn") == 1).select(
        "cluster", F.col("source").alias("majority_source"), F.col("n").alias("majority_n")
    )
    size = cs.groupBy("cluster").agg(F.sum("n").alias("size"))
    j = top.join(size, "cluster")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("size").alias("n_docs"),
        F.sum("majority_n").alias("n_majority"),
    )
    return agg.select(
        "n_clusters",
        "n_docs",
        F.round(F.col("n_majority").cast("double") / F.col("n_docs").cast("double"), 6).alias(
            "purity"
        ),
    )


set_oracle("q_llm_cluster_purity", f"""
WITH RECURSIVE pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
m AS (
  SELECT comp.cluster, d.source
  FROM comp JOIN documents d ON d.doc_id = comp.node),
cs AS (
  SELECT cluster, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM m GROUP BY cluster, source),
top AS (
  SELECT cluster, n AS majority_n,
         ROW_NUMBER() OVER (PARTITION BY cluster
             ORDER BY n DESC, source) AS rn
  FROM cs),
agg AS (
  SELECT CAST(COUNT(DISTINCT cs.cluster) AS BIGINT) AS n_clusters,
         CAST(SUM(cs.n) AS BIGINT) AS n_docs
  FROM cs),
mj AS (SELECT CAST(SUM(majority_n) AS BIGINT) AS n_majority
       FROM top WHERE rn = 1)
SELECT agg.n_clusters, agg.n_docs,
       ROUND(CAST(mj.n_majority AS DOUBLE) / CAST(agg.n_docs AS DOUBLE), 6)
           AS purity
FROM agg CROSS JOIN mj
""")


@register(
    "q_ts_theil_u2",
    oracle="""
    WITH mth AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    l AS (
        SELECT month, v,
               LAG(v, 12) OVER (ORDER BY month) AS seasonal_pred,
               LAG(v, 1) OVER (ORDER BY month) AS naive_pred
        FROM mth),
    e AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(v - seasonal_pred AS DECIMAL(38, 0))
                   * CAST(v - seasonal_pred AS DECIMAL(38, 0)))
                   AS sse_seasonal,
               SUM(CAST(v - naive_pred AS DECIMAL(38, 0))
                   * CAST(v - naive_pred AS DECIMAL(38, 0))) AS sse_naive
        FROM l WHERE seasonal_pred IS NOT NULL AND naive_pred IS NOT NULL)
    SELECT n AS n_months,
           ROUND(SQRT(CAST(sse_seasonal AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS rmse_seasonal,
           ROUND(SQRT(CAST(sse_naive AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS rmse_naive,
           ROUND(SQRT(CAST(sse_seasonal AS DOUBLE)
                      / CAST(sse_naive AS DOUBLE)), 6) AS theil_u2
    FROM e
    """,
)
def q_ts_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 forecast-skill ratio: the seasonal-naive forecaster
    (same month last year) against the no-change naive (last month),
    as RMSE(seasonal)/RMSE(naive) over the months where both exist —
    U2 < 1 means the seasonal model ADDS skill over persistence, the
    go/no-go bar any forecasting investment must clear before anyone
    debates architectures (q_ts_forecast_eval reports the seasonal
    model's absolute errors; this reports whether they BEAT the
    zero-cost baseline). Squared errors are exact decimal integers.

    Scale: month-grain lags in one window, one fold — skill
    benchmarking is free once the series aggregates."""
    o = load_table(spark, sf_dir, "orders")
    mth = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("month")
    l = mth.select(
        "v",
        F.lag("v", 12).over(w).alias("seasonal_pred"),
        F.lag("v", 1).over(w).alias("naive_pred"),
    ).filter(F.col("seasonal_pred").isNotNull() & F.col("naive_pred").isNotNull())
    dec = "decimal(38,0)"
    e = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("v") - F.col("seasonal_pred")).cast(dec)
            * (F.col("v") - F.col("seasonal_pred")).cast(dec)
        ).alias("sse_seasonal"),
        F.sum(
            (F.col("v") - F.col("naive_pred")).cast(dec)
            * (F.col("v") - F.col("naive_pred")).cast(dec)
        ).alias("sse_naive"),
    )
    nd = F.col("n").cast("double")
    return e.select(
        F.col("n").alias("n_months"),
        F.round(F.sqrt(F.col("sse_seasonal").cast("double") / nd), 6).alias("rmse_seasonal"),
        F.round(F.sqrt(F.col("sse_naive").cast("double") / nd), 6).alias("rmse_naive"),
        F.round(
            F.sqrt(F.col("sse_seasonal").cast("double") / F.col("sse_naive").cast("double")), 6
        ).alias("theil_u2"),
    )
