"""Round-6 wave 128: anomaly persistence (do anomalous days cluster?)
and the cross-source duplication matrix (which sources copy from
which). Exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_evt_anomaly_persistence",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s,
               SQRT(CAST(COUNT(*) AS DOUBLE)
                    * CAST(SUM(CAST(v * v AS DECIMAL(38, 0))) AS DOUBLE)
                    - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE))
                   AS t_unit
        FROM d),
    f AS (
        SELECT day,
               CASE WHEN ABS(CAST(d.v * m.n - m.s AS DOUBLE)) > m.t_unit
                    THEN 1 ELSE 0 END AS anom
        FROM d CROSS JOIN m),
    l AS (
        SELECT anom, LAG(anom) OVER (ORDER BY day) AS prev
        FROM f),
    c AS (
        SELECT CAST(SUM(anom) AS BIGINT) AS n_anom,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN anom = 1 AND prev = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS consec,
               CAST(SUM(CASE WHEN prev = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_prev_anom
        FROM l)
    SELECT n_anom, consec,
           ROUND(CAST(n_anom AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS base_rate,
           ROUND(CAST(consec AS DOUBLE) / CAST(n_prev_anom AS DOUBLE), 6)
               AS p_anom_given_prev,
           ROUND((CAST(consec AS DOUBLE) / CAST(n_prev_anom AS DOUBLE))
                 / (CAST(n_anom AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS persistence_lift
    FROM c
    """,
)
def q_evt_anomaly_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly persistence: P(anomalous day | yesterday anomalous)
    against the base rate — lift ≈ 1 means anomalies are isolated
    shocks (page once, move on); lift » 1 means they are EPISODES and
    the pager policy should suppress repeats and track incident
    duration instead. Anomaly = |z| > 1 via the exact-integer
    comparison; the conditional is two lag-window counts.

    Scale: day-grain flagging + one lag window + a fold — the
    meta-monitor on top of any daily anomaly rule."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sqrt(
            F.count(F.lit(1)).cast("double")
            * F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).cast("double")
            - F.sum("v").cast("double") * F.sum("v").cast("double")
        ).alias("t_unit"),
    )
    f = d.crossJoin(F.broadcast(m)).select(
        "day",
        F.when(
            F.abs((F.col("v") * F.col("n") - F.col("s")).cast("double")) > F.col("t_unit"), 1
        )
        .otherwise(0)
        .alias("anom"),
    )
    w = Window.orderBy("day")
    l = f.select("anom", F.lag("anom").over(w).alias("prev"))
    c = l.agg(
        F.sum("anom").alias("n_anom"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("anom") == 1) & (F.col("prev") == 1), 1).otherwise(0)).alias(
            "consec"
        ),
        F.sum(F.when(F.col("prev") == 1, 1).otherwise(0)).alias("n_prev_anom"),
    )
    base = F.col("n_anom").cast("double") / F.col("n").cast("double")
    cond = F.col("consec").cast("double") / F.col("n_prev_anom").cast("double")
    return c.select(
        "n_anom",
        "consec",
        F.round(base, 6).alias("base_rate"),
        F.round(cond, 6).alias("p_anom_given_prev"),
        F.round(cond / base, 6).alias("persistence_lift"),
    )


@register("q_llm_cross_source_dups")
def q_llm_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs counted by
    UNORDERED source pair — the provenance map showing which sources
    copy from which (high off-diagonal mass = syndication between
    crawls; diagonal mass = internal templates). The input every
    source-priority dedup policy (q_llm_dedup_provenance) should be
    derived FROM rather than assumed. Exact integer pair counts,
    top-10 source pairs.

    Scale: the pair list is candidate-bounded upstream; the matrix is
    a (source × source) rollup — provenance analytics at pair grain."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b").select(
        F.least("sa", "sb").alias("source_x"),
        F.greatest("sa", "sb").alias("source_y"),
    )
    g = j.groupBy("source_x", "source_y").agg(F.count(F.lit(1)).alias("n_pairs"))
    total = g.agg(F.sum("n_pairs").alias("tot"))
    return (
        g.crossJoin(F.broadcast(total))
        .select(
            "source_x",
            "source_y",
            "n_pairs",
            F.round(F.col("n_pairs").cast("double") / F.col("tot").cast("double"), 6).alias(
                "pair_share"
            ),
            F.when(F.col("source_x") == F.col("source_y"), 1).otherwise(0).cast("long").alias(
                "is_internal"
            ),
        )
        .orderBy(F.desc("n_pairs"), "source_x", "source_y")
        .limit(10)
    )


set_oracle("q_llm_cross_source_dups", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
j AS (
  SELECT LEAST(da.source, db.source) AS source_x,
         GREATEST(da.source, db.source) AS source_y
  FROM pairs
  JOIN documents da ON da.doc_id = pairs.doc_a
  JOIN documents db ON db.doc_id = pairs.doc_b),
g AS (
  SELECT source_x, source_y, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM j GROUP BY source_x, source_y),
total AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tot FROM g)
SELECT g.source_x, g.source_y, g.n_pairs,
       ROUND(CAST(g.n_pairs AS DOUBLE) / CAST(total.tot AS DOUBLE), 6)
           AS pair_share,
       CAST(CASE WHEN g.source_x = g.source_y THEN 1 ELSE 0 END AS BIGINT)
           AS is_internal
FROM g CROSS JOIN total
ORDER BY g.n_pairs DESC, g.source_x, g.source_y LIMIT 10
""")
