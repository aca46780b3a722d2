"""LLM-data-pipeline operators, part 7: embedding-space quality
filtering — per-class centroid similarity and outlier flagging, the
SemDeDup/CLIP-filtering-style step a training pipeline runs between
dedup and sampling (Abbas et al. 2023 "SemDeDup" applies within-
cluster similarity; here the clusters are the given labels, which
makes the operator exactly SQL-oracle-able instead of rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: How many most-atypical vectors to surface per label.
OUTLIERS_PER_LABEL = 5


@register(
    "q_llm_embed_outliers",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             CAST(unnest(embedding) AS DOUBLE) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS (
      SELECT label, pos, AVG(val) AS c FROM e GROUP BY label, pos
    ),
    cnorm AS (
      SELECT label, SQRT(SUM(c * c)) AS nc FROM cent GROUP BY label
    ),
    per AS (
      SELECT e.vec_id, e.label,
             SUM(e.val * cent.c)      AS dot,
             SQRT(SUM(e.val * e.val)) AS nv
      FROM e JOIN cent ON e.label = cent.label AND e.pos = cent.pos
      GROUP BY e.vec_id, e.label
    ),
    sims AS (
      SELECT per.vec_id, per.label,
             ROUND(per.dot / (per.nv * cnorm.nc), 6) AS sim
      FROM per JOIN cnorm ON per.label = cnorm.label
    )
    SELECT vec_id, label, sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT vec_id, label, sim,
             row_number() OVER (PARTITION BY label
                                ORDER BY sim, vec_id) AS rn
      FROM sims
    )
    WHERE rn <= {OUTLIERS_PER_LABEL}
    ORDER BY label, rn
    """,
)
def q_llm_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier filter: cosine of every vector to its label's
    centroid; surface the {OUTLIERS_PER_LABEL} least-typical vectors
    per label — the "drop mislabeled / off-distribution examples"
    step of an embedding-curated training pipeline. Similarity is
    rounded to 6dp BEFORE ranking with a vec_id tiebreak (the repo's
    standard determinism contract for float-ordered output).

    Scale: entirely JVM-side — posexplode (a generate, no shuffle) to
    (label, pos, val); ONE shuffle on (label, pos) produces centroid
    components (n_labels × dim rows — tiny, broadcast back); the dot
    and norm fold into ONE aggregation per vec_id (shuffle on vec_id,
    map-combined). No vector ever crosses the wire twice and nothing
    is collected: at 100 TB the cost is two passes over the exploded
    fact, both with partial aggregation. Centroid means of integral-
    exponent floats can differ in the last ulp across engines'
    summation orders — the 6dp round absorbs that (same contract as
    every cosine query here)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "label",
            F.posexplode(F.transform("embedding",
                                     lambda x: x.cast("double")))
            .alias("pos0", "val"),
        )
        # DuckDB subscripts are 1-based; align so the join keys match
        .withColumn("pos", F.col("pos0") + 1)
        .drop("pos0")
    )
    cent = e.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"))
    per = (
        e.join(F.broadcast(cent.withColumnRenamed("label", "cl")),
               (F.col("label") == F.col("cl")) & (e.pos == cent.pos))
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nv"),
        )
    )
    sims = (
        per.join(F.broadcast(cnorm.withColumnRenamed("label", "nl")),
                 F.col("label") == F.col("nl"))
        .select("vec_id", "label",
                F.round(F.col("dot") / (F.col("nv") * F.col("nc")), 6)
                .alias("sim"))
    )
    w = Window.partitionBy("label").orderBy("sim", "vec_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= OUTLIERS_PER_LABEL)
        .orderBy("label", "rn")
    )
