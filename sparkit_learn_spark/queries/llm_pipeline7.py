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
             -- +0.0: an atypical vector's centroid sim can be a tiny
             -- negative that ROUND lands on -0.0 (the r4 hash-FAIL
             -- class); Spark's BigDecimal round has no signed zero
             ROUND(per.dot / (per.nv * cnorm.nc), 6) + 0.0 AS sim
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

    Scale: one posexplode pass + (label, pos) partial agg builds the
    centroid COMPONENTS (n_labels × dim rows — tiny); they reassemble
    into per-label centroid ARRAYS driver-free (array_agg + sort) and
    broadcast; the fact side is then ONE label-key broadcast join with
    the dot/norms computed per-row by JVM zip_with/aggregate — the
    vectors themselves never explode and never shuffle (the only
    fact-sized exchange is the final per-label rank window, which
    carries (vec_id, label, sim) triples, not vectors). Centroid
    means of floats can differ in the last ulp across engines'
    summation orders — the 6dp round absorbs that (same contract as
    every cosine query here)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    comp = (
        emb.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
    )
    cent = (
        comp.groupBy(F.col("label").alias("cl"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "cl",
            F.transform("pc", lambda s: s["c"]).alias("cvec"),
        )
        .withColumn(
            "nc",
            F.sqrt(F.aggregate(
                "cvec", F.lit(0.0), lambda a, x: a + x * x)),
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "cvec", lambda a, b: a * b),
        F.lit(0.0), lambda a, x: a + x)
    nv = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    sims = (
        emb.join(F.broadcast(cent), F.col("label") == F.col("cl"))
        .select("vec_id", "label",
                F.round(dot / (nv * F.col("nc")), 6).alias("sim"))
    )
    w = Window.partitionBy("label").orderBy("sim", "vec_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= OUTLIERS_PER_LABEL)
        .orderBy("label", "rn")
    )


@register(
    "q_llm_zipf",
    oracle="""
    WITH tf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank
      FROM tf
    )
    SELECT ROUND(regr_slope(LN(freq), LN(rank)), 4)     AS zipf_slope,
           ROUND(regr_intercept(LN(freq), LN(rank)), 4) AS zipf_intercept,
           ROUND(regr_r2(LN(freq), LN(rank)), 6)        AS fit_r2,
           CAST(COUNT(*) AS BIGINT)                     AS n_terms
    FROM ranked
    """,
)
def q_llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit: regress ln(freq) on ln(rank) over the
    corpus vocabulary — slope near −1 is the natural-language
    signature, so a corpus whose slope drifts (template spam, boiler-
    plate floods) fails this health check before training. Rank ties
    break on term so ranking is deterministic cross-engine.

    Scale: term frequencies are one explode + partial/final count
    (vocab-sized output); the regression is a single algebraic
    aggregate pass over that. The row_number ranking IS a global sort
    of the vocabulary — bounded by distinct-term count, not corpus
    size, but at web scale (10⁸+ terms) swap it for the distributed
    rank in operators/ids.stable_sorted_ids (same output contract);
    kept as the window form here to exercise that shape."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("term").agg(F.count("*").alias("freq"))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("freq"), "term")
    ranked = tf.select(
        "freq", F.row_number().over(w).alias("rank"))
    lf, lr = F.log(F.col("freq")), F.log(F.col("rank"))
    return ranked.agg(
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("fit_r2"),
        F.count("*").alias("n_terms"),
    )
