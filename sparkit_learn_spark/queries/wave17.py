"""Round-6 wave 17: cumulative unique-user growth, an exactly-oracled
k-means E-step (nearest-centroid assignment over embeddings), and
curriculum ordering (quality-banded, hash-shuffled batch layout for
training). All DuckDB-oracled with deterministic ranking cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_cumulative_users",
    oracle="""
    WITH fs AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id),
    d AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM fs GROUP BY 1)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM d
    """,
)
def q_evt_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique-user growth curve: each user counted once on
    their first active day, then a running total — the exact
    'registered users over time' metric, computed WITHOUT a windowed
    distinct (first-seen reduction makes the cumulative a plain sum).

    Scale: min-per-user is a map-side-combining aggregate; the running
    sum runs over day grain (~dimension-sized). This first-seen
    reduction is the standard rewrite that turns 'cumulative distinct'
    — quadratic if done naively — into two linear aggregations."""
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    d = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    return d.select(
        "day",
        "new_users",
        F.sum("new_users").over(Window.orderBy("day")).alias("cum_users"),
    )


@register(
    "q_ml_centroid_assign",
    oracle="""
    WITH seeds AS (
        SELECT vec_id AS cid, embedding AS c_emb FROM embeddings
        WHERE vec_id < 8),
    sims AS (
        SELECT e.vec_id, s.cid,
               ROUND(list_sum(list_transform(list_zip(e.embedding, s.c_emb),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)
                   AS sim
        FROM embeddings e CROSS JOIN seeds s),
    a AS (
        SELECT vec_id, cid, sim,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cid) AS rn
        FROM sims)
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_assigned,
           ROUND(AVG(sim), 6) AS avg_sim
    FROM a WHERE rn = 1
    GROUP BY cid
    """,
)
def q_ml_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step, exactly oracled: assign every embedding to its
    nearest of 8 seed centroids (the first 8 vectors, so both engines
    share identical float32 centroid values; unit-norm ⇒ cosine ≡
    dot). Similarities are rounded BEFORE the argmax (centroid-id
    tie-break), so the assignment is engine-deterministic — the
    float-boundary discipline the iterative q_ml_kmeans (rows-only,
    sklearn-oracled) cannot give its intermediate steps.

    Scale: centroids broadcast (k·dim floats); one fan-out of k dots
    per vector computed JVM-side (zip_with + ordered fold matches
    DuckDB list_sum order), one keyed window at (vector, k) grain,
    one k-row aggregate — the per-iteration shape of distributed
    k-means at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding",
            "c_emb",
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cid", F.round(dot, 6).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
    a = sims.select("vec_id", "cid", "sim", F.row_number().over(w).alias("rn"))
    return (
        a.filter(F.col("rn") == 1)
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_assigned"),
            F.round(F.avg("sim"), 6).alias("avg_sim"),
        )
    )


@register(
    "q_llm_curriculum",
    oracle="""
    WITH q AS (
        SELECT doc_id,
               ROUND(len(list_distinct(string_split(text, ' ')))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
                   AS quality
        FROM documents
        WHERE len(string_split(text, ' ')) >= 1),
    r AS (
        SELECT doc_id, quality,
               ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM q),
    b AS (
        SELECT doc_id, quality,
               CAST((rn - 1) * 10 // n AS BIGINT) AS band
        FROM r)
    SELECT doc_id, quality, band,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY band
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
               AS BIGINT) AS pos_in_band
    FROM b
    """,
)
def q_llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: documents ranked by a quality proxy
    (unique-token ratio, rounded before ranking with doc_id
    tie-break), cut into 10 equal-count bands (easy→hard), then
    deterministically shuffled WITHIN each band by a portable
    multiplicative hash — the 'sorted between batches, shuffled within'
    layout curriculum training wants, reproducible across engines and
    runs.

    Scale: quality is row-local; banding is a rank over the corpus
    (at 100 TB: replace ROW_NUMBER banding with quantile cutpoints
    from q_llm_length_quantiles-style histogram crossing to avoid the
    global sort); the in-band shuffle is hash arithmetic, no RNG
    state. Complements q_llm_global_shuffle (unbanded) and
    q_llm_pack_sequences (batch packing)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    q = d.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks))
            / F.size(toks).cast("double"),
            6,
        ).alias("quality"),
    ).filter(F.size(toks) >= 1)
    wr = Window.orderBy(F.col("quality").desc(), "doc_id")
    r = q.select(
        "doc_id",
        "quality",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    b = r.select(
        "doc_id",
        "quality",
        F.floor((F.col("rn") - 1) * 10 / F.col("n")).cast("long").alias("band"),
    )
    wb = Window.partitionBy("band").orderBy(
        (F.col("doc_id") * 2654435761) % 4294967296, "doc_id"
    )
    return b.select(
        "doc_id",
        "quality",
        "band",
        F.row_number().over(wb).cast("long").alias("pos_in_band"),
    )
