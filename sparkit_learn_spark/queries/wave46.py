"""Round-6 wave 46: embedding isotropy audit (mean pairwise cosine on
the fixed panel), day-of-week × hour activity heatmap, and term
burstiness (variance-to-mean ratio of per-document counts). All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_embedding_isotropy",
    oracle="""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id < 500 AND vec_id % 10 = 0),
    pairs AS (
        SELECT CAST(ROUND(1e6 * list_sum(list_transform(
                   list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))
               AS BIGINT) AS cos_u
        FROM q a JOIN q b ON b.vec_id > a.vec_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(cos_u) / COUNT(*) / 1e6, 6) AS mean_cosine,
           ROUND(SUM(CASE WHEN cos_u > 500000 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS frac_above_half
    FROM pairs
    """,
)
def q_ml_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit: the mean pairwise cosine over the
    fixed panel (and the share of pairs above 0.5) — an isotropic,
    well-spread embedding space averages near zero; a collapsed or
    anisotropic one (the common failure after contrastive training
    goes wrong) averages high, which silently inflates every
    cosine-threshold dedup and ANN recall number downstream. Each
    pairwise cosine quantizes to integer micro-units so the mean is
    an exact integer sum.

    Scale: pairwise ON THE FIXED PANEL only (50×49/2 pairs regardless
    of corpus size) — the estimator is a bounded probe, never an
    all-pairs corpus join; grow confidence by widening the panel,
    not the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") < 500) & (F.col("vec_id") % 10 == 0)
    ).select("vec_id", "embedding")
    a = q.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = q.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(F.broadcast(b), F.col("ib") > F.col("ia")).select(
        F.round(1e6 * dot).cast("long").alias("cos_u")
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum("cos_u") / F.count("*") / 1e6, 6).alias("mean_cosine"),
        F.round(
            F.sum(F.when(F.col("cos_u") > 500000, 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("frac_above_half"),
    )


@register(
    "q_evt_activity_heatmap",
    oracle="""
    SELECT isodow(ts) AS dow,
           CAST(hour(ts) AS BIGINT) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_evt_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap: event and distinct-user
    counts at the 7×24 calendar grid — the ops view that surfaces
    weekly rhythm, quiet deploy windows, and anomalous off-hours
    load in one glance, and the grain capacity planning bins by.
    ISO weekday in both engines; exact integers.

    Scale: one aggregate at a 168-cell grain with map-side combining
    (the distinct-user count shuffles (cell, user) pairs once) —
    cost is a COUNT DISTINCT, output is constant-sized."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        (F.weekday("ts") + 1).alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_llm_term_burstiness",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM t),
    tf AS (
        SELECT doc_id, u.tok AS term, CAST(COUNT(*) AS BIGINT) AS c
        FROM t, unnest(toks) AS u(tok)
        GROUP BY doc_id, u.tok),
    m AS (
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM tf GROUP BY term),
    stats AS (
        SELECT m.term, m.df, m.s1,
               s1 / CAST(n.n_docs AS DOUBLE) AS mu,
               s2 / CAST(n.n_docs AS DOUBLE)
                 - (s1 / CAST(n.n_docs AS DOUBLE))
                   * (s1 / CAST(n.n_docs AS DOUBLE)) AS var
        FROM m CROSS JOIN n
        WHERE m.df >= 50)
    SELECT term, df, s1 AS total_count,
           ROUND(var / mu, 6) AS burstiness_vmr
    FROM stats
    """,
)
def q_llm_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: the variance-to-mean ratio of each frequent
    term's per-document count, with absent documents counted as zero
    (moments over the full corpus denominator) — VMR ≈ 1 is
    Poisson-like function-word behavior, VMR ≫ 1 marks content/topic
    terms that 'burst' in few documents; the Church–Gale diagnostic
    behind stopword induction and term weighting. Count moments are
    exact integers; the zero-count mass enters through the corpus-N
    denominator without materializing zeros.

    Scale: (doc, term) counts aggregate map-side from the exploded
    stream, term moments at vocabulary grain, df floor bounds the
    output — no joins beyond the one-row corpus count."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    n = t.agg(F.count("*").alias("n_docs"))
    tf = (
        t.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    m = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    nd = F.col("n_docs").cast("double")
    mu = F.col("s1") / nd
    var = F.col("s2") / nd - mu * mu
    return (
        m.crossJoin(F.broadcast(n))
        .filter(F.col("df") >= 50)
        .select(
            "term",
            "df",
            F.col("s1").alias("total_count"),
            F.round(var / mu, 6).alias("burstiness_vmr"),
        )
    )
