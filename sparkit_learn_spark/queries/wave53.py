"""Round-6 wave 53: budget-constrained corpus selection (greedy
quality-per-token knapsack), label-noise audit (kNN-majority
disagreement), and a temporal anti-join (purchases with no preceding
view — attribution orphans). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_budget_select",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS toks,
               CAST(ROUND(1e6
                    * len(list_distinct(string_split(text, ' ')))
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
                    AS BIGINT) AS quality_u
        FROM documents
        WHERE len(string_split(text, ' ')) >= 1),
    ranked AS (
        SELECT doc_id, source, toks, quality_u,
               SUM(toks) OVER (ORDER BY quality_u DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_toks
        FROM scored),
    sel AS (
        SELECT source, toks, quality_u,
               CASE WHEN cum_toks <= 100000 THEN 1 ELSE 0 END
                   AS selected
        FROM ranked)
    SELECT source, CAST(selected AS BIGINT) AS selected,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS tokens,
           ROUND(SUM(quality_u) / COUNT(*) / 1e6, 6) AS avg_quality
    FROM sel GROUP BY source, selected
    """,
)
def q_llm_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection: documents ranked by a
    quality proxy (unique-token ratio, micro-quantized) and greedily
    taken until a 100k-token budget fills — the knapsack-greedy rule
    (optimal when value density is the rank key) behind 'best N
    tokens for this training run'. Reports per (source, selected)
    cell counts, token mass, and mean quality, exposing which sources
    the budget squeezes out. The cumulative cutoff is an integer
    comparison over an exact running token sum; ranking rounds before
    ordering with an id tie-break.

    Scale: score is row-local; the cumulative-sum rank is the one
    global ordered window — at 100 TB band by quality histogram and
    take whole bands until the budget boundary band, exactly the
    gains/lift rewrite; selection flag then needs no global order."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("toks"),
        F.round(
            1e6
            * F.size(F.array_distinct(toks))
            / F.size(toks).cast("double")
        )
        .cast("long")
        .alias("quality_u"),
    ).filter(F.col("toks") >= 1)
    w = Window.orderBy(F.col("quality_u").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sel = scored.select(
        "source",
        "toks",
        "quality_u",
        F.when(F.sum("toks").over(w) <= 100000, 1)
        .otherwise(0)
        .alias("selected"),
    )
    return sel.groupBy(
        "source", F.col("selected").cast("long").alias("selected")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("tokens"),
        F.round(F.sum("quality_u") / F.count("*") / 1e6, 6).alias(
            "avg_quality"
        ),
    )


@register(
    "q_ml_label_noise",
    oracle="""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < 500 AND vec_id % 10 = 0),
    sims AS (
        SELECT q.vec_id AS qid, q.label AS own_label,
               c.label AS c_label, c.vec_id AS cid,
               ROUND(list_sum(list_transform(
                     list_zip(q.embedding, c.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                     6) AS sim
        FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
    topk AS (
        SELECT qid, own_label, c_label
        FROM (SELECT qid, own_label, c_label,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, cid) AS rn
              FROM sims)
        WHERE rn <= 10),
    votes AS (
        SELECT qid, own_label, c_label,
               CAST(COUNT(*) AS BIGINT) AS votes,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY COUNT(*) DESC, c_label)
                   AS vr
        FROM topk GROUP BY qid, own_label, c_label),
    own_votes AS (
        SELECT qid, CAST(SUM(CASE WHEN c_label = own_label
                                  THEN votes ELSE 0 END) AS BIGINT)
            AS own_n
        FROM votes GROUP BY qid)
    SELECT v.qid, CAST(v.own_label AS BIGINT) AS own_label,
           CAST(v.c_label AS BIGINT) AS majority_label,
           v.votes AS majority_votes,
           COALESCE(o.own_n, 0) AS own_label_votes
    FROM votes v JOIN own_votes o ON o.qid = v.qid
    WHERE v.vr = 1 AND v.c_label <> v.own_label
      AND v.votes >= 2 * COALESCE(o.own_n, 0) + 2
    """,
)
def q_ml_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit (confident-learning style): panel items
    whose 10 nearest neighbors vote STRONGLY for a different label
    than their own (majority ≥ 2·own + 2, an integer margin — no
    float confidence threshold) — the candidates a data-centric
    relabeling pass reviews first; mislabeled anchors silently poison
    both retrieval eval and contrastive training. Deterministic
    ranking and voting as q_ml_knn_classifier.

    Scale: fixed panel broadcasts against the corpus; voting and the
    margin test run at (query, label) grain. For full-corpus noise
    screening swap the exhaustive ranking for the ANN candidate
    route — the margin contract is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") < 500) & (F.col("vec_id") % 10 == 0)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("own_label"),
    )
    dot = F.aggregate(
        F.zip_with(
            "q_emb", "embedding", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = emb.join(F.broadcast(q), emb.vec_id != q.qid).select(
        "qid",
        "own_label",
        F.col("label").alias("c_label"),
        F.col("vec_id").alias("cid"),
        F.round(dot, 6).alias("sim"),
    )
    wk = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
    topk = sims.select("*", F.row_number().over(wk).alias("rn")).filter(
        F.col("rn") <= 10
    )
    votes = topk.groupBy("qid", "own_label", "c_label").agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(F.col("votes").desc(), "c_label")
    ranked = votes.select("*", F.row_number().over(wv).alias("vr"))
    own = votes.groupBy("qid").agg(
        F.sum(
            F.when(F.col("c_label") == F.col("own_label"), F.col("votes"))
            .otherwise(0)
        ).alias("own_n")
    )
    return (
        ranked.filter(F.col("vr") == 1)
        .join(own, "qid")
        .filter(
            (F.col("c_label") != F.col("own_label"))
            & (F.col("votes") >= 2 * F.coalesce("own_n", F.lit(0)) + 2)
        )
        .select(
            "qid",
            F.col("own_label").cast("long").alias("own_label"),
            F.col("c_label").cast("long").alias("majority_label"),
            F.col("votes").alias("majority_votes"),
            F.coalesce("own_n", F.lit(0)).alias("own_label_votes"),
        )
    )


@register(
    "q_evt_unattributed_purchases",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hb
        FROM events WHERE event_type = 'purchase'),
    v AS (
        SELECT user_id, ts,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hb
        FROM events WHERE event_type = 'view'),
    attributed AS (
        SELECT DISTINCT p.event_id
        FROM p JOIN v ON v.user_id = p.user_id
                     AND v.hb BETWEEN p.hb - 1 AND p.hb
                     AND v.ts < p.ts
                     AND v.ts >= p.ts - INTERVAL 1 HOUR),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM p)
    SELECT t.n_purchases,
           t.n_purchases - (SELECT CAST(COUNT(*) AS BIGINT)
                            FROM attributed) AS n_unattributed,
           ROUND((t.n_purchases - (SELECT COUNT(*) FROM attributed))
                 / CAST(t.n_purchases AS DOUBLE), 6)
               AS unattributed_rate
    FROM tot t
    """,
)
def q_evt_unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal anti-join: purchases with NO view by the same user in
    the preceding hour — the attribution orphans that break
    last-touch models (dark-social entry, tracking loss, bots). The
    NOT-EXISTS-within-window compiles to a bucketed candidate join
    (hour buckets bound the pair search exactly as the interval-join
    rewrite) followed by a distinct/anti count — never an
    event×event theta join.

    Scale: both sides bucket to (user, hour) before joining; each
    purchase meets only its own and the previous hour's views for
    that user — O(events within window) candidates; the anti side is
    a count difference, no second scan."""
    e = load_table(spark, sf_dir, "events")
    hb = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        hb.alias("phb"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
        hb.alias("vhb"),
    )
    attributed = (
        p.join(
            v,
            (F.col("vu") == F.col("pu"))
            & (F.col("vhb") >= F.col("phb") - 1)
            & (F.col("vhb") <= F.col("phb"))
            & (F.col("vts") < F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("interval 1 hour")),
        )
        .select("event_id")
        .distinct()
        .agg(F.count("*").alias("n_attributed"))
    )
    tot = p.agg(F.count("*").alias("n_purchases"))
    return tot.crossJoin(F.broadcast(attributed)).select(
        "n_purchases",
        (F.col("n_purchases") - F.col("n_attributed")).alias(
            "n_unattributed"
        ),
        F.round(
            (F.col("n_purchases") - F.col("n_attributed"))
            / F.col("n_purchases").cast("double"),
            6,
        ).alias("unattributed_rate"),
    )
