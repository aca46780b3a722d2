"""Round-6 wave 26: foreign-key inference (inclusion-coefficient
profiling across candidate column pairs) and hard-negative mining for
retrieval training (top-1 cross-label cosine neighbor per query).
Both exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_dq_fk_inference",
    oracle="""
    WITH li_o AS (
        SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS candidate,
               (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                FROM lineitem) AS n_child,
               (SELECT CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT)
                FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
                JOIN orders o ON o.o_orderkey = l.l_orderkey) AS n_contained),
    li_p AS (
        SELECT 'lineitem.l_partkey->part.p_partkey',
               (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
                FROM lineitem),
               (SELECT CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT)
                FROM (SELECT DISTINCT l_partkey FROM lineitem) l
                JOIN part p ON p.p_partkey = l.l_partkey)),
    o_c AS (
        SELECT 'orders.o_custkey->customer.c_custkey',
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                FROM orders),
               (SELECT CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
                FROM (SELECT DISTINCT o_custkey FROM orders) o
                JOIN customer c ON c.c_custkey = o.o_custkey)),
    e_c AS (
        SELECT 'events.user_id->customer.c_custkey',
               (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events),
               (SELECT CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
                FROM (SELECT DISTINCT user_id FROM events) e
                JOIN customer c ON c.c_custkey = e.user_id)),
    u AS (
        SELECT * FROM li_o UNION ALL SELECT * FROM li_p
        UNION ALL SELECT * FROM o_c UNION ALL SELECT * FROM e_c)
    SELECT candidate, n_child, n_contained,
           ROUND(n_contained / CAST(n_child AS DOUBLE), 6) AS inclusion,
           CASE WHEN n_contained = n_child THEN 1 ELSE 0 END AS is_fk
    FROM u
    """,
)
def q_dq_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key inference by inclusion coefficient: for each
    candidate (child column → parent key), the share of the child's
    DISTINCT values present in the parent — 1.0 certifies a valid FK,
    high-but-below-1 flags orphans, low values reject the candidate
    (events.user_id is the deliberate probe: its ids need not all be
    customers). The schema-discovery primitive data catalogs run over
    every plausible column pair; exact integers.

    Scale: each candidate is a distinct-reduce on the child (map-side
    partial dedup) plus a semi-join against the parent KEY SET —
    shuffles key digests, never rows; candidates are independent and
    embarrassingly parallel."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")

    def inclusion(name, child_vals, parent_vals):
        child = child_vals.distinct()
        parent = parent_vals.distinct()
        n_child = child.agg(F.count("*").alias("n_child"))
        contained = child.join(
            parent,
            child[child.columns[0]] == parent[parent.columns[0]],
            "left_semi",
        ).agg(F.count("*").alias("n_contained"))
        return (
            n_child.crossJoin(contained)
            .select(
                F.lit(name).alias("candidate"),
                "n_child",
                "n_contained",
            )
        )

    u = (
        inclusion(
            "lineitem.l_orderkey->orders.o_orderkey",
            li.select("l_orderkey"),
            o.select("o_orderkey"),
        )
        .unionByName(
            inclusion(
                "lineitem.l_partkey->part.p_partkey",
                li.select("l_partkey"),
                p.select("p_partkey"),
            )
        )
        .unionByName(
            inclusion(
                "orders.o_custkey->customer.c_custkey",
                o.select("o_custkey"),
                c.select("c_custkey"),
            )
        )
        .unionByName(
            inclusion(
                "events.user_id->customer.c_custkey",
                e.select("user_id"),
                c.select("c_custkey"),
            )
        )
    )
    return u.select(
        "candidate",
        "n_child",
        "n_contained",
        F.round(F.col("n_contained") / F.col("n_child").cast("double"), 6).alias(
            "inclusion"
        ),
        F.when(F.col("n_contained") == F.col("n_child"), 1)
        .otherwise(0)
        .alias("is_fk"),
    )


@register(
    "q_llm_hard_negatives",
    oracle="""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < 500 AND vec_id % 10 = 0),
    sims AS (
        SELECT q.vec_id AS qid, c.vec_id AS neg_id,
               q.label AS q_label, c.label AS neg_label,
               ROUND(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)
                   AS sim
        FROM q JOIN embeddings c
          ON c.label <> q.label),
    r AS (
        SELECT qid, neg_id, q_label, neg_label, sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, neg_id) AS rn
        FROM sims)
    SELECT qid, neg_id, CAST(q_label AS BIGINT) AS q_label,
           CAST(neg_label AS BIGINT) AS neg_label, sim
    FROM r WHERE rn = 1
    """,
)
def q_llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training: for a FIXED
    50-query panel (ids < 500, every 10th), the single most-similar
    embedding with a DIFFERENT label — the near-miss that makes a contrastive batch
    informative (random negatives are trivially separable).
    Similarities round before ranking with an id tie-break, so the
    chosen negative is engine-deterministic.

    Scale: the FIXED panel (not a %-sample, which would grow the
    query side linearly and make the probe quadratic) broadcasts
    against the corpus — cost is panel × corpus, linear in data; for
    panel-free all-queries mining swap in the sharded brute-force
    (q_llm_cosine_topk_sharded) or IVF candidate route with the same
    round-then-rank output contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") < 500) & (F.col("vec_id") % 10 == 0)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    dot = F.aggregate(
        F.zip_with(
            "q_emb", "embedding", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = (
        emb.join(F.broadcast(q), emb.label != q.q_label)
        .select(
            "qid",
            F.col("vec_id").alias("neg_id"),
            "q_label",
            F.col("label").alias("neg_label"),
            F.round(dot, 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "neg_id")
    return (
        sims.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            "neg_id",
            F.col("q_label").cast("long").alias("q_label"),
            F.col("neg_label").cast("long").alias("neg_label"),
            "sim",
        )
    )
