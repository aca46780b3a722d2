"""Round-6 wave 29: information-theoretic column profiling (mutual
information / NMI / Cramér's V per categorical pair), a
duplicate-cluster-aware leakage-safe train/test split, and
reciprocal-rank-fusion hybrid retrieval — all with per-cell terms
quantized to integer micro-units so distributed summation is exact
and order-free. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_H = "(({k} * 2654435761) % 4294967296) % 100"


def _mi_pair_sql(table: str, x: str, y: str) -> str:
    """One UNION-ALL branch of the mutual-information oracle: exact
    joint/marginal counts, each transcendental cell term rounded to an
    integer micro-unit before the (order-free) sum."""
    return f"""
    (WITH joint AS (
        SELECT COALESCE(CAST({x} AS VARCHAR), '␀') AS vx,
               COALESCE(CAST({y} AS VARCHAR), '␀') AS vy,
               CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM {table} GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM joint),
    mx AS (SELECT vx, CAST(SUM(n_xy) AS BIGINT) AS nx
           FROM joint GROUP BY 1),
    my AS (SELECT vy, CAST(SUM(n_xy) AS BIGINT) AS ny
           FROM joint GROUP BY 1),
    cells AS (
        SELECT CAST(ROUND(1e9 * (j.n_xy / CAST(t.n AS DOUBLE))
                    * LN((t.n * CAST(j.n_xy AS DOUBLE))
                         / (mx.nx * CAST(my.ny AS DOUBLE))))
               AS BIGINT) AS mi_u,
               CAST(ROUND(1e6
                    * (j.n_xy - mx.nx * CAST(my.ny AS DOUBLE) / t.n)
                    * (j.n_xy - mx.nx * CAST(my.ny AS DOUBLE) / t.n)
                    / (mx.nx * CAST(my.ny AS DOUBLE) / t.n))
               AS BIGINT) AS chi_u
        FROM joint j JOIN mx USING (vx) JOIN my USING (vy)
        CROSS JOIN tot t),
    hx AS (SELECT CAST(SUM(CAST(ROUND(-1e9 * (nx / CAST(t.n AS DOUBLE))
                        * LN(nx / CAST(t.n AS DOUBLE))) AS BIGINT))
               AS BIGINT) AS hx_u,
                  CAST(COUNT(*) AS BIGINT) AS r
           FROM mx CROSS JOIN tot t),
    hy AS (SELECT CAST(SUM(CAST(ROUND(-1e9 * (ny / CAST(t.n AS DOUBLE))
                        * LN(ny / CAST(t.n AS DOUBLE))) AS BIGINT))
               AS BIGINT) AS hy_u,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM my CROSS JOIN tot t)
    SELECT '{table}.{x}x{y}' AS pair,
           t.n AS n_rows, hx.r AS n_x, hy.c AS n_y,
           ROUND(s.mi_su / 1e9, 6) AS mi,
           ROUND(s.mi_su / SQRT(CAST(hx.hx_u AS DOUBLE) * hy.hy_u), 6)
               AS nmi,
           ROUND(SQRT((s.chi_su / 1e6)
                      / (t.n * CAST(LEAST(hx.r, hy.c) - 1 AS DOUBLE))),
                 6) AS cramers_v
    FROM (SELECT CAST(SUM(mi_u) AS BIGINT) AS mi_su,
                 CAST(SUM(chi_u) AS BIGINT) AS chi_su FROM cells) s
    CROSS JOIN tot t CROSS JOIN hx CROSS JOIN hy)
    """


def _mi_pair_df(df: DataFrame, table: str, x: str, y: str) -> DataFrame:
    joint = (
        df.select(
            F.coalesce(F.col(x).cast("string"), F.lit("␀")).alias("vx"),
            F.coalesce(F.col(y).cast("string"), F.lit("␀")).alias("vy"),
        )
        .groupBy("vx", "vy")
        .agg(F.count("*").alias("n_xy"))
    )
    tot = joint.agg(F.sum("n_xy").alias("n"))
    mx = joint.groupBy("vx").agg(F.sum("n_xy").alias("nx"))
    my = joint.groupBy("vy").agg(F.sum("n_xy").alias("ny"))
    nd = F.col("n").cast("double")
    cells = (
        joint.join(F.broadcast(mx), "vx")
        .join(F.broadcast(my), "vy")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("nx") * F.col("ny").cast("double") / F.col("n")
    cells = cells.select(
        F.round(
            1e9
            * (F.col("n_xy") / nd)
            * F.log(
                (F.col("n") * F.col("n_xy").cast("double"))
                / (F.col("nx") * F.col("ny").cast("double"))
            )
        )
        .cast("long")
        .alias("mi_u"),
        F.round(
            1e6 * (F.col("n_xy") - e) * (F.col("n_xy") - e) / e
        )
        .cast("long")
        .alias("chi_u"),
    )
    s = cells.agg(
        F.sum("mi_u").alias("mi_su"), F.sum("chi_u").alias("chi_su")
    )
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -1e9 * (F.col("nx") / nd) * F.log(F.col("nx") / nd)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").alias("hx_u"), F.count("*").alias("r"))
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -1e9 * (F.col("ny") / nd) * F.log(F.col("ny") / nd)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").alias("hy_u"), F.count("*").alias("c"))
    )
    out = (
        s.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
    )
    return out.select(
        F.lit(f"{table}.{x}x{y}").alias("pair"),
        F.col("n").alias("n_rows"),
        F.col("r").alias("n_x"),
        F.col("c").alias("n_y"),
        F.round(F.col("mi_su") / 1e9, 6).alias("mi"),
        F.round(
            F.col("mi_su")
            / F.sqrt(F.col("hx_u").cast("double") * F.col("hy_u")),
            6,
        ).alias("nmi"),
        F.round(
            F.sqrt(
                (F.col("chi_su") / 1e6)
                / (
                    F.col("n")
                    * (F.least("r", "c") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "q_stat_mutual_info",
    oracle=_mi_pair_sql("documents", "lang", "source")
    + " UNION ALL "
    + _mi_pair_sql("orders", "o_orderpriority", "o_orderstatus"),
)
def q_stat_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence profile per column pair: mutual
    information, normalized MI (sqrt-entropy norm), and Cramér's V —
    the feature-selection / redundancy triage every catalog profiler
    runs over candidate columns. Joint and marginal counts are exact
    integers; every transcendental cell term is rounded to an integer
    micro-unit BEFORE summation, so the distributed sum is exact and
    order-free, and one final double step produces each statistic.

    Scale: per pair one joint count at (x,y) grain (map-side
    combining) then cell-grain arithmetic — cost is distinct-pair
    cardinality, not rows; marginals broadcast. Pairs are independent
    and embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    o = load_table(spark, sf_dir, "orders")
    return _mi_pair_df(d, "documents", "lang", "source").unionByName(
        _mi_pair_df(o, "orders", "o_orderpriority", "o_orderstatus")
    )


@register(
    "q_llm_leakage_safe_split",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, sha256(lower(trim(text))) AS text_sha
        FROM documents),
    grp AS (
        SELECT text_sha, MIN(doc_id) AS rep_id,
               CAST(COUNT(*) AS BIGINT) AS grp_sz,
               CAST(COUNT(DISTINCT CASE WHEN {_H.format(k='doc_id')} < 80
                                        THEN 'train' ELSE 'test' END)
                    AS BIGINT) AS naive_sides
        FROM hashed GROUP BY text_sha),
    leak AS (
        SELECT CAST(SUM(CASE WHEN grp_sz > 1 AND naive_sides = 2
                             THEN 1 ELSE 0 END) AS BIGINT)
            AS naive_leaky_groups
        FROM grp),
    assigned AS (
        SELECT h.doc_id, g.grp_sz,
               CASE WHEN {_H.format(k='g.rep_id')} < 80
                    THEN 'train' ELSE 'test' END AS split
        FROM hashed h JOIN grp g USING (text_sha))
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT a.doc_id) AS BIGINT) AS n_docs_distinct,
           CAST(SUM(CASE WHEN a.grp_sz > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           l.naive_leaky_groups
    FROM assigned a CROSS JOIN leak l
    GROUP BY a.split, l.naive_leaky_groups
    """,
)
def q_llm_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster-aware train/test split: exact-duplicate
    groups (sha256 of normalized text) are assigned to a side AS A
    UNIT by a portable hash of the group representative, so no
    duplicated content ever straddles the eval boundary — the
    contamination rule q_ml_train_test_split's per-row hash violates.
    Also measures that violation: naive_leaky_groups counts the
    multi-doc groups the per-row split would have torn across sides.

    Scale: one shuffle on the 32-byte digest (never the text), group
    decisions are O(groups), and the assignment joins digest→side at
    digest grain — the same profile as exact dedup; extend to
    near-dup clusters by swapping the digest for the connected-
    component id from q_llm_dedup_clusters."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", F.sha2(F.lower(F.trim("text")), 256).alias("text_sha")
    )
    naive = F.when(
        F.expr(_H.format(k="doc_id")) < 80, "train"
    ).otherwise("test")
    grp = hashed.groupBy("text_sha").agg(
        F.min("doc_id").alias("rep_id"),
        F.count("*").alias("grp_sz"),
        F.countDistinct(naive).alias("naive_sides"),
    )
    leak = grp.agg(
        F.sum(
            F.when((F.col("grp_sz") > 1) & (F.col("naive_sides") == 2), 1)
            .otherwise(0)
        ).alias("naive_leaky_groups")
    )
    assigned = hashed.join(
        grp.select(
            "text_sha",
            "grp_sz",
            F.when(F.expr(_H.format(k="rep_id")) < 80, "train")
            .otherwise("test")
            .alias("split"),
        ),
        "text_sha",
    )
    return (
        assigned.crossJoin(F.broadcast(leak))
        .groupBy("split", "naive_leaky_groups")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("doc_id").alias("n_docs_distinct"),
            F.sum(F.when(F.col("grp_sz") > 1, 1).otherwise(0)).alias(
                "n_dup_docs"
            ),
        )
        .select(
            "split",
            "n_docs",
            "n_docs_distinct",
            "n_dup_docs",
            "naive_leaky_groups",
        )
    )


@register(
    "q_llm_rrf_fusion",
    oracle="""
    WITH q AS (
        SELECT e.vec_id AS qid, e.embedding AS q_emb,
               d.n_chars AS q_len
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        WHERE e.vec_id < 500 AND e.vec_id % 10 = 0),
    cand AS (
        SELECT q.qid, e.vec_id AS cid,
               ROUND(list_sum(list_transform(
                     list_zip(q.q_emb, e.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                     6) AS sim,
               ABS(d.n_chars - q.q_len) AS len_gap
        FROM q JOIN embeddings e ON e.vec_id <> q.qid
        JOIN documents d ON d.doc_id = e.vec_id),
    ranked AS (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, cid) AS r1,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY len_gap, cid) AS r2
        FROM cand),
    fused AS (
        SELECT qid, cid,
               CAST(ROUND(1e9 / (60 + r1)) AS BIGINT)
                 + CAST(ROUND(1e9 / (60 + r2)) AS BIGINT) AS rrf_micro
        FROM ranked),
    top AS (
        SELECT qid, cid, rrf_micro,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY rrf_micro DESC, cid)
                   AS fused_rank
        FROM fused)
    SELECT qid, cid, rrf_micro, fused_rank
    FROM top WHERE fused_rank <= 3
    """,
)
def q_llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion: for each fixed-panel query, two
    independent rankings of the corpus — dense (cosine similarity)
    and a lexical-proxy signal (document-length proximity) — combined
    by Reciprocal Rank Fusion, score = Σ 1/(60+rank), the standard
    trick RAG stacks use to merge vector and keyword search without
    score calibration. RRF terms are quantized to integer micro-units
    so the fused score is exact; top-3 per query.

    Scale: the panel broadcasts against the corpus (linear in data);
    each ranking is one window over the panel-keyed slice and the
    fusion is rank-space arithmetic — at 100 TB feed it the top-k
    lists from the ANN index and the inverted index instead of the
    exhaustive rankings; the fusion step is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    q = (
        emb.filter((F.col("vec_id") < 500) & (F.col("vec_id") % 10 == 0))
        .join(docs, emb.vec_id == docs.doc_id)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("q_emb"),
            F.col("n_chars").alias("q_len"),
        )
    )
    # r11: sims via one BLAS matmul per Arrow batch (panel_all_sims)
    # instead of the broadcast nested-loop + interpreted per-pair
    # lambda; n_chars rides as corpus payload, q_len joins back from
    # the 50-row panel broadcast. Same 6dp-rounded doubles (verified
    # vs the DuckDB oracle at sf0.001/0.01/0.1).
    from ..operators.similarity import panel_all_sims

    corpus = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "vec_id", "embedding", "n_chars"
    )
    cand = (
        panel_all_sims(
            corpus, q.select("qid", "q_emb"), payload_cols=["n_chars"]
        )
        .join(F.broadcast(q.select("qid", "q_len")), "qid")
        .select(
            "qid",
            "cid",
            "sim",
            F.abs(F.col("n_chars") - F.col("q_len")).alias("len_gap"),
        )
    )
    w1 = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
    w2 = Window.partitionBy("qid").orderBy("len_gap", "cid")
    fused = cand.select(
        "qid",
        "cid",
        (
            F.round(1e9 / (60 + F.row_number().over(w1))).cast("long")
            + F.round(1e9 / (60 + F.row_number().over(w2))).cast("long")
        ).alias("rrf_micro"),
    )
    wf = Window.partitionBy("qid").orderBy(F.col("rrf_micro").desc(), "cid")
    return (
        fused.select(
            "qid", "cid", "rrf_micro", F.row_number().over(wf).alias("fused_rank")
        )
        .filter(F.col("fused_rank") <= 3)
    )
