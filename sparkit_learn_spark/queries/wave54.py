"""Round-6 wave 54: graph modularity of the source partition over
the near-dup graph (oracle embeds the jaccard pair CTE), process-
mining conformance rules over per-user event order, and a character-
entropy gibberish filter. All exactly DuckDB-oracled.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle
from .llm_pipeline2 import q_llm_ngram_jaccard


@register("q_graph_modularity")
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the SOURCE partition over the near-dup graph:
    Q = Σ_c (e_c/m − (d_c/2m)²) with within-community edge counts e_c
    and community degree sums d_c — near 0 means duplicates cross
    source boundaries (mirror networks), strongly positive means
    duplication is intra-source (templates) — the one number that
    says whether source-local dedup would have sufficed. Exact
    integer counts; one double expression at the end.

    Scale: edge-grain only — community tags join onto the
    candidate-bounded pair list by doc id (broadcastable dimension),
    degrees via explode+count, and the edge total rides along as a
    broadcast one-row frame (no driver collect); no iteration, no
    all-pairs."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = (
        pairs.join(
            F.broadcast(src.select(F.col("doc_id").alias("doc_a"),
                                   F.col("source").alias("sa"))),
            "doc_a",
        )
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("doc_b"),
                                   F.col("source").alias("sb"))),
            "doc_b",
        )
    )
    m_df = e.agg(F.count("*").alias("m"))
    within = e.groupBy("sa").agg(
        F.sum(F.when(F.col("sa") == F.col("sb"), 1).otherwise(0)).alias(
            "e_within"
        )
    )
    deg = (
        e.select(F.explode(F.array("sa", "sb")).alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("d_c"))
    )
    comm = deg.join(
        within.select(F.col("sa").alias("c"), "e_within"), "c", "left"
    ).select(
        "c",
        F.coalesce("e_within", F.lit(0)).alias("e_c"),
        "d_c",
    )
    agg = comm.agg(
        F.count("*").alias("n_communities"),
        F.sum("e_c").alias("sum_within"),
        F.sum(F.col("d_c") * F.col("d_c")).alias("sum_d2"),
    )
    md = F.col("m").cast("double")
    return agg.crossJoin(F.broadcast(m_df)).select(
        F.col("m").alias("n_edges"),
        "n_communities",
        "sum_within",
        F.round(
            F.col("sum_within") / md
            - F.col("sum_d2") / (4.0 * md * md),
            6,
        ).alias("modularity"),
    )


set_oracle(
    "q_graph_modularity",
    f"""
    WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
    e AS (
        SELECT da.source AS sa, db.source AS sb
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    within AS (
        SELECT sa AS c,
               CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
                   AS e_c
        FROM e GROUP BY sa),
    deg AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS d_c
        FROM (SELECT sa AS c FROM e UNION ALL SELECT sb FROM e)
        GROUP BY c),
    comm AS (
        SELECT d.c, COALESCE(w.e_c, 0) AS e_c, d.d_c
        FROM deg d LEFT JOIN within w ON w.c = d.c)
    SELECT m.m AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(e_c) AS BIGINT) AS sum_within,
           ROUND(SUM(e_c) / CAST(m.m AS DOUBLE)
                 - SUM(d_c * d_c) / (4.0 * m.m * m.m), 6) AS modularity
    FROM comm CROSS JOIN m
    GROUP BY m.m
    """,
)


@register(
    "q_evt_conformance",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS t_buy,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS has_signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_err,
               CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM events GROUP BY user_id),
    rules AS (
        SELECT 'R1_purchase_before_any_view' AS rule,
               CAST(SUM(CASE WHEN t_view IS NOT NULL
                             AND t_buy IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_evaluated,
               CAST(SUM(CASE WHEN t_view IS NOT NULL
                             AND t_buy IS NOT NULL
                             AND t_buy < t_view THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM u
        UNION ALL
        SELECT 'R2_purchase_without_signup',
               CAST(SUM(CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(SUM(CASE WHEN t_buy IS NOT NULL
                             AND has_signup = 0 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM u
        UNION ALL
        SELECT 'R3_error_dominated',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN 2 * n_err > n_ev THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM u)
    SELECT rule, n_evaluated, n_violations,
           ROUND(n_violations / CAST(n_evaluated AS DOUBLE), 6)
               AS violation_rate
    FROM rules
    """,
)
def q_evt_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance: each user's event history checked
    against the expected journey model — R1: a purchase should not
    precede every view; R2: purchasers should have signed up; R3: no
    user should be error-dominated (integer inequality 2·errors >
    events) — with per-rule evaluated/violation counts. The
    conformance-checking step of process mining, reduced to per-user
    aggregates instead of trace alignment. Exact integers throughout.

    Scale: ONE user-grain aggregate computes every rule's per-user
    facts (map-side combining), then three constant-size rollups —
    adding a rule adds a column, not a pass."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("has_signup"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
        F.count("*").alias("n_ev"),
    )
    both = F.col("t_view").isNotNull() & F.col("t_buy").isNotNull()
    r1 = u.agg(
        F.sum(F.when(both, 1).otherwise(0)).alias("n_evaluated"),
        F.sum(
            F.when(both & (F.col("t_buy") < F.col("t_view")), 1).otherwise(0)
        ).alias("n_violations"),
    ).select(
        F.lit("R1_purchase_before_any_view").alias("rule"),
        "n_evaluated",
        "n_violations",
    )
    r2 = u.agg(
        F.sum(F.when(F.col("t_buy").isNotNull(), 1).otherwise(0)).alias(
            "n_evaluated"
        ),
        F.sum(
            F.when(
                F.col("t_buy").isNotNull() & (F.col("has_signup") == 0), 1
            ).otherwise(0)
        ).alias("n_violations"),
    ).select(
        F.lit("R2_purchase_without_signup").alias("rule"),
        "n_evaluated",
        "n_violations",
    )
    r3 = u.agg(
        F.count("*").alias("n_evaluated"),
        F.sum(
            F.when(2 * F.col("n_err") > F.col("n_ev"), 1).otherwise(0)
        ).alias("n_violations"),
    ).select(
        F.lit("R3_error_dominated").alias("rule"),
        "n_evaluated",
        "n_violations",
    )
    return (
        r1.unionByName(r2)
        .unionByName(r3)
        .select(
            "rule",
            "n_evaluated",
            "n_violations",
            F.round(
                F.col("n_violations") / F.col("n_evaluated").cast("double"),
                6,
            ).alias("violation_rate"),
        )
    )


_ALPHABET = list(string.ascii_lowercase) + [" "]
_AB_SQL = ", ".join(f"('{c}')" if c != " " else "(' ')" for c in _ALPHABET)


@register(
    "q_llm_char_entropy",
    oracle=f"""
    WITH ab(ch) AS (VALUES {_AB_SQL}),
    counts AS (
        SELECT d.doc_id, d.source, ab.ch,
               CAST(length(lower(d.text))
                    - length(replace(lower(d.text), ab.ch, ''))
                    AS BIGINT) AS cnt
        FROM documents d CROSS JOIN ab),
    tot AS (
        SELECT doc_id, source, CAST(SUM(cnt) AS BIGINT) AS total
        FROM counts GROUP BY doc_id, source),
    ent AS (
        SELECT c.doc_id, c.source,
               CAST(SUM(CASE WHEN c.cnt > 0 THEN
                   CAST(ROUND(-1e9 * (c.cnt / CAST(t.total AS DOUBLE))
                        * LN(c.cnt / CAST(t.total AS DOUBLE)))
                        AS BIGINT) ELSE 0 END) AS BIGINT) AS ent_u
        FROM counts c JOIN tot t ON t.doc_id = c.doc_id
        WHERE t.total > 0
        GROUP BY c.doc_id, c.source)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(ent_u) / COUNT(*) / 1e9, 6) AS mean_entropy_nats,
           CAST(SUM(CASE WHEN ent_u < 2000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy
    FROM ent GROUP BY source
    """,
)
def q_llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy gibberish filter: per document, the Shannon
    entropy (nats) of its a–z+space character distribution — natural
    text sits near 2.8–3.0, while repeated-character spam, base64
    blobs, and keyboard mash fall outside — rolled up per source with
    a low-entropy (< 2.0) count. Character counts come from the
    length-difference-after-replace identity (no per-char explode);
    each doc's entropy terms quantize to integer nano-units so sums
    are exact and order-free.

    Scale: the 27-letter spine cross-joins as a broadcast constant;
    counting is row-local string arithmetic and the rollups aggregate
    at (doc) then (source) grain — one corpus scan, no token
    explosion."""
    d = load_table(spark, sf_dir, "documents")
    ab = spark.createDataFrame([(c,) for c in _ALPHABET], "ch string")
    counts = d.crossJoin(F.broadcast(ab)).select(
        "doc_id",
        "source",
        "ch",
        (
            F.length(F.lower("text"))
            - F.length(F.expr("replace(lower(text), ch, '')"))
        ).alias("cnt"),
    )
    tot = counts.groupBy("doc_id", "source").agg(
        F.sum("cnt").alias("total")
    )
    p = F.col("cnt") / F.col("total").cast("double")
    ent = (
        counts.join(
            tot.select("doc_id", "total").filter(F.col("total") > 0),
            "doc_id",
        )
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.when(
                    F.col("cnt") > 0,
                    F.round(-1e9 * p * F.log(p)).cast("long"),
                ).otherwise(0)
            ).alias("ent_u")
        )
    )
    return ent.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("ent_u") / F.count("*") / 1e9, 6).alias(
            "mean_entropy_nats"
        ),
        F.sum(
            F.when(F.col("ent_u") < 2000000000, 1).otherwise(0)
        ).alias("n_low_entropy"),
    )
