"""Round-6 wave 125: Cramér-von Mises two-sample test (integrated
ECDF distance, exact via pooled histogram ranks), the MinHash
signature merge law (sig(A∪B) = elementwise min — the mergeability
proof as a query), and dedup survivorship bias (which sources the
keep-min policy disproportionately removes). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard

_MH = [
    (2654435761, 1), (40503, 7), (2246822519, 13), (3266489917, 19),
    (668265263, 29), (374761393, 37), (3141592653, 43), (2718281829, 53),
]
_MH_SQL = " UNION ALL ".join(
    f"SELECT {j} AS j, {a} AS a, {b} AS b" for j, (a, b) in enumerate(_MH)
)


@register(
    "q_stat_cramer_von_mises",
    oracle="""
    WITH x AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v,
               CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS grp
        FROM orders WHERE o_orderstatus IN ('F', 'O')),
    h AS (
        SELECT v,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1
        FROM x GROUP BY v),
    t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n,
                 CAST(SUM(c1) AS BIGINT) AS m FROM h),
    cum AS (
        SELECT c0, c1,
               SUM(c0) OVER (ORDER BY v) AS f0,
               SUM(c1) OVER (ORDER BY v) AS f1
        FROM h),
    w AS (
        SELECT SUM((c0 + c1)
                   * POW(CAST(f0 AS DOUBLE) / t.n
                         - CAST(f1 AS DOUBLE) / t.m, 2)) AS s,
               MAX(t.n) AS n, MAX(t.m) AS m
        FROM cum CROSS JOIN t)
    SELECT CAST(n AS BIGINT) AS n_f, CAST(m AS BIGINT) AS n_o,
           ROUND(CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
                 / POW(CAST(n AS DOUBLE) + CAST(m AS DOUBLE), 2) * s, 6)
               AS cvm_t
    FROM w
    """,
)
def q_stat_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample test between finished and open
    order values: T = nm/(n+m)² · Σ over pooled points of
    (F̂_n − Ĝ_m)² — the INTEGRATED ECDF distance that weighs the whole
    distribution where KS (q_stat_ks_2samp) sees only the single worst
    gap, making CvM the more powerful choice against diffuse
    alternatives. ECDFs come from exact cumulative integer histograms;
    each squared gap is a ratio of exact integers.

    Scale: value-domain histogram + one cumulative window — the EDF
    test family (KS, CvM, and by extension Anderson-Darling's
    weighting) all ride the same bounded histogram machinery."""
    o = load_table(spark, sf_dir, "orders")
    x = o.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.round("o_totalprice").cast("long").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 0).otherwise(1).alias("grp"),
    )
    h = x.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    t = h.agg(F.sum("c0").alias("n"), F.sum("c1").alias("m"))
    wv = Window.orderBy("v")
    cum = h.select(
        "c0",
        "c1",
        F.sum("c0").over(wv).alias("f0"),
        F.sum("c1").over(wv).alias("f1"),
    )
    w = cum.crossJoin(F.broadcast(t)).agg(
        F.sum(
            (F.col("c0") + F.col("c1"))
            * F.pow(
                F.col("f0").cast("double") / F.col("n").cast("double")
                - F.col("f1").cast("double") / F.col("m").cast("double"),
                F.lit(2),
            )
        ).alias("s"),
        F.max("n").alias("n"),
        F.max("m").alias("m"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    return w.select(
        F.col("n").cast("long").alias("n_f"),
        F.col("m").cast("long").alias("n_o"),
        F.round(nd * md / F.pow(nd + md, F.lit(2)) * F.col("s"), 6).alias("cvm_t"),
    )


@register(
    "q_sketch_minhash_merge_law",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type AS t, user_id AS x FROM events
        WHERE event_type IN ('view', 'purchase')),
    h AS ({_MH_SQL}),
    sigs AS (
        SELECT t, h.j, MIN(((x * h.a + h.b) % 4294967296)) AS sig
        FROM du CROSS JOIN h GROUP BY t, h.j),
    uni AS (
        SELECT h.j, MIN(((x * h.a + h.b) % 4294967296)) AS sig
        FROM (SELECT DISTINCT x FROM du) u CROSS JOIN h GROUP BY h.j),
    merged AS (
        SELECT j, MIN(sig) AS sig FROM sigs GROUP BY j)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
           CAST(SUM(CASE WHEN m.sig = u.sig THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
    FROM merged m JOIN uni u ON u.j = m.j
    """,
)
def q_sketch_minhash_merge_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash mergeability law, executed: the signature of the UNION
    of two sets must equal the elementwise MIN of their signatures —
    verified by building sig(view-users), sig(purchase-users), their
    min-merge, and the direct sig(union), and counting agreement
    (must be 8/8). This is the property that lets MinHash sketches
    merge across partitions/shards with zero recomputation — the same
    merge-law family as q_sketch_hll_merge and q_agg_topk_merge_law,
    completing the sketch-algebra test suite.

    Scale: the law IS the scale story — shard signatures combine by
    elementwise min, so corpus-wide signatures never reshuffle raw
    keys."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .select(F.col("event_type").alias("t"), F.col("user_id").alias("x"))
        .distinct()
    )
    h = spark.createDataFrame([(j, a, b) for j, (a, b) in enumerate(_MH)], ["j", "a", "b"])
    sig_expr = (F.col("x") * F.col("a") + F.col("b")) % 4294967296
    sigs = du.crossJoin(F.broadcast(h)).groupBy("t", "j").agg(F.min(sig_expr).alias("sig"))
    uni = (
        du.select("x")
        .distinct()
        .crossJoin(F.broadcast(h))
        .groupBy("j")
        .agg(F.min(sig_expr).alias("usig"))
    )
    merged = sigs.groupBy("j").agg(F.min("sig").alias("msig"))
    return (
        merged.join(uni, "j")
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.sum(F.when(F.col("msig") == F.col("usig"), 1).otherwise(0)).alias("n_agree"),
        )
    )


@register("q_llm_dedup_survivorship")
def q_llm_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship bias: after keep-min-id dedup over the
    near-dup clusters, the SURVIVAL RATE per source — a source whose
    documents disproportionately lose the keep-choice vanishes from
    the training mix even though its content survives via other
    sources' copies; this audit makes that silent re-weighting
    visible (the fairness-of-dedup complement to q_llm_dedup_impact's
    volume accounting). Exact integer counts; survivors = cluster
    minima + all never-matched singletons.

    Scale: components at edge grain, an anti-join for singletons, and
    a source-grain rollup — the audit rides the dedup pipeline's own
    outputs."""
    from ..operators.components import connected_components

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    dropped = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    per_source = docs.join(dropped, "doc_id", "left_anti").groupBy("source").agg(
        F.count(F.lit(1)).alias("survivors")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(per_source, "source")
        .select(
            "source",
            "n_docs",
            "survivors",
            F.round(F.col("survivors").cast("double") / F.col("n_docs").cast("double"), 6).alias(
                "survival_rate"
            ),
        )
        .orderBy("source")
    )


set_oracle("q_llm_dedup_survivorship", f"""
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
comp AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp WHERE node <> comp),
per_source AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS survivors
  FROM documents d LEFT JOIN dropped x ON x.doc_id = d.doc_id
  WHERE x.doc_id IS NULL
  GROUP BY d.source),
totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source)
SELECT t.source, t.n_docs, p.survivors,
       ROUND(CAST(p.survivors AS DOUBLE) / CAST(t.n_docs AS DOUBLE), 6)
           AS survival_rate
FROM totals t JOIN per_source p ON p.source = t.source
ORDER BY t.source
""")
