"""Round-6 wave 82: personalized PageRank from a seed document
(random walk with restart, exact integer micro-units), permutation
feature importance (hash-permutation pairing, no RNG), and a
blocklist safety-filter stage (weighted severity scoring per source).
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

_PPR_STEPS = 6
_ALPHA_MICRO = 150000  # restart probability 0.15 in micro-units


def _ppr_step(prev: str, new: str) -> str:
    return (
        f"{new} AS MATERIALIZED ("
        f"SELECT node, CAST(SUM(pu) AS BIGINT) AS pu FROM ("
        f"SELECT j AS node, "
        f"CAST(SUM(walk) * 850000 // 1000000 AS BIGINT) AS pu "
        f"FROM (SELECT t.j, p.pu * t.tu // 1000000 AS walk "
        f"      FROM {prev} p JOIN tmat t ON t.i = p.node) "
        f"GROUP BY j "
        f"UNION ALL SELECT s, CAST({_ALPHA_MICRO} AS BIGINT) FROM seed"
        f") GROUP BY node)"
    )


_PPR_SQL = """
WITH pairs AS ({pairs}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
tmat AS MATERIALIZED (
    SELECT e.src AS i, e.dst AS j,
           CAST(1000000 // d.deg AS BIGINT) AS tu
    FROM e JOIN deg d ON d.src = e.src),
seed AS (SELECT MIN(src) AS s FROM e),
p0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS pu FROM seed),
{steps}
SELECT node, pu AS ppr_micro, ROUND(pu / 1e6, 6) AS ppr
FROM p{n} ORDER BY pu DESC, node LIMIT 10
"""


def _ppr_sql(pairs: str) -> str:
    steps = ",\n".join(
        _ppr_step(f"p{k-1}", f"p{k}") for k in range(1, _PPR_STEPS + 1)
    )
    return _PPR_SQL.format(pairs=pairs, steps=steps, n=_PPR_STEPS)


@register("q_graph_ppr")
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart, α = 0.15)
    from the minimum-id document of the near-dup graph: 6 exact
    integer micro-unit iterations of p' = α·seed + (1−α)·Tᵀp over the
    degree-normalized transition matrix, top-10 nodes by score — the
    seed-centric similarity ranking behind related-item
    recommendation and local community detection (global PageRank's
    personalized twin). Floor-division integer arithmetic keeps both
    engines bit-identical.

    Scale: degree-normalized edges build in one aggregate + join;
    each iteration is one edge-grain join + node-grain sum (Spark
    side iterates with per-step localCheckpoint; the oracle
    MATERIALIZES each step CTE — same quadratic-reeval lesson as
    q_evt_expected_steps).
    """
    from .llm_pipeline2 import q_llm_ngram_jaccard

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    e = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tmat = (
        e.join(deg, "src")
        .select(
            F.col("src").alias("i"),
            F.col("dst").alias("j"),
            F.expr("CAST(1000000 div deg AS BIGINT)").alias("tu"),
        )
        .localCheckpoint(eager=True)
    )
    seed = int(tmat.agg(F.min("i")).collect()[0][0])
    p = spark.createDataFrame([(seed, 1000000)], "node: long, pu: long")
    restart = spark.createDataFrame(
        [(seed, _ALPHA_MICRO)], "node: long, pu: long"
    )
    for _ in range(_PPR_STEPS):
        walk = (
            p.alias("p")
            .join(tmat.alias("t"), F.col("t.i") == F.col("p.node"))
            .select(
                F.col("t.j").alias("node"),
                F.expr("p.pu * t.tu div 1000000").alias("walk"),
            )
            .groupBy("node")
            .agg(
                F.expr(
                    "CAST(SUM(walk) * 850000 div 1000000 AS BIGINT)"
                ).alias("pu")
            )
            .unionAll(restart)
            .groupBy("node")
            .agg(F.sum("pu").alias("pu"))
        )
        p = walk.localCheckpoint(eager=True)
    return (
        p.select(
            "node",
            F.col("pu").alias("ppr_micro"),
            F.round(F.col("pu") / 1000000.0, 6).alias("ppr"),
        )
        .orderBy(F.col("ppr_micro").desc(), "node")
        .limit(10)
    )


set_oracle("q_graph_ppr", _ppr_sql(ORACLES["q_llm_ngram_jaccard"]))


_H1 = "((l_orderkey * 2654435761 + l_linenumber * 97) % 4294967296)"
_H2 = "((l_orderkey * 40503 + l_linenumber * 31) % 65536)"


@register(
    "q_ml_perm_importance",
    oracle=f"""
    WITH y AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yc,
               l_orderkey % 2 AS fold
        FROM lineitem),
    h AS (
        SELECT q, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yc) AS BIGINT) AS s
        FROM y WHERE fold = 0 GROUP BY q),
    c AS (
        SELECT q, SUM(n) OVER (ORDER BY q) AS nl,
               SUM(s) OVER (ORDER BY q) AS sl,
               SUM(n) OVER () AS nt, SUM(s) OVER () AS st
        FROM h),
    split AS (
        SELECT q AS t,
               CAST(ROUND(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS ml,
               CAST(ROUND(CAST(st - sl AS DOUBLE) / (nt - nl)) AS BIGINT)
                   AS mr
        FROM c WHERE nl < nt
        ORDER BY CAST(sl AS DOUBLE) * sl / nl
               + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl) DESC, q
        LIMIT 1),
    ev AS (
        SELECT q, yc,
               ROW_NUMBER() OVER (ORDER BY {_H1}, l_orderkey,
                                  l_linenumber) AS rn1,
               ROW_NUMBER() OVER (ORDER BY {_H2}, l_orderkey,
                                  l_linenumber) AS rn2
        FROM y WHERE fold = 1),
    paired AS (
        SELECT a.yc, a.q AS q_true, b.q AS q_perm
        FROM ev a JOIN (SELECT rn2, q FROM ev) b ON b.rn2 = a.rn1),
    scored AS (
        SELECT CAST(ROUND(ABS(p.yc - CASE WHEN p.q_true <= s.t
                                          THEN s.ml ELSE s.mr END))
                    AS BIGINT) AS r_base,
               CAST(ROUND(ABS(p.yc - CASE WHEN p.q_perm <= s.t
                                          THEN s.ml ELSE s.mr END))
                    AS BIGINT) AS r_perm
        FROM paired p CROSS JOIN split s)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           ROUND(CAST(SUM(r_base) AS DOUBLE) / COUNT(*) / 100.0, 6)
               AS mae_base,
           ROUND(CAST(SUM(r_perm) AS DOUBLE) / COUNT(*) / 100.0, 6)
               AS mae_permuted,
           ROUND(CAST(SUM(r_perm) - SUM(r_base) AS DOUBLE)
                 / COUNT(*) / 100.0 + 0.0, 6) AS importance_dollars
    FROM scored
    """,
)
def q_ml_perm_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation feature importance, fully deterministic: the
    quantity stump's held-out MAE is re-measured with the quantity
    column PERMUTED — the permutation comes from joining two
    independent portable-hash orderings by position (row i in hash
    order 1 receives the feature of row i in hash order 2), no RNG.
    Importance = MAE(permuted) − MAE(base), the model-agnostic
    "what breaks when this feature is noise" measure.

    Scale: the two ROW_NUMBER orderings are the documented global-
    sort step (range-partitioned rank is the 100 TB rewrite); the
    pairing join is rank-keyed, the model is a 1-row broadcast, and
    both MAEs divide exact rounded-residual sums from one pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yc"),
        (F.col("l_orderkey") % 2).alias("fold"),
    )
    h = (
        y.filter(F.col("fold") == 0)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("yc").alias("s"))
    )
    wc = Window.orderBy("q")
    wt = Window.partitionBy()
    c = h.select(
        "q",
        F.sum("n").over(wc).alias("nl"),
        F.sum("s").over(wc).alias("sl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("s").over(wt).alias("st"),
    )
    nl, sl, nt, st = (F.col(x) for x in ("nl", "sl", "nt", "st"))
    score = sl.cast("double") * sl / nl + (st - sl).cast("double") * (
        st - sl
    ) / (nt - nl)
    split = (
        c.filter(nl < nt)
        .select(
            F.col("q").alias("t"),
            F.round(sl.cast("double") / nl).cast("long").alias("ml"),
            F.round((st - sl).cast("double") / (nt - nl))
            .cast("long")
            .alias("mr"),
            score.alias("sc"),
        )
        .orderBy(F.col("sc").desc(), "t")
        .limit(1)
        .drop("sc")
    )
    ev = y.filter(F.col("fold") == 1).select(
        "q",
        "yc",
        F.row_number()
        .over(
            Window.orderBy(
                F.expr(_H1), "l_orderkey", "l_linenumber"
            )
        )
        .alias("rn1"),
        F.row_number()
        .over(
            Window.orderBy(
                F.expr(_H2), "l_orderkey", "l_linenumber"
            )
        )
        .alias("rn2"),
    )
    donors = ev.select(F.col("rn2").alias("rnk"), F.col("q").alias("q_perm"))
    paired = ev.select("yc", F.col("q").alias("q_true"), F.col("rn1").alias("rnk")).join(
        donors, "rnk"
    )
    scored = paired.crossJoin(F.broadcast(split)).select(
        F.round(
            F.abs(
                F.col("yc")
                - F.when(F.col("q_true") <= F.col("t"), F.col("ml")).otherwise(
                    F.col("mr")
                )
            )
        )
        .cast("long")
        .alias("r_base"),
        F.round(
            F.abs(
                F.col("yc")
                - F.when(F.col("q_perm") <= F.col("t"), F.col("ml")).otherwise(
                    F.col("mr")
                )
            )
        )
        .cast("long")
        .alias("r_perm"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.round(
            F.sum("r_base").cast("double") / F.count(F.lit(1)) / 100.0, 6
        ).alias("mae_base"),
        F.round(
            F.sum("r_perm").cast("double") / F.count(F.lit(1)) / 100.0, 6
        ).alias("mae_permuted"),
        F.round(
            (F.sum("r_perm") - F.sum("r_base")).cast("double")
            / F.count(F.lit(1))
            / 100.0,
            6,
        ).alias("importance_dollars"),
    )


_BLOCK = {"slow": 3, "dup": 2, "error": 1}
# non-overlapping whole-word hits counted by the character-length
# delta of replacing ' term ' with ' ' on space-padded text: each hit
# removes len(term)+1 characters. Identical semantics in both engines.
_BLOCK_SQL = " + ".join(
    f"{w} * ((LENGTH(' ' || text || ' ') "
    f"- LENGTH(REPLACE(' ' || text || ' ', ' {t} ', ' '))) // {len(t) + 1})"
    for t, w in _BLOCK.items()
)


@register(
    "q_llm_safety_filter",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               CAST({_BLOCK_SQL} AS BIGINT) AS severity,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM documents),
    flagged AS (
        SELECT source, severity, n_words,
               CASE WHEN severity * 100 >= n_words THEN 1 ELSE 0 END
                   AS flagged
        FROM scored)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           CAST(SUM(severity) AS BIGINT) AS total_severity,
           ROUND(CAST(SUM(flagged) AS DOUBLE) / COUNT(*), 6)
               AS flag_rate
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
)
def q_llm_safety_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist safety-filter stage: each document scores weighted
    blocklist-term hits (exact whole-word counts via delimited
    replace — no substring false positives), and documents whose
    severity exceeds 1% of their word count are flagged; per-source
    flag rates are the go/no-go report a corpus-safety pass emits.
    The term list is a 3-entry stand-in for a real lexicon — the
    plumbing (weighted multi-term scoring, length-relative threshold,
    per-source rollup) is the production shape.

    Scale: row-local string scoring (codegen), one hash aggregate at
    source grain. Exact integer severities; a real deployment swaps
    the lexicon for a broadcast map without changing the plan.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    sev = F.lit(0)
    for t, w in _BLOCK.items():
        hits = (
            F.length(padded) - F.length(F.replace(padded, F.lit(f" {t} "), F.lit(" ")))
        ) / (len(t) + 1)
        sev = sev + F.lit(w) * hits.cast("long")
    scored = d.select(
        "source",
        sev.cast("long").alias("severity"),
        words.cast("long").alias("n_words"),
    )
    flagged = scored.select(
        "source",
        "severity",
        (F.col("severity") * 100 >= F.col("n_words"))
        .cast("long")
        .alias("flagged"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("flagged").alias("n_flagged"),
            F.sum("severity").alias("total_severity"),
            F.round(
                F.sum("flagged").cast("double") / F.count(F.lit(1)), 6
            ).alias("flag_rate"),
        )
        .orderBy("source")
    )
