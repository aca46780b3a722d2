"""Round-6 wave 78: a model learning curve (held-out MAE vs training
fraction — the does-more-data-help readout), the friendship-paradox
audit on the near-dup graph (exact integer cross-multiplied
comparison), and a fixed-effect inverse-variance meta-analysis pooled
across nations (per-study terms micro-quantized before summation).
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

_FRACTIONS = (1, 2, 5, 10)  # tenths of the training pool


@register(
    "q_ml_learning_curve",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS fold,
               (o_orderkey // 2) % 10 AS tslice
        FROM orders),
    fr AS (SELECT CAST(k AS BIGINT) AS k
           FROM (VALUES {", ".join(f"({k})" for k in _FRACTIONS)}) t(k)),
    fit AS (
        SELECT fr.k, b.o_orderpriority,
               CAST(SUM(b.cents) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM base b JOIN fr ON b.tslice < fr.k
        WHERE b.fold = 0
        GROUP BY fr.k, b.o_orderpriority),
    ev AS (
        SELECT f.k, f.n AS n_dummy,
               CAST(ROUND(ABS(b.cents - CAST(f.s AS DOUBLE) / f.n))
                    AS BIGINT) AS resid
        FROM base b JOIN fit f ON f.o_orderpriority = b.o_orderpriority
        WHERE b.fold = 1),
    tr_n AS (
        SELECT k, CAST(SUM(n) AS BIGINT) AS n_train FROM fit GROUP BY k)
    SELECT e.k AS train_tenths,
           t.n_train,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           ROUND(CAST(SUM(e.resid) AS DOUBLE) / COUNT(*) / 100.0, 6)
               AS mae_dollars
    FROM ev e JOIN tr_n t ON t.k = e.k
    GROUP BY e.k, t.n_train
    ORDER BY e.k
    """,
)
def q_ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: the per-priority mean-price model refit on
    10%, 20%, 50% and 100% of the training pool (deterministic
    key-slice subsets), each evaluated by held-out MAE — the
    does-more-data-actually-help readout that justifies (or kills) a
    bigger crawl before anyone pays for it. Residuals are quantized
    to integer cents per row, so each MAE divides one exact sum.

    Scale: the fraction dimension joins as a 4-row broadcast and the
    fact is touched twice (fit pass, eval pass) regardless of how
    many fractions are swept — fraction count never multiplies fact
    shuffles; models stay at (fraction × priority) grain.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("fold"),
        F.expr("(o_orderkey div 2) % 10").alias("tslice"),
    )
    fr = F.broadcast(
        spark.createDataFrame([(k,) for k in _FRACTIONS], "k: long")
    )
    fit = (
        base.filter(F.col("fold") == 0)
        .join(fr, F.col("tslice") < F.col("k"))
        .groupBy("k", "o_orderpriority")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    ev = (
        base.filter(F.col("fold") == 1)
        .join(F.broadcast(fit), "o_orderpriority")
        .select(
            "k",
            F.round(
                F.abs(F.col("cents") - F.col("s").cast("double") / F.col("n"))
            )
            .cast("long")
            .alias("resid"),
        )
    )
    tr_n = fit.groupBy("k").agg(F.sum("n").alias("n_train"))
    return (
        ev.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum("resid").alias("sum_resid"),
        )
        .join(F.broadcast(tr_n), "k")
        .select(
            F.col("k").alias("train_tenths"),
            "n_train",
            "n_eval",
            F.round(
                F.col("sum_resid").cast("double") / F.col("n_eval") / 100.0, 6
            ).alias("mae_dollars"),
        )
        .orderBy("train_tenths")
    )


@register("q_graph_friendship_paradox")
def q_graph_friendship_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friendship-paradox audit on the near-dup graph: "your
    neighbors have more neighbors than you" — mean neighbor degree
    (Σ_directed-edges deg(dst) / 2E) vs mean degree (2E / N), with
    the paradox decided by the EXACT integer cross-multiplication
    S·N ≥ (2E)² rather than comparing rounded doubles. The
    sampling-bias phenomenon behind degree-biased sampling designs
    (and hub-dominated dedup clusters).

    Scale: a degree aggregate plus one edge-grain join of edges
    against the degree table — edge-grain work, node-grain state,
    three scalar outputs.
    """
    from .llm_pipeline2 import q_llm_ngram_jaccard

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    stats = edges.join(
        F.broadcast(deg), edges.dst == deg.node
    ).agg(
        F.count(F.lit(1)).alias("e2"),
        F.sum("deg").alias("s"),
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return stats.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        (F.col("e2") / 2).cast("long").alias("n_edges"),
        F.round(F.col("e2").cast("double") / F.col("n_nodes"), 6).alias(
            "mean_degree"
        ),
        F.round(F.col("s").cast("double") / F.col("e2"), 6).alias(
            "mean_neighbor_degree"
        ),
        (F.col("s") * F.col("n_nodes") >= F.col("e2") * F.col("e2"))
        .cast("long")
        .alias("paradox_holds"),
    )


set_oracle(
    "q_graph_friendship_paradox",
    f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e GROUP BY src),
st AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS e2,
           CAST(SUM(d.deg) AS BIGINT) AS s
    FROM e JOIN deg d ON d.node = e.dst),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
SELECT nn.n_nodes,
       CAST(st.e2 // 2 AS BIGINT) AS n_edges,
       ROUND(CAST(st.e2 AS DOUBLE) / nn.n_nodes, 6) AS mean_degree,
       ROUND(CAST(st.s AS DOUBLE) / st.e2, 6) AS mean_neighbor_degree,
       CAST(st.s * nn.n_nodes >= st.e2 * st.e2 AS BIGINT)
           AS paradox_holds
FROM st CROSS JOIN nn
""",
)


@register(
    "q_stat_meta_analysis",
    oracle="""
    WITH base AS (
        SELECT c.c_nationkey AS nation,
               o.o_custkey % 2 AS grp,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    g AS (
        SELECT nation, grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               SUM(CAST(cents AS DECIMAL(38, 0))
                   * CAST(cents AS DECIMAL(38, 0))) AS s2
        FROM base GROUP BY nation, grp),
    studies AS (
        SELECT a.nation,
               (CAST(a.s AS DOUBLE) / a.n
                - CAST(b.s AS DOUBLE) / b.n) / 100.0 AS d,
               ((CAST(a.s2 AS DOUBLE) - CAST(a.s AS DOUBLE) * a.s / a.n)
                / (a.n - 1) / a.n
                + (CAST(b.s2 AS DOUBLE) - CAST(b.s AS DOUBLE) * b.s / b.n)
                / (b.n - 1) / b.n) / 10000.0 AS var_d
        FROM g a JOIN g b ON a.nation = b.nation
        WHERE a.grp = 1 AND b.grp = 0 AND a.n > 1 AND b.n > 1),
    quant AS (
        SELECT nation, w6, wd6 FROM (
            SELECT nation,
                   CAST(ROUND(1000000000000.0 / var_d) AS BIGINT) AS w6,
                   CAST(ROUND(d * 1000000000000.0 / var_d) AS BIGINT)
                       AS wd6
            FROM studies) WHERE w6 >= 1),
    pool AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_studies,
               CAST(SUM(w6) AS BIGINT) AS sw,
               CAST(SUM(wd6) AS BIGINT) AS swd
        FROM quant),
    q AS (
        SELECT CAST(SUM(CAST(ROUND(
                   (qt.d_part) * (qt.d_part) * qt.w6 / 1000000.0)
                   AS BIGINT)) AS BIGINT) AS q_num6
        FROM (SELECT qu.w6,
                     (CAST(qu.wd6 AS DOUBLE) / qu.w6
                      - CAST(p.swd AS DOUBLE) / p.sw) AS d_part
              FROM quant qu CROSS JOIN pool p) qt)
    SELECT p.n_studies,
           ROUND(CAST(p.swd AS DOUBLE) / p.sw + 0.0, 6) AS pooled_effect,
           ROUND(SQRT(1000000000000.0 / p.sw), 6) AS pooled_se,
           ROUND(q.q_num6 / 1000000.0, 6) AS q_stat,
           ROUND(CASE WHEN q.q_num6 > 0
                      THEN GREATEST(0.0,
                           (q.q_num6 / 1000000.0 - (p.n_studies - 1))
                           / (q.q_num6 / 1000000.0))
                      ELSE 0.0 END + 0.0, 6) AS i2
    FROM pool p CROSS JOIN q
    """,
)
def q_stat_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect inverse-variance meta-analysis: each nation is a
    "study" measuring the mean order-value difference between odd and
    even customer keys; studies pool as Σw·d / Σw with w = 1/Var(d),
    plus Cochran's Q and I² heterogeneity. Per-study weights and
    weighted effects are pico-quantized (1e12/Var) to integers BEFORE
    the cross-study sums — zero-weight (absurdly noisy, sub-quantum)
    studies are dropped identically in both engines — so pooling is
    summation-order-free — the
    pattern for any "combine per-partition estimates" readout at
    100 TB (per-region metrics, federated experiment pooling).

    Scale: one fact pass to (nation, group) sufficient statistics
    (squares in DECIMAL(38,0)); everything after operates on ≤25
    study rows.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dec = "decimal(38,0)"
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        (F.col("o_custkey") % 2).alias("grp"),
        cents.alias("cents"),
    )
    g = base.groupBy("nation", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias("s2"),
    )
    a = g.filter((F.col("grp") == 1) & (F.col("n") > 1)).select(
        "nation",
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("s2").alias("s2a"),
    )
    b = g.filter((F.col("grp") == 0) & (F.col("n") > 1)).select(
        "nation",
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("s2").alias("s2b"),
    )
    studies = a.join(b, "nation").select(
        "nation",
        (
            (F.col("sa").cast("double") / F.col("na")
             - F.col("sb").cast("double") / F.col("nb"))
            / 100.0
        ).alias("d"),
        (
            (
                (F.col("s2a").cast("double")
                 - F.col("sa").cast("double") * F.col("sa") / F.col("na"))
                / (F.col("na") - 1)
                / F.col("na")
                + (F.col("s2b").cast("double")
                   - F.col("sb").cast("double") * F.col("sb") / F.col("nb"))
                / (F.col("nb") - 1)
                / F.col("nb")
            )
            / 10000.0
        ).alias("var_d"),
    )
    quant = studies.select(
        "nation",
        F.round(1000000000000.0 / F.col("var_d")).cast("long").alias("w6"),
        F.round(F.col("d") * 1000000000000.0 / F.col("var_d"))
        .cast("long")
        .alias("wd6"),
    ).filter(F.col("w6") >= 1)
    quant = quant.persist()
    pool = quant.agg(
        F.count(F.lit(1)).alias("n_studies"),
        F.sum("w6").alias("sw"),
        F.sum("wd6").alias("swd"),
    )
    qt = quant.crossJoin(F.broadcast(pool)).select(
        "w6",
        (
            F.col("wd6").cast("double") / F.col("w6")
            - F.col("swd").cast("double") / F.col("sw")
        ).alias("d_part"),
    )
    qnum = qt.agg(
        F.sum(
            F.round(
                F.col("d_part") * F.col("d_part") * F.col("w6") / 1000000.0
            ).cast("long")
        ).alias("q_num6")
    )
    return pool.crossJoin(F.broadcast(qnum)).select(
        "n_studies",
        F.round(F.col("swd").cast("double") / F.col("sw"), 6).alias(
            "pooled_effect"
        ),
        F.round(F.sqrt(1000000000000.0 / F.col("sw")), 6).alias("pooled_se"),
        F.round(F.col("q_num6") / 1000000.0, 6).alias("q_stat"),
        F.round(
            F.when(
                F.col("q_num6") > 0,
                F.greatest(
                    F.lit(0.0),
                    (F.col("q_num6") / 1000000.0 - (F.col("n_studies") - 1))
                    / (F.col("q_num6") / 1000000.0),
                ),
            ).otherwise(0.0),
            6,
        ).alias("i2"),
    )
