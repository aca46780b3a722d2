"""Round-6 wave 98: credit-scoring-style feature metrics — weight of
evidence / information value (binned predictive power of a feature),
the population stability index (distribution drift between corpus
halves), and a k-fold assignment balance audit (portable hash folds).
All exactly DuckDB-oracled from integer contingency cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_woe_iv",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(n_chars AS BIGINT) // 100, 9) AS bin,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
    g AS (
        SELECT bin, CAST(SUM(pos) AS BIGINT) AS np,
               CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nn
        FROM b GROUP BY bin),
    t AS (SELECT CAST(SUM(np) AS BIGINT) AS p,
                 CAST(SUM(nn) AS BIGINT) AS n FROM g),
    w AS (
        SELECT g.bin, g.np, g.nn,
               LN(((CAST(g.np AS DOUBLE) + 0.5) / CAST(t.p AS DOUBLE))
                  / ((CAST(g.nn AS DOUBLE) + 0.5) / CAST(t.n AS DOUBLE)))
                   AS woe,
               ((CAST(g.np AS DOUBLE) + 0.5) / CAST(t.p AS DOUBLE)
                - (CAST(g.nn AS DOUBLE) + 0.5) / CAST(t.n AS DOUBLE))
                   AS gap
        FROM g CROSS JOIN t),
    iv AS (SELECT SUM(gap * woe) AS iv FROM w)
    SELECT CAST(w.bin AS BIGINT) AS char_bin, w.np AS n_pos, w.nn AS n_neg,
           ROUND(w.woe, 6) AS woe, ROUND(iv.iv, 6) AS iv_total
    FROM w CROSS JOIN iv ORDER BY char_bin
    """,
)
def q_ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence / information value of document length for
    the English label, over 100-char bins: WOE_k = ln(pos-share /
    neg-share) per bin (0.5-smoothed) and IV = Σ(Δshare)·WOE — the
    credit-scoring metric that grades a feature's predictive power
    on one interpretable scale (IV < 0.02 useless, > 0.3 strong)
    before any model is trained. Integer contingency cells feed one
    ln per bin, identically in both engines.

    Scale: one pass to 10 bins of state with map-side combine; the
    totals broadcast. The binning is fixed-width so the metric needs
    no quantile pre-pass — the standard production shortcut for
    monitoring pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.least(F.expr("CAST(n_chars AS BIGINT) div 100"), F.lit(9)).alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    g = b.groupBy("bin").agg(
        F.sum("pos").alias("np"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("nn"),
    )
    t = g.agg(F.sum("np").alias("p"), F.sum("nn").alias("n"))
    ps = (F.col("np").cast("double") + 0.5) / F.col("p").cast("double")
    ns = (F.col("nn").cast("double") + 0.5) / F.col("n").cast("double")
    w = g.crossJoin(F.broadcast(t)).select(
        "bin", "np", "nn", F.log(ps / ns).alias("woe"), (ps - ns).alias("gap")
    )
    iv = w.agg(F.sum(F.col("gap") * F.col("woe")).alias("iv"))
    return (
        w.crossJoin(F.broadcast(iv))
        .select(
            F.col("bin").cast("long").alias("char_bin"),
            F.col("np").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            F.round("woe", 6).alias("woe"),
            F.round("iv", 6).alias("iv_total"),
        )
        .orderBy("char_bin")
    )


@register(
    "q_ml_psi",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(n_chars AS BIGINT) // 100, 9) AS bin,
               CASE WHEN CAST(SUBSTR(source, 4) AS BIGINT) < 10
                    THEN 1 ELSE 0 END AS is_ref
        FROM documents),
    g AS (
        SELECT bin,
               CAST(SUM(is_ref) AS BIGINT) AS n_ref,
               CAST(COUNT(*) - SUM(is_ref) AS BIGINT) AS n_new
        FROM b GROUP BY bin),
    t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS r,
                 CAST(SUM(n_new) AS BIGINT) AS m FROM g),
    w AS (
        SELECT g.bin, g.n_ref, g.n_new,
               (CAST(g.n_new AS DOUBLE) + 0.5) / CAST(t.m AS DOUBLE)
                 - (CAST(g.n_ref AS DOUBLE) + 0.5) / CAST(t.r AS DOUBLE)
                   AS gap,
               LN(((CAST(g.n_new AS DOUBLE) + 0.5) / CAST(t.m AS DOUBLE))
                  / ((CAST(g.n_ref AS DOUBLE) + 0.5) / CAST(t.r AS DOUBLE)))
                   AS lr
        FROM g CROSS JOIN t),
    psi AS (SELECT SUM(gap * lr) AS psi FROM w)
    SELECT CAST(w.bin AS BIGINT) AS char_bin, w.n_ref, w.n_new,
           ROUND(w.gap * w.lr, 6) AS psi_term,
           ROUND(psi.psi, 6) AS psi_total
    FROM w CROSS JOIN psi ORDER BY char_bin
    """,
)
def q_ml_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the document-length distribution
    between the reference corpus half (src0-src9) and the new half
    (src10-src19): PSI = Σ (share_new − share_ref)·ln(share_new /
    share_ref) over 100-char bins (0.5-smoothed) — the model-
    monitoring metric that fires BEFORE accuracy degrades (PSI > 0.25
    = the input distribution moved, retrain). Integer bin cells, one
    ln per bin, exactly oracled.

    Scale: identical to WOE — one pass to bounded bin state; PSI is
    the monitoring query you schedule hourly at any corpus size
    because its cost is one map-side-combining aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.least(F.expr("CAST(n_chars AS BIGINT) div 100"), F.lit(9)).alias("bin"),
        F.when(F.expr("CAST(substr(source, 4) AS BIGINT)") < 10, 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    g = b.groupBy("bin").agg(
        F.sum("is_ref").alias("n_ref"),
        (F.count(F.lit(1)) - F.sum("is_ref")).alias("n_new"),
    )
    t = g.agg(F.sum("n_ref").alias("r"), F.sum("n_new").alias("m"))
    sr = (F.col("n_ref").cast("double") + 0.5) / F.col("r").cast("double")
    sn = (F.col("n_new").cast("double") + 0.5) / F.col("m").cast("double")
    w = g.crossJoin(F.broadcast(t)).select(
        "bin", "n_ref", "n_new", (sn - sr).alias("gap"), F.log(sn / sr).alias("lr")
    )
    psi = w.agg(F.sum(F.col("gap") * F.col("lr")).alias("psi"))
    return (
        w.crossJoin(F.broadcast(psi))
        .select(
            F.col("bin").cast("long").alias("char_bin"),
            "n_ref",
            "n_new",
            F.round(F.col("gap") * F.col("lr"), 6).alias("psi_term"),
            F.round("psi", 6).alias("psi_total"),
        )
        .orderBy("char_bin")
    )


@register(
    "q_ml_kfold_balance",
    oracle="""
    WITH f AS (
        SELECT ((c.c_custkey * 2654435761) % 4294967296) % 5 AS fold,
               o.o_orderkey, CAST(ROUND(o.o_totalprice) AS BIGINT) AS v
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
    g AS (
        SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(v) AS BIGINT) AS revenue
        FROM f GROUP BY fold),
    t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n,
                 CAST(SUM(revenue) AS BIGINT) AS rev,
                 CAST(MAX(n_orders) AS BIGINT) AS mx,
                 CAST(MIN(n_orders) AS BIGINT) AS mn
          FROM g)
    SELECT CAST(g.fold AS BIGINT) AS fold, g.n_orders, g.revenue,
           ROUND(CAST(g.n_orders AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
               AS order_share,
           ROUND(CAST(g.revenue AS DOUBLE) / CAST(t.rev AS DOUBLE), 6)
               AS revenue_share,
           ROUND(CAST(t.mx AS DOUBLE) / CAST(t.mn AS DOUBLE), 6)
               AS max_min_ratio
    FROM g CROSS JOIN t ORDER BY fold
    """,
)
def q_ml_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold assignment balance audit: customers hash (portable
    multiplicative hash) into 5 folds; GROUP-AWARE — every order of a
    customer lands in that customer's fold, the leakage-safe split
    for entity-correlated data — then per fold the order/revenue
    shares and the max/min fold-size ratio. The audit you run before
    trusting cross-validation numbers: a skewed fold silently widens
    CV variance. Exactly oracled (deterministic hash, integer cells).

    Scale: the fold column is a projection (no shuffle to assign);
    the audit is one map-side-combining aggregate into 5 rows. The
    same hash expression reproduces the folds in any engine — the
    portability IS the point for train/serve consistency."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    f = (
        o.join(F.broadcast(c.select("c_custkey")), o["o_custkey"] == c["c_custkey"])
        .select(
            F.expr("((c_custkey * 2654435761) % 4294967296) % 5").alias("fold"),
            F.round("o_totalprice").cast("long").alias("v"),
        )
    )
    g = f.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("v").alias("revenue")
    )
    t = g.agg(
        F.sum("n_orders").alias("n"),
        F.sum("revenue").alias("rev"),
        F.max("n_orders").alias("mx"),
        F.min("n_orders").alias("mn"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            F.col("fold").cast("long").alias("fold"),
            "n_orders",
            "revenue",
            F.round(F.col("n_orders").cast("double") / F.col("n").cast("double"), 6).alias(
                "order_share"
            ),
            F.round(F.col("revenue").cast("double") / F.col("rev").cast("double"), 6).alias(
                "revenue_share"
            ),
            F.round(F.col("mx").cast("double") / F.col("mn").cast("double"), 6).alias(
                "max_min_ratio"
            ),
        )
        .orderBy("fold")
    )
