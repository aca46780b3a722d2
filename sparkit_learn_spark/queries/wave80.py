"""Round-6 wave 80: a bagged-stump regression ensemble (8 Poisson
bootstrap bags x weighted histogram split search — the bagging half
of a random forest, fully deterministic) and the distributed top-k
merge law (global top-k == top-k of per-partition top-k unions,
machine-checked). Both exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_N_BAGS = 8
# Poisson(1) inverse-CDF thresholds (same literals as the bootstrap).
_POIS_CDF = (
    "0.367879441", "0.735758882", "0.919698603", "0.981011843",
    "0.996340153", "0.999405815", "0.999916758",
)
_UHASH = (
    "((l_orderkey * 2654435761 + l_linenumber * 97 + b * 2246822519"
    " + 40503) % 4294967296) / 4294967296.0"
)
_WEIGHT = " + ".join(
    f"CASE WHEN {_UHASH} >= {t} THEN 1 ELSE 0 END" for t in _POIS_CDF
)


@register(
    "q_ml_bagged_stumps",
    oracle=f"""
    WITH y AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yc,
               l_orderkey % 2 AS fold
        FROM lineitem),
    bags AS (SELECT CAST(b AS BIGINT) AS b FROM range({_N_BAGS}) t(b)),
    wtrain AS (
        SELECT bg.b, y.q, y.yc, ({_WEIGHT}) AS w
        FROM y CROSS JOIN bags bg WHERE y.fold = 0),
    h AS (
        SELECT b, q,
               CAST(SUM(w) AS BIGINT) AS n,
               CAST(SUM(w * yc) AS BIGINT) AS s
        FROM wtrain GROUP BY b, q),
    c AS (
        SELECT b, q,
               SUM(n) OVER (PARTITION BY b ORDER BY q) AS nl,
               SUM(s) OVER (PARTITION BY b ORDER BY q) AS sl,
               SUM(n) OVER (PARTITION BY b) AS nt,
               SUM(s) OVER (PARTITION BY b) AS st
        FROM h),
    scored AS (
        SELECT b, q AS t,
               CAST(sl AS DOUBLE) * sl / nl
               + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl) AS score,
               CAST(ROUND(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS ml,
               CAST(ROUND(CAST(st - sl AS DOUBLE) / (nt - nl)) AS BIGINT)
                   AS mr,
               ROW_NUMBER() OVER (
                   PARTITION BY b
                   ORDER BY CAST(sl AS DOUBLE) * sl / nl
                          + CAST(st - sl AS DOUBLE) * (st - sl)
                            / (nt - nl) DESC, q) AS rk
        FROM c WHERE nl > 0 AND nl < nt),
    model AS (SELECT b, t, ml, mr FROM scored WHERE rk = 1),
    ens AS (
        SELECT y.l_orderkey, y.l_linenumber, y.yc,
               CAST(SUM(CASE WHEN y.q <= m.t THEN m.ml ELSE m.mr END)
                    AS BIGINT) AS pred_sum,
               CAST(COUNT(*) AS BIGINT) AS n_models
        FROM y JOIN model m ON TRUE
        WHERE y.fold = 1
        GROUP BY y.l_orderkey, y.l_linenumber, y.yc),
    mae AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(CAST(ROUND(
                   ABS(yc - CAST(pred_sum AS DOUBLE) / n_models))
                   AS BIGINT)) AS BIGINT) AS sad
        FROM ens)
    SELECT n_eval,
           CAST({_N_BAGS} AS BIGINT) AS n_bags,
           ROUND(CAST(sad AS DOUBLE) / n_eval / 100.0, 6)
               AS mae_ensemble_dollars
    FROM mae
    """,
)
def q_ml_bagged_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bagged regression stumps (the bagging half of a random
    forest): 8 bootstrap bags with DETERMINISTIC Poisson(1)
    multiplicities (inverse-CDF thresholds on a portable hash — no
    RNG), each bag fitting its own weighted histogram-split stump of
    extended price on quantity; held-out predictions average the 8
    exact-integer leaf means. Bag-to-bag split variation is exactly
    what the ensemble smooths — the variance-reduction mechanism,
    demonstrated without any nondeterminism.

    Scale: the train fact expands ×8 but immediately re-aggregates
    map-side to (bag, quantity-bin) grain — the shuffle carries bag ×
    50 histogram rows, never the expansion; split search is a window
    per bag over the bounded domain; the 8-row model broadcast-joins
    the eval pass. MAE divides one exact rounded-residual sum.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yc"),
        (F.col("l_orderkey") % 2).alias("fold"),
    )
    bags = F.broadcast(
        spark.range(_N_BAGS).select(F.col("id").alias("b"))
    )
    wtrain = (
        y.filter(F.col("fold") == 0)
        .crossJoin(bags)
        .select("b", "q", "yc", F.expr(_WEIGHT).alias("w"))
    )
    h = wtrain.groupBy("b", "q").agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("yc")).alias("s"),
    )
    wq = Window.partitionBy("b").orderBy("q")
    wb = Window.partitionBy("b")
    c = h.select(
        "b",
        "q",
        F.sum("n").over(wq).alias("nl"),
        F.sum("s").over(wq).alias("sl"),
        F.sum("n").over(wb).alias("nt"),
        F.sum("s").over(wb).alias("st"),
    )
    nl, sl = F.col("nl"), F.col("sl")
    nt, st = F.col("nt"), F.col("st")
    score = sl.cast("double") * sl / nl + (st - sl).cast("double") * (
        st - sl
    ) / (nt - nl)
    scored = (
        c.filter((nl > 0) & (nl < nt))
        .select(
            "b",
            F.col("q").alias("t"),
            score.alias("score"),
            F.round(sl.cast("double") / nl).cast("long").alias("ml"),
            F.round((st - sl).cast("double") / (nt - nl))
            .cast("long")
            .alias("mr"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("b").orderBy(F.col("score").desc(), "t")
            ),
        )
    )
    model = scored.filter(F.col("rk") == 1).select("b", "t", "ml", "mr")
    ens = (
        y.filter(F.col("fold") == 1)
        .crossJoin(F.broadcast(model))
        .groupBy("l_orderkey", "l_linenumber", "yc")
        .agg(
            F.sum(
                F.when(F.col("q") <= F.col("t"), F.col("ml")).otherwise(
                    F.col("mr")
                )
            ).alias("pred_sum"),
            F.count(F.lit(1)).alias("n_models"),
        )
    )
    mae = ens.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(
            F.round(
                F.abs(
                    F.col("yc")
                    - F.col("pred_sum").cast("double") / F.col("n_models")
                )
            ).cast("long")
        ).alias("sad"),
    )
    return mae.select(
        "n_eval",
        F.lit(_N_BAGS).cast("long").alias("n_bags"),
        F.round(
            F.col("sad").cast("double") / F.col("n_eval") / 100.0, 6
        ).alias("mae_ensemble_dollars"),
    )


@register(
    "q_agg_topk_merge_law",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               (o_orderkey * 2654435761) % 4294967296 % 32 AS part
        FROM orders),
    global_k AS (
        SELECT o_orderkey, cents FROM base
        ORDER BY cents DESC, o_orderkey LIMIT 10),
    local_k AS (
        SELECT o_orderkey, cents FROM (
            SELECT o_orderkey, cents,
                   ROW_NUMBER() OVER (PARTITION BY part
                       ORDER BY cents DESC, o_orderkey) AS rk
            FROM base) WHERE rk <= 10),
    merged_k AS (
        SELECT o_orderkey, cents FROM local_k
        ORDER BY cents DESC, o_orderkey LIMIT 10),
    cmp AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_match
        FROM global_k g JOIN merged_k m
          ON g.o_orderkey = m.o_orderkey AND g.cents = m.cents),
    sz AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM local_k)
                   AS candidate_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS total_rows)
    SELECT sz.total_rows, sz.candidate_rows,
           cmp.n_match AS topk_overlap,
           CAST(cmp.n_match = 10 AS BIGINT) AS merge_law_holds,
           (SELECT MIN(cents) FROM global_k) AS kth_value_cents
    FROM cmp CROSS JOIN sz
    """,
)
def q_agg_topk_merge_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-k merge law, machine-checked: the global
    top-10 orders by value must equal the top-10 of the UNION of
    per-partition top-10s (a deterministic 32-way hash partitioning
    stands in for executors). This is the algebra behind Spark's
    TakeOrderedAndProject — each partition ships only k candidates,
    the driver merges k·P rows, and the law says nothing global is
    lost. The proof bit compares exact (key, cents) sets with a
    deterministic total order (value desc, key) so ties cannot
    produce a false mismatch.

    Scale: the candidate union is k × partitions rows — constant per
    partition regardless of data volume; that reduction from N to
    k·P is exactly why global top-k needs no global sort at 100 TB.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ((F.col("o_orderkey") * 2654435761) % 4294967296 % 32).alias("part"),
    ).persist()
    order_cols = [F.col("cents").desc(), F.col("o_orderkey")]
    global_k = base.orderBy(*order_cols).limit(10).select(
        "o_orderkey", "cents"
    )
    local_k = (
        base.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("part").orderBy(*order_cols)),
        )
        .filter(F.col("rk") <= 10)
        .select("o_orderkey", "cents")
    )
    merged_k = local_k.orderBy(*order_cols).limit(10)
    cmp = global_k.join(merged_k, ["o_orderkey", "cents"]).agg(
        F.count(F.lit(1)).alias("n_match")
    )
    sizes = base.agg(F.count(F.lit(1)).alias("total_rows")).crossJoin(
        F.broadcast(local_k.agg(F.count(F.lit(1)).alias("candidate_rows")))
    )
    kth = global_k.agg(F.min("cents").alias("kth_value_cents"))
    return (
        cmp.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(kth))
        .select(
            "total_rows",
            "candidate_rows",
            F.col("n_match").alias("topk_overlap"),
            (F.col("n_match") == 10).cast("long").alias("merge_law_holds"),
            "kth_value_cents",
        )
    )
