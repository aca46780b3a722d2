"""Round-6 wave 40: partial autocorrelation (Durbin–Levinson closed
forms from exact lag moments), kNN-classifier evaluation over the
embedding panel, and Pythagorean means (geometric/harmonic via
micro-quantized per-row terms). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _lag_corr_sql(k: int) -> str:
    """One exact-moment Pearson between the day series and its lag-k
    shift (inner-joined on day index)."""
    return f"""
        SELECT {k} AS lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(a.rev AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(b.rev AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a.rev AS HUGEINT) * b.rev) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(a.rev AS HUGEINT) * a.rev) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(b.rev AS HUGEINT) * b.rev) AS DOUBLE) AS syy
        FROM s a JOIN s b ON b.i = a.i + {k}
    """


@register(
    "q_ts_pacf",
    oracle=f"""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    s AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, rev FROM day),
    m AS ({_lag_corr_sql(1)} UNION ALL {_lag_corr_sql(2)}
          UNION ALL {_lag_corr_sql(3)}),
    r AS (
        SELECT lag,
               ROUND((n * sxy - sx * sy)
                     / (SQRT(n * sxx - sx * sx)
                        * SQRT(n * syy - sy * sy)), 6) AS rho
        FROM m),
    w AS (
        SELECT MAX(CASE WHEN lag = 1 THEN rho END) AS r1,
               MAX(CASE WHEN lag = 2 THEN rho END) AS r2,
               MAX(CASE WHEN lag = 3 THEN rho END) AS r3
        FROM r),
    p AS (
        SELECT r1, r2, r3,
               r1 AS p1,
               (r2 - r1 * r1) / (1 - r1 * r1) AS p2
        FROM w),
    p2 AS (
        SELECT r1, r2, r3, p1, p2,
               r1 * (1 - p2) AS phi21
        FROM p)
    SELECT r1, r2, r3,
           ROUND(p1, 6) AS pacf_1,
           ROUND(p2, 6) AS pacf_2,
           ROUND((r3 - phi21 * r2 - p2 * r1)
                 / (1 - phi21 * r1 - p2 * r2), 6) AS pacf_3
    FROM p2
    """,
)
def q_ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily-revenue series at lags
    1–3 via the Durbin–Levinson closed forms — the Box–Jenkins
    order-selection diagnostic that separates direct lag influence
    from what shorter lags already explain (an AR(p) series cuts off
    after lag p in PACF but decays slowly in ACF). Each lag
    correlation comes from exact HUGEINT/DECIMAL moments over the
    lag-joined day series and rounds to 6dp BEFORE the recursion, so
    both engines feed identical inputs into identical IEEE
    arithmetic.

    Scale: the series reduces to day grain first; each lag moment is
    an equi-join on shifted day index over the tiny series — three
    independent aggregates, fact scanned once."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    s = day.select(
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.col("rev").cast("decimal(19,0)").alias("rev"),
    )
    a = s.select(F.col("i").alias("ia"), F.col("rev").alias("ra"))
    b = s.select(F.col("i").alias("ib"), F.col("rev").alias("rb"))

    def rho(k: int):
        m = (
            a.join(b, F.col("ib") == F.col("ia") + k)
            .agg(
                F.count("*").alias("n"),
                F.sum("ra").cast("double").alias("sx"),
                F.sum("rb").cast("double").alias("sy"),
                F.sum(F.col("ra") * F.col("rb")).cast("double").alias("sxy"),
                F.sum(F.col("ra") * F.col("ra")).cast("double").alias("sxx"),
                F.sum(F.col("rb") * F.col("rb")).cast("double").alias("syy"),
            )
        )
        n = F.col("n").cast("double")
        return m.select(
            F.round(
                (n * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
                ),
                6,
            ).alias(f"r{k}")
        )

    w = rho(1).crossJoin(rho(2)).crossJoin(rho(3))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 * (1 - p2)
    return w.select(
        "r1",
        "r2",
        "r3",
        F.round(r1, 6).alias("pacf_1"),
        F.round(p2, 6).alias("pacf_2"),
        F.round(
            (r3 - phi21 * r2 - p2 * r1) / (1 - phi21 * r1 - p2 * r2), 6
        ).alias("pacf_3"),
    )


@register(
    "q_ml_knn_classifier",
    oracle="""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < 500 AND vec_id % 10 = 0),
    sims AS (
        SELECT q.vec_id AS qid, q.label AS true_label,
               c.label AS c_label, c.vec_id AS cid,
               ROUND(list_sum(list_transform(
                     list_zip(q.embedding, c.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                     6) AS sim
        FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
    topk AS (
        SELECT qid, true_label, c_label
        FROM (SELECT qid, true_label, c_label,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, cid) AS rn
              FROM sims)
        WHERE rn <= 10),
    votes AS (
        SELECT qid, true_label, c_label,
               CAST(COUNT(*) AS BIGINT) AS votes,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY COUNT(*) DESC, c_label)
                   AS vr
        FROM topk GROUP BY qid, true_label, c_label),
    pred AS (
        SELECT qid, true_label, c_label AS pred_label
        FROM votes WHERE vr = 1)
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM pred GROUP BY true_label
    """,
)
def q_ml_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor classification eval: each fixed-panel query
    predicts the MAJORITY label among its 10 most-similar corpus
    vectors (cosine rounded before ranking, id tie-break; vote ties
    break to the smaller label) and is scored against its true label
    — per-label accuracy for the simplest possible embedding-space
    classifier, the baseline any learned classifier must beat. Fully
    deterministic in both engines.

    Scale: the fixed panel broadcasts against the corpus (linear in
    data); voting runs at (query, label) grain over the top-10 slice.
    For all-point classification swap the exhaustive ranking for the
    IVF/LSH candidate route — the voting contract is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") < 500) & (F.col("vec_id") % 10 == 0)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
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
        "true_label",
        F.col("label").alias("c_label"),
        F.col("vec_id").alias("cid"),
        F.round(dot, 6).alias("sim"),
    )
    wk = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
    topk = sims.select(
        "*", F.row_number().over(wk).alias("rn")
    ).filter(F.col("rn") <= 10)
    votes = topk.groupBy("qid", "true_label", "c_label").agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(F.col("votes").desc(), "c_label")
    pred = (
        votes.select("*", F.row_number().over(wv).alias("vr"))
        .filter(F.col("vr") == 1)
        .select("qid", "true_label", F.col("c_label").alias("pred_label"))
    )
    hit = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return pred.groupBy(
        F.col("true_label").cast("long").alias("true_label")
    ).agg(
        F.count("*").alias("n_queries"),
        F.sum(hit).alias("n_correct"),
        F.round(F.sum(hit) / F.count("*").cast("double"), 6).alias(
            "accuracy"
        ),
    )


@register(
    "q_agg_pythagorean_means",
    oracle="""
    WITH t AS (
        SELECT l_returnflag AS grp,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(ROUND(1e9 * LN(l_quantity)) AS BIGINT) AS ln_u,
               CAST(ROUND(1e9 / l_quantity) AS BIGINT) AS inv_u
        FROM lineitem WHERE l_quantity > 0)
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(qty) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_arith,
           ROUND(EXP(SUM(ln_u) / COUNT(*) / 1e9), 6) AS mean_geom,
           ROUND(COUNT(*) * 1e9 / CAST(SUM(inv_u) AS DOUBLE), 6)
               AS mean_harm
    FROM t GROUP BY grp
    """,
)
def q_agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means of order quantity per return flag:
    arithmetic (exact integer sum), geometric (exp of the mean log —
    each row's ln quantized to an integer nano-unit so the
    distributed sum is order-free), and harmonic (reciprocals
    likewise quantized) — the rate-vs-ratio-vs-level triple where
    using the wrong mean (averaging rates arithmetically) is the
    classic analytics bug; AM ≥ GM ≥ HM is a built-in sanity
    invariant on every output row.

    Scale: one map-side-combining aggregate; the transcendental work
    is row-local and the shuffle carries three integer sums per
    group."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 0
    )
    t = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(1e9 * F.log("l_quantity")).cast("long").alias("ln_u"),
        F.round(1e9 / F.col("l_quantity")).cast("long").alias("inv_u"),
    )
    return t.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.round(F.sum("qty") / F.count("*").cast("double"), 6).alias(
            "mean_arith"
        ),
        F.round(
            F.exp(F.sum("ln_u") / F.count("*") / 1e9), 6
        ).alias("mean_geom"),
        F.round(
            F.count("*") * 1e9 / F.sum("inv_u").cast("double"), 6
        ).alias("mean_harm"),
    )
