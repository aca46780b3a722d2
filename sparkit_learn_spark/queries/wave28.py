"""Round-6 wave 28: rank statistics and retrieval-quality metrics —
Spearman rank correlation (average-rank ties, exact integer moment
sums), the Mann-Whitney U test (rank-sum with tie correction), and
MRR@10 / NDCG@10 over the fixed embedding panel with an
integer-quantized discount table so the aggregation is order-free.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# NDCG discount table quantized to integer micro-units and inlined as
# literals into BOTH engines: disc[i] = round(1e6 / ln(i+1)) for rank
# i = 1..10, plus its prefix sums for the ideal DCG. Integer terms make
# the per-query DCG sum exact and summation-order-free; dcg/idcg is
# invariant to the log base so this IS standard NDCG.
_DISC = [round(1_000_000 / math.log(i + 1)) for i in range(1, 11)]
_IDCG = [sum(_DISC[: k + 1]) for k in range(10)]
_DISC_SQL = ", ".join(str(d) for d in _DISC)
_IDCG_SQL = ", ".join(str(d) for d in _IDCG)


@register(
    "q_stat_spearman",
    oracle="""
    WITH r AS (
        SELECT l_returnflag AS grp,
               2 * RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity)
                 + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
                 - 1 AS rx2,
               2 * RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice)
                 + COUNT(*) OVER (PARTITION BY l_returnflag,
                                  l_extendedprice)
                 - 1 AS ry2
        FROM lineitem),
    m AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(rx2 AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ry2 AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(rx2 AS HUGEINT) * rx2) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(ry2 AS HUGEINT) * ry2) AS DOUBLE) AS syy,
               CAST(SUM(CAST(rx2 AS HUGEINT) * ry2) AS DOUBLE) AS sxy
        FROM r GROUP BY grp)
    SELECT grp, n,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)),
                 6) AS spearman_rho
    FROM m
    """,
)
def q_stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price
    per return flag: ranks with average-rank tie handling held in
    integer space as 2·rank = 2·RANK + tie_count − 1, moment sums
    accumulated exactly in DECIMAL(38,0)/HUGEINT (rank products exceed
    the 2^53 exact-double range at scale), and the Pearson formula on
    ranks applied to the exact sums in one final double step. The
    monotone-association counterpart of the existing Pearson corr.

    Scale: two partitioned window ranks (sort within group — the
    range-partitioned global-rank pattern at 100 TB) plus one exact
    map-side-combining aggregate per group; no joins, no pair
    explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    # Tie counts via a RANGE(0,0) frame on the SAME window spec as the
    # rank: COUNT(*) OVER (PARTITION BY grp, value) equals the count of
    # the current value's peer group, which is exactly what a
    # range-current-row frame on (PARTITION BY grp ORDER BY value)
    # yields — so each variable needs ONE sort instead of two (the
    # separate tie windows hash-partitioned on (grp, value) and forced
    # 4 sorts + 2 extra exchanges; guide §2.4: two operations keyed the
    # same way share one exchange/sort).
    #
    # r11 negative result (guide §1.1): replacing the QUANTITY window
    # with a tiny (grp × ~50-value) histogram rank broadcast-joined
    # back (rx2 = 2·cum_lt + cnt + 1) measured consistently SLOWER
    # warm at sf0.1 (1.22 → 1.36 s best-of-4, same JVM): the broadcast
    # join plus carrying the decimal rx2 through the price sort cost
    # more than the saved second sort, because both windows share one
    # returnflag exchange and the second sort alone is cheap. Kept the
    # two-window form.
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wqt = wq.rangeBetween(0, 0)
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wpt = wp.rangeBetween(0, 0)
    # r12: the doubled ranks stay LONG through the windows (2·rank ≤ 2n
    # fits a long at any conceivable scale — only the PRODUCTS and sums
    # overflow); the decimal(38,0) widening happens per-term inside the
    # aggregate, so the two sorts and the window arithmetic run on
    # 8-byte integer codegen paths instead of 16-byte decimals.
    # Exactness unchanged: long→decimal cast is lossless and the sums
    # still accumulate in 128-bit decimal space.
    r = li.select(
        F.col("l_returnflag").alias("grp"),
        (2 * F.rank().over(wq).cast("long") + F.count("*").over(wqt) - 1)
        .alias("rx2"),
        (2 * F.rank().over(wp).cast("long") + F.count("*").over(wpt) - 1)
        .alias("ry2"),
    )
    dec = "decimal(38,0)"
    rx2d = F.col("rx2").cast(dec)
    ry2d = F.col("ry2").cast(dec)
    m = r.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(rx2d).cast("double").alias("sx"),
        F.sum(ry2d).cast("double").alias("sy"),
        F.sum(rx2d * F.col("rx2")).cast("double").alias("sxx"),
        F.sum(ry2d * F.col("ry2")).cast("double").alias("syy"),
        F.sum(rx2d * F.col("ry2")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    return m.select(
        "grp",
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "q_stat_mannwhitney",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS g1
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    r AS (
        SELECT g1,
               2 * RANK() OVER (ORDER BY v)
                 + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
        FROM s),
    ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v)),
    agg AS (
        SELECT CAST(SUM(g1) AS BIGINT) AS n1,
               CAST(SUM(1 - g1) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN g1 = 1 THEN r2 ELSE 0 END) AS BIGINT)
                   AS r1_twice
        FROM r)
    SELECT n1, n2,
           (r1_twice - n1 * (n1 + 1)) / 2.0 AS u1,
           ROUND(((r1_twice - n1 * (n1 + 1)) / 2.0
                  - n1 * n2 / 2.0)
                 / SQRT(n1 * CAST(n2 AS DOUBLE) / 12.0
                        * ((n1 + n2 + 1)
                           - tie_term
                             / (CAST(n1 + n2 AS DOUBLE)
                                * (n1 + n2 - 1)))),
                 6) AS z
    FROM agg CROSS JOIN ties
    """,
)
def q_stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: does the URGENT order
    population stochastically dominate the LOW one on total price —
    the nonparametric two-sample test that needs no normality
    assumption. Combined-sample average ranks kept integer as 2·rank,
    U from the exact rank sum, and the normal-approximation z with the
    full tie correction (no continuity correction), computed from
    exact integers in one final double step. Completes the inference
    battery next to Welch's t / chi-square / ANOVA.

    Scale: one global rank (range-partitioned sort at 100 TB) over the
    filtered two-group sample plus two scalar aggregates; the tie term
    is a per-value count — map-side combining throughout."""
    o = load_table(spark, sf_dir, "orders")
    s = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("g1"),
    )
    r = s.select(
        "g1",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count("*").over(Window.partitionBy("v"))
            - 1
        ).alias("r2"),
    )
    ties = (
        s.groupBy("v")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tie_term")
        )
    )
    agg = r.agg(
        F.sum("g1").alias("n1"),
        F.sum(1 - F.col("g1")).alias("n2"),
        F.sum(F.when(F.col("g1") == 1, F.col("r2")).otherwise(0)).alias(
            "r1_twice"
        ),
    )
    j = agg.crossJoin(F.broadcast(ties))
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = (F.col("r1_twice") - n1 * (n1 + 1)) / 2.0
    n = n1 + n2
    sigma = F.sqrt(
        n1 * n2.cast("double") / 12.0
        * (
            (n + 1)
            - F.col("tie_term")
            / (n.cast("double") * (n - 1))
        )
    )
    return j.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round((u1 - n1 * n2 / 2.0) / sigma, 6).alias("z"),
    )


@register(
    "q_llm_retrieval_metrics",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < 500 AND vec_id % 10 = 0),
    nrel AS (
        SELECT q.vec_id AS qid,
               CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM q JOIN embeddings c
          ON c.label = q.label AND c.vec_id <> q.vec_id
        GROUP BY q.vec_id),
    sims AS (
        SELECT q.vec_id AS qid,
               c.vec_id AS cid,
               CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS rel,
               ROUND(list_sum(list_transform(
                     list_zip(q.embedding, c.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                     6) AS sim
        FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
    ranked AS (
        SELECT qid, rel,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, cid) AS rn
        FROM sims),
    top AS (
        SELECT qid,
               CAST(SUM(rel * ([{_DISC_SQL}])[rn]) AS BIGINT)
                   AS dcg_micro,
               MIN(CASE WHEN rel = 1 THEN rn END) AS first_rel
        FROM ranked WHERE rn <= 10 GROUP BY qid)
    SELECT t.qid,
           COALESCE(nrel.n_rel, 0) AS n_rel,
           ROUND(COALESCE(1.0 / t.first_rel, 0.0), 6) AS rr,
           ROUND(CASE WHEN COALESCE(nrel.n_rel, 0) = 0 THEN 0.0
                 ELSE t.dcg_micro
                      / CAST(([{_IDCG_SQL}])
                             [LEAST(nrel.n_rel, 10)] AS DOUBLE)
                 END, 6) AS ndcg
    FROM top t LEFT JOIN nrel ON nrel.qid = t.qid
    """,
)
def q_llm_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics for the embedding index: MRR@10 and
    NDCG@10 per fixed-panel query, with same-label corpus vectors as
    the relevance gold. The DCG discount table is quantized to integer
    micro-units and inlined as literals into both engines, making the
    per-query DCG an exact integer sum (summation-order-free) and the
    final NDCG one double division; similarity ranks round before
    ordering with an id tie-break. The eval harness every ANN/dedup
    change should be graded against.

    Scale: fixed panel broadcasts against the corpus (linear in data),
    top-10 per query via one window over the panel-keyed slice; the
    ideal-DCG side is a label-count aggregate joined at panel grain —
    nothing quadratic in the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") < 500) & (F.col("vec_id") % 10 == 0)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    nrel = (
        emb.join(
            F.broadcast(q),
            (emb.label == q.q_label) & (emb.vec_id != q.qid),
        )
        .groupBy("qid")
        .agg(F.count("*").alias("n_rel"))
    )
    # r11: exhaustive panel sims via one BLAS matmul per Arrow batch
    # (operators.similarity.panel_all_sims) instead of a broadcast
    # nested-loop join evaluating an interpreted zip_with/aggregate
    # lambda per pair — same 6dp-rounded doubles (verified vs the
    # DuckDB oracle at sf0.001/0.01/0.1), ~¼ the exec time. rel is
    # recovered JVM-side from the corpus label payload + the 50-row
    # panel-label broadcast.
    from ..operators.similarity import panel_all_sims

    sims = panel_all_sims(
        emb.select("vec_id", "embedding", "label"),
        q.select("qid", "q_emb"),
        payload_cols=["label"],
    ).join(F.broadcast(q.select("qid", "q_label")), "qid").select(
        "qid",
        "cid",
        F.when(F.col("label") == F.col("q_label"), 1).otherwise(0).alias("rel"),
        "sim",
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
    disc = F.array(*[F.lit(d) for d in _DISC])
    idcg = F.array(*[F.lit(d) for d in _IDCG])
    top = (
        sims.select("qid", "rel", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .groupBy("qid")
        .agg(
            F.sum(
                F.col("rel") * F.element_at(disc, F.col("rn"))
            ).alias("dcg_micro"),
            F.min(
                F.when(F.col("rel") == 1, F.col("rn"))
            ).alias("first_rel"),
        )
    )
    return (
        top.join(F.broadcast(nrel), "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_rel"), F.lit(0).cast("long")).alias("n_rel"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("rr"),
            F.round(
                F.when(F.coalesce(F.col("n_rel"), F.lit(0)) == 0, 0.0).otherwise(
                    F.col("dcg_micro")
                    / F.element_at(
                        idcg, F.least(F.col("n_rel"), F.lit(10)).cast("int")
                    ).cast("double")
                ),
                6,
            ).alias("ndcg"),
        )
    )
