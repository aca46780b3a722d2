"""Round-6 wave 25: one-way ANOVA (F statistic from exact integer
moments), common-neighbors link prediction on the near-dup graph, and
a dedup threshold-sweep curve (pairs surviving each Jaccard cutoff).
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle


@register(
    "q_stat_anova",
    oracle="""
    WITH d AS (
        SELECT isodow(CAST(o_orderdate AS DATE)) AS dow,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders),
    g AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s,
               SUM(CAST(v AS DECIMAL(19, 0)) * CAST(v AS DECIMAL(19, 0)))
                   AS s2
        FROM d GROUP BY dow),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n) AS n_tot,
               SUM(s) AS s_tot, SUM(s2) AS s2_tot,
               SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS grp_term
        FROM g)
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n_tot AS BIGINT) AS n,
           ROUND((grp_term - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                             / n_tot) / (k - 1)
                 / ((CAST(s2_tot AS DOUBLE) - grp_term) / (n_tot - k))
                 / 10000.0, 6) AS f_stat_e4
    FROM t
    """,
)
def q_stat_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ by day of week? F =
    between-group mean square over within-group mean square, assembled
    entirely from per-group exact integer sums (Σv, Σv² in
    DECIMAL(38,0)) — the closed-form sufficient-statistics route, so
    both engines divide bit-identical doubles. Completes the classical
    inference battery (t-test, chi-square, KS, rank-sum) with the
    k-group mean comparison.

    Scale: one map-side-combining aggregate to 7 groups, then a 1-row
    solve — the canonical distributed-ANOVA shape; the F statistic is
    scaled by 1e-4 to keep the 6-dp hash window informative."""
    o = load_table(spark, sf_dir, "orders")
    v = F.round(F.col("o_totalprice") * 100).cast("long")
    d = o.select(
        (F.weekday(F.col("o_orderdate").cast("date")) + 1).alias("dow"),
        v.alias("v"),
    )
    g = d.groupBy("dow").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")).alias(
            "s2"
        ),
    )
    t = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("s2").alias("s2_tot"),
        F.sum(
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        ).alias("grp_term"),
    )
    ssb = F.col("grp_term") - F.col("s_tot").cast("double") * F.col(
        "s_tot"
    ).cast("double") / F.col("n_tot")
    ssw = F.col("s2_tot").cast("double") - F.col("grp_term")
    return t.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_tot").cast("long").alias("n"),
        F.round(
            ssb / (F.col("k") - 1) / (ssw / (F.col("n_tot") - F.col("k")))
            / 10000.0,
            6,
        ).alias("f_stat_e4"),
    )


@register("q_graph_common_neighbors")
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: the 10 NON-adjacent
    part pairs sharing the most common neighbors (the
    friend-of-a-friend score) — pairs never co-ordered together but
    whose shared basket-mates say they belong together; the classic
    recommendation candidate set. Counts are exact integers, ties
    break on the pair. (r7: moved from the near-dup document graph,
    which is a disjoint union of cliques on this corpus — zero
    non-adjacent wedges at every SF — see queries/_copurchase.py.)

    Scale: a 2-hop self-join through the (sparse) edge list grouped at
    pair grain, then an anti-join against the edges — edge-grain
    shuffles, never all-pairs; top-10 is TakeOrderedAndProject."""
    from ._copurchase import copurchase_sym_edges

    edges = copurchase_sym_edges(spark, sf_dir)
    x, y = edges.alias("x"), edges.alias("y")
    two_hop = (
        x.join(
            y,
            (F.col("x.dst") == F.col("y.src"))
            & (F.col("x.src") < F.col("y.dst")),
        )
        .groupBy(
            F.col("x.src").alias("part_a"), F.col("y.dst").alias("part_b")
        )
        .agg(F.count("*").alias("common_neighbors"))
    )
    adj = edges.select(
        F.col("src").alias("part_a"), F.col("dst").alias("part_b")
    )
    return (
        two_hop.join(adj, ["part_a", "part_b"], "left_anti")
        .orderBy(F.col("common_neighbors").desc(), "part_a", "part_b")
        .limit(10)
    )


from ._copurchase import COPURCHASE_SQL as _COP_SQL  # noqa: E402

set_oracle(
    "q_graph_common_neighbors",
    f"""
WITH cop AS ({_COP_SQL}),
e AS (SELECT part_a AS src, part_b AS dst FROM cop
      UNION ALL SELECT part_b, part_a FROM cop),
th AS (
    SELECT x.src AS part_a, y.dst AS part_b,
           CAST(COUNT(*) AS BIGINT) AS common_neighbors
    FROM e x JOIN e y ON x.dst = y.src AND x.src < y.dst
    GROUP BY 1, 2),
nonadj AS (
    SELECT th.* FROM th
    ANTI JOIN e ON e.src = th.part_a AND e.dst = th.part_b)
SELECT part_a, part_b, common_neighbors
FROM nonadj ORDER BY common_neighbors DESC, part_a, part_b LIMIT 10
""",
)


@register(
    "q_llm_dedup_threshold_curve",
    oracle=f"""
    WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
    b AS (
        SELECT (10 * n_common)
               // CAST(ROUND(n_common / jaccard) AS BIGINT) AS bkt
        FROM pairs),
    cnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bkt),
    k AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k10)
    SELECT k.k10,
           CAST(SUM(CASE WHEN cnt.bkt >= k.k10 THEN cnt.n ELSE 0 END)
                AS BIGINT) AS n_pairs
    FROM k CROSS JOIN cnt
    GROUP BY k.k10
    """,
)
def q_llm_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sweep curve: for each Jaccard cutoff k/10
    (k = 1…9), how many candidate pairs survive — the tuning curve
    that picks a dedup threshold by marginal pair volume instead of
    folklore. The union size is recovered exactly from the pair list
    (n_common / jaccard rounds to the true integer union, since
    jaccard was emitted at 6 dp from integers bounded ≪ 10⁶), and
    every cutoff test is pure integer arithmetic.

    Scale: one pass over the candidate-bounded pair list buckets each
    pair ONCE (integer floor of 10·jaccard), and the 9-threshold sweep
    runs over the ≤11-row bucket histogram — the curve costs no more
    than the dedup pass that feeds it (a naive 9× pair cross join
    measured 0.8× of linear at sf1; this form is flat)."""
    from .llm_pipeline2 import q_llm_ngram_jaccard

    b = q_llm_ngram_jaccard(spark, sf_dir).select(
        F.expr(
            "(10 * n_common) div cast(round(n_common / jaccard) as bigint)"
        ).alias("bkt")
    )
    cnt = b.groupBy("bkt").agg(F.count("*").alias("n"))
    k = spark.createDataFrame([(i,) for i in range(1, 10)], "k10: int")
    return (
        k.crossJoin(F.broadcast(cnt))
        .groupBy("k10")
        .agg(
            F.sum(
                F.when(F.col("bkt") >= F.col("k10"), F.col("n")).otherwise(0)
            ).alias("n_pairs")
        )
    )
