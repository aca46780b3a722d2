"""Round-6 wave 90: bounded-hop harmonic centrality over the
near-dup graph (multi-source BFS, integer-weighted reciprocal
distances), closed-form ridge regression (the L2-regularized twin of
q_stat_ols2), and the Fano factor / burstiness index of hourly event
arrivals. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register("q_graph_harmonic")
def q_graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality within 3 hops on the near-dup graph:
    Σ 1/dist over every node reachable in ≤3 hops — the centrality
    that (unlike closeness) is well-defined on disconnected graphs,
    ranking the documents that sit in the middle of big duplicate
    blobs. Reciprocal distances are accumulated as EXACT integers by
    summing 6/dist (6, 3, 2 for hops 1, 2, 3) and dividing by 6 only
    at the end — no float summation order anywhere, so the ranking is
    exactly oracled against a recursive-CTE min-distance closure.

    Scale (r9 rewrite): duplicate-heavy corpora make the raw node-pair
    closure quadratic — the 100×-replicated sf10 fixture turns every
    document into a ~100-clique of TRUE TWINS (identical closed
    neighborhoods), and the r8 form measured 2.57× of linear there.
    The rewrite collapses true twins BEFORE the closure (the graph
    analogue of q_llm_embed_cosine_dedup's distinct-vector pre-group):

      1. closed-neighborhood fingerprint per node (edge-grain
         aggregate, one array per node) groups true twins — exact,
         array-equality grouping, no hashing;
      2. the 3-hop min-dist closure runs on the QUOTIENT graph
         (true-twin quotients preserve inter-group distances exactly;
         twins are mutually adjacent, so intra-group dist = 1);
      3. per-node results expand analytically: h6(u∈A) =
         6·(|A|−1) + Σ_B |B|·w6(dist(A,B)) — group-grain aggregates,
         one node-grain join, no pair state at node grain.

    Work is quotient-pairs, constant in the duplication factor; the
    node-pair closure no longer exists at any grain. Iterations
    fixed; the 6/dist integerization generalizes to any bounded hop
    count via lcm(1..k)."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    sym = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # ---- 1. true-twin collapse (operators/graph.twin_quotient) ----
    from ..operators.graph import twin_quotient

    member, sizes, qedges = twin_quotient(sym)
    # ---- 2. 3-hop min-dist closure at group grain ----
    best = qedges.select("src", "dst", F.lit(1).alias("dist"))
    for k in (2, 3):
        frontier = best.filter(F.col("dist") == k - 1).select(
            F.col("src").alias("fsrc"), F.col("dst").alias("fdst")
        )
        e2 = qedges.select(F.col("src").alias("esrc"),
                           F.col("dst").alias("edst"))
        ext = (
            frontier.join(e2, frontier["fdst"] == e2["esrc"])
            .filter(F.col("fsrc") != F.col("edst"))
            .select(F.col("fsrc").alias("src"),
                    F.col("edst").alias("dst"),
                    F.lit(k).alias("dist"))
        )
        best = (
            best.union(ext)
            .groupBy("src", "dst")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    # ---- 3. analytic per-node expansion ----
    w6 = (
        F.when(F.col("dist") == 1, 6)
        .when(F.col("dist") == 2, 3)
        .otherwise(2)
        .cast("long")
    )
    inter = (
        best.join(sizes.select(F.col("gid").alias("dst"),
                               F.col("gsz").alias("bsz")), "dst")
        .groupBy(F.col("src").alias("gid"))
        .agg(F.sum(F.col("bsz") * w6).alias("h6_inter"),
             F.sum("bsz").alias("n_inter"))
    )
    return (
        member.join(sizes, "gid").join(inter, "gid", "left")
        .select(
            F.col("node").alias("doc_id"),
            (F.col("gsz") - 1 + F.coalesce("n_inter", F.lit(0)))
            .cast("long").alias("n_reached_3hop"),
            F.round(
                ((F.col("gsz") - 1) * 6
                 + F.coalesce("h6_inter", F.lit(0))).cast("double") / 6.0,
                6).alias("harmonic"),
        )
    )


set_oracle("q_graph_harmonic", f"""
WITH RECURSIVE pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
walk(src, node, dist) AS (
  SELECT src, dst, 1 FROM edges
  UNION
  SELECT w.src, e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < 3 AND e.dst <> w.src
),
md AS (
  SELECT src, node, MIN(dist) AS dist FROM walk GROUP BY src, node
)
SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_reached_3hop,
       ROUND(CAST(SUM(CASE dist WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END)
                  AS DOUBLE) / 6.0, 6) AS harmonic
FROM md GROUP BY src
""")


@register(
    "q_ml_ridge2",
    oracle="""
    WITH s AS (
        SELECT l_linestatus AS ls,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS s2,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s11,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                   * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s22,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s12,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS s1y,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                   * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS s2y
        FROM lineitem GROUP BY 1),
    a AS (
        SELECT ls, n, CAST(n AS DOUBLE) AS nd,
               CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE) AS a11,
               CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                   / CAST(n AS DOUBLE) AS a22,
               CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                   / CAST(n AS DOUBLE) AS a12,
               CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS a1y,
               CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS a2y
        FROM s),
    b AS (
        SELECT ls, n, nd, a1y, a2y, a11, a22, a12,
               (a1y * (a22 + 1000 * nd) - a2y * a12)
                   / ((a11 + 1000 * nd) * (a22 + 1000 * nd) - a12 * a12)
                   AS r1,
               (a2y * (a11 + 1000 * nd) - a1y * a12)
                   / ((a11 + 1000 * nd) * (a22 + 1000 * nd) - a12 * a12)
                   AS r2,
               (a1y * a22 - a2y * a12) / (a11 * a22 - a12 * a12) AS o1,
               (a2y * a11 - a1y * a12) / (a11 * a22 - a12 * a12) AS o2
        FROM a)
    SELECT ls AS l_linestatus, n,
           ROUND(r1 / 100.0, 6) AS ridge_coef_quantity,
           ROUND(r2 / 100.0, 6) AS ridge_coef_discount_pct,
           ROUND(r1 / o1, 6) AS shrink_quantity,
           ROUND(r2 / o2, 6) AS shrink_discount
    FROM b ORDER BY ls
    """,
)
def q_ml_ridge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (closed form, λ scaled per-observation: the
    centered Gram gets +λ·n on its diagonal, λ=1000 in integer-unit
    space) of extended price on quantity and discount percentage, per
    line status — beside the shrinkage factor vs the unpenalized OLS
    coefficients (how much the L2 penalty pulls each one toward
    zero). Same exact-integer sufficient statistics as q_stat_ols2,
    so both engines solve identical 2×2 systems via Cramer's rule.

    Scale: one map-side-combining aggregate pass collecting nine
    integer moments per group, then a constant-time solve — adding
    regularization costs nothing at scale because it only perturbs
    the 2×2 solve, never the data pass."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = li.groupBy(F.col("l_linestatus").alias("ls")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
    )
    nd = F.col("n").cast("double")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    a = s.select(
        "ls",
        "n",
        nd.alias("nd"),
        (dd("s11") - dd("s1") * dd("s1") / nd).alias("a11"),
        (dd("s22") - dd("s2") * dd("s2") / nd).alias("a22"),
        (dd("s12") - dd("s1") * dd("s2") / nd).alias("a12"),
        (dd("s1y") - dd("s1") * dd("sy") / nd).alias("a1y"),
        (dd("s2y") - dd("s2") * dd("sy") / nd).alias("a2y"),
    )
    det_r = (F.col("a11") + 1000 * F.col("nd")) * (
        F.col("a22") + 1000 * F.col("nd")
    ) - F.col("a12") * F.col("a12")
    det_o = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    b = a.select(
        "ls",
        "n",
        ((F.col("a1y") * (F.col("a22") + 1000 * F.col("nd")) - F.col("a2y") * F.col("a12")) / det_r).alias("r1"),
        ((F.col("a2y") * (F.col("a11") + 1000 * F.col("nd")) - F.col("a1y") * F.col("a12")) / det_r).alias("r2"),
        ((F.col("a1y") * F.col("a22") - F.col("a2y") * F.col("a12")) / det_o).alias("o1"),
        ((F.col("a2y") * F.col("a11") - F.col("a1y") * F.col("a12")) / det_o).alias("o2"),
    )
    return b.select(
        F.col("ls").alias("l_linestatus"),
        "n",
        F.round(F.col("r1") / 100.0, 6).alias("ridge_coef_quantity"),
        F.round(F.col("r2") / 100.0, 6).alias("ridge_coef_discount_pct"),
        F.round(F.col("r1") / F.col("o1"), 6).alias("shrink_quantity"),
        F.round(F.col("r2") / F.col("o2"), 6).alias("shrink_discount"),
    ).orderBy("l_linestatus")


@register(
    "q_evt_fano_factor",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour_idx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    span AS (
        SELECT MAX(hour_idx) - MIN(hour_idx) + 1 AS n_hours FROM h),
    m AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS active_hours
        FROM h GROUP BY 1)
    SELECT event_type, s AS n_events, active_hours,
           ROUND((CAST(span.n_hours AS DOUBLE) * CAST(q AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                 / (CAST(span.n_hours AS DOUBLE) * CAST(s AS DOUBLE)),
                 6) AS fano,
           ROUND(CAST(s AS DOUBLE) / CAST(span.n_hours AS DOUBLE), 6)
               AS mean_per_hour
    FROM m CROSS JOIN span ORDER BY event_type
    """,
)
def q_evt_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio of hourly arrival counts)
    per event type: the dispersion index that separates Poisson-like
    traffic (Fano ≈ 1) from bursty (>1) or metronomic (<1) arrivals —
    the single-number answer to "is this event stream bursty?".
    Zero-count hours are handled WITHOUT materializing an hour spine:
    they contribute nothing to Σc or Σc², so variance over the full
    span is (N·Σc² − S²)/N² with N the span length — exact integer
    moments, one double division, exactly oracled.

    Scale: one fact pass to (type, hour) grain (bounded: types ×
    span-hours), one scalar span aggregate — no spine explode, no
    window; the spine-free zero handling is what keeps this shape at
    100 TB (a materialized hour×type spine would dwarf sparse types)."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_idx"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    span = h.agg((F.max("hour_idx") - F.min("hour_idx") + 1).alias("n_hours"))
    m = h.groupBy("event_type").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
        F.count(F.lit(1)).alias("active_hours"),
    )
    nh = F.col("n_hours").cast("double")
    return (
        m.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.col("s").alias("n_events"),
            "active_hours",
            F.round(
                (nh * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
                / (nh * F.col("s").cast("double")),
                6,
            ).alias("fano"),
            F.round(F.col("s").cast("double") / nh, 6).alias("mean_per_hour"),
        )
        .orderBy("event_type")
    )
